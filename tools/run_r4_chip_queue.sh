#!/usr/bin/env bash
# Round-4 on-chip measurement queue — run AFTER the e2e clip finishes
# (one TPU process at a time). Each job is independently timed out and
# failures don't stop the queue.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p out/queue

run() {
  local name="$1" tmo="$2"; shift 2
  echo "=== [$name] $(date -u +%H:%M:%S) ==="
  timeout "$tmo" "$@" >"out/queue/$name.out" 2>"out/queue/$name.err"
  echo "=== [$name] rc=$? $(date -u +%H:%M:%S) ==="
}

# VERDICT #7: remat-mode train-step measurement (both modes)
run train_recompute 1800 python tools/bench_train_step.py --remat_attn recompute
run train_save      1800 python tools/bench_train_step.py --remat_attn save
# VERDICT #5: full training CLI journey on the chip (fixtures built on the fly)
run train_onchip    3600 python tools/run_train_onchip.py --workdir out/train \
    --steps 12 --resume_steps 6 --artifact TRAIN_RUN_r04.json
# VERDICT #4: 720p bench with deep validation + int8 (no --fast)
run bench_720p      3600 python bench.py --geom 720p
# headline refresh
run bench_360p      3600 python bench.py

tail -n1 out/queue/train_recompute.out out/queue/train_save.out \
        out/queue/bench_720p.out out/queue/bench_360p.out 2>/dev/null
