#!/usr/bin/env bash
# Round-5 (session b) trimmed on-chip queue — fits a ~1h window.
# Priority order from VERDICT r4: learning curve (#3b), serving session (#5),
# flash-attn bwd sweep (#7). One TPU process at a time; failures don't stop
# the queue.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p out/queue

run() {
  local name="$1" tmo="$2"; shift 2
  echo "=== [$name] $(date -u +%H:%M:%S) ==="
  timeout "$tmo" "$@" >"out/queue/$name.out" 2>"out/queue/$name.err"
  echo "=== [$name] rc=$? $(date -u +%H:%M:%S) ==="
}

run train_curve 2100 python tools/run_train_onchip.py --workdir out/train_r5 \
    --steps 120 --resume_steps 24 --height 128 --width 128 --num_frames 9 \
    --clips 2 --set trainer.lr=2e-3 --set trainer.lora_rank=16 \
    --expect_learning 0.9 --artifact TRAIN_RUN_r05.json

run serve_session 1200 python tools/run_serve_onchip.py --workdir out/serve \
    --artifact SERVE_r05.json

run attn_bwd 1500 python tools/bench_attn_bwd.py --sweep --artifact ATTN_BWD_r05.json

tail -n1 out/queue/train_curve.out out/queue/serve_session.out \
        out/queue/attn_bwd.out 2>/dev/null
