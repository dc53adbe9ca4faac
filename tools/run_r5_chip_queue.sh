#!/usr/bin/env bash
# Round-5 on-chip measurement queue — run with the chip otherwise idle
# (one TPU process at a time). Each job independently timed out; failures
# don't stop the queue.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p out/queue

run() {
  local name="$1" tmo="$2"; shift 2
  echo "=== [$name] $(date -u +%H:%M:%S) ==="
  timeout "$tmo" "$@" >"out/queue/$name.out" 2>"out/queue/$name.err"
  echo "=== [$name] rc=$? $(date -u +%H:%M:%S) ==="
}

# VERDICT r4 #3b: on-chip learning curve — small data geometry so a couple
# hundred steps fit the budget; lr/rank raised to make the drop visible
run train_curve 5400 python tools/run_train_onchip.py --workdir out/train_r5 \
    --steps 160 --resume_steps 40 --height 128 --width 128 --num_frames 9 \
    --clips 2 --set trainer.lr=2e-3 --set trainer.lora_rank=16 \
    --expect_learning 0.9 --artifact TRAIN_RUN_r05.json

# VERDICT r4 #5: serving session over real HTTP on the chip
run serve_session 3600 python tools/run_serve_onchip.py --workdir out/serve \
    --artifact SERVE_r05.json

# VERDICT r4 #4: 720p bench nulls — risky compile phases isolated from the
# safe vae phase so a crashed remote compile can't poison the decode numbers
run bench_720p_vae  2400 python bench.py --geom 720p --phases vae
run bench_720p_deep 3600 python bench.py --geom 720p --phases deep,int8

# VERDICT r4 #7: flash-attention backward block sweep
run attn_bwd 3600 python tools/bench_attn_bwd.py --sweep --artifact ATTN_BWD_r05.json

# headline refresh (all phases; 360p compiles fine)
run bench_360p 3600 python bench.py

tail -n1 out/queue/train_curve.out out/queue/serve_session.out \
        out/queue/bench_720p_vae.out out/queue/bench_720p_deep.out \
        out/queue/attn_bwd.out out/queue/bench_360p.out 2>/dev/null
