#!/usr/bin/env bash
# Counterpart of workflow/launch_sglang_server.sh: /v1/videos + web UI,
# batched same-geometry requests, AOT warmup of the default bucket.
# Single-chip recipe: fp8 weights fit both 14B experts in 16 GB HBM, and
# the CFG negative-pass cache gives a measured 1.43x loop speedup.
# Fastest (lossy) serving: add --quantize int8 --attn_type sage.
set -euo pipefail
python scripts/serve.py \
  --ckpt_path "${CKPT:-checkpoints/MOVA-360p}" \
  --port "${PORT:-8000}" --max_batch 2 \
  --weight_dtype fp8 --cfg_cache_interval 3 \
  --warmup 640x352x193x50 "$@"
