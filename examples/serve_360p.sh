#!/usr/bin/env bash
# Counterpart of workflow/launch_sglang_server.sh: /v1/videos + web UI,
# batched same-geometry requests, AOT warmup of the default bucket.
set -euo pipefail
python scripts/serve.py \
  --ckpt_path "${CKPT:-checkpoints/MOVA-360p}" \
  --port "${PORT:-8000}" --max_batch 2 \
  --warmup 640x352x193x50 "$@"
