#!/usr/bin/env bash
# Sequence-parallel inference over a 4-chip cp mesh (replaces torchrun
# --nproc-per-node + yunchang PGs; one process drives the whole mesh).
set -euo pipefail
python scripts/inference_single.py \
  --ckpt_path "${CKPT:-checkpoints/MOVA-360p}" \
  --prompt "${PROMPT:-A kitten playing a tiny piano on stage}" \
  --ref_path "${REF:-ref.png}" \
  --num_frames 193 --height 352 --width 640 --seed 42 \
  --cp_size 4 --fsdp_size 2 "$@"
