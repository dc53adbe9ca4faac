#!/usr/bin/env bash
# Counterpart of the reference's README inference invocation (seed-42 golden
# run, README.md:76-107): 193 frames @ 24 fps, 352x640, 50 steps, cfg 5.0.
set -euo pipefail
CKPT=${CKPT:-checkpoints/MOVA-360p}
python scripts/inference_single.py \
  --ckpt_path "$CKPT" \
  --prompt "${PROMPT:-A kitten playing a tiny piano on stage}" \
  --negative_prompt "${NEG:-}" \
  --ref_path "${REF:-ref.png}" \
  --num_frames 193 --fps 24 --height 352 --width 640 \
  --num_inference_steps 50 --cfg_scale 5.0 --sigma_shift 5.0 --seed 42 \
  --output output.mp4 "$@"
