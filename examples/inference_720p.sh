#!/usr/bin/env bash
# Counterpart of the reference's 720p recipe (/root/reference/README.md:96-107,
# MOVA-720p checkpoint): 1280x720, 193 frames @ 24 fps, 50 steps, seed 42.
# Single 16 GB v5e: layerwise group offload + fp8 weight storage is the
# smallest-footprint mode (the reference's `--offload group` 12 GB-VRAM row);
# on a pod slice drop --offload and use --cp_size/--fsdp_size instead
# (e.g. CP_SIZE=8 FSDP_SIZE=4 keeps both 14B experts HBM-resident).
set -euo pipefail
python scripts/inference_single.py \
  --ckpt_path "${CKPT:-checkpoints/MOVA-720p}" \
  --prompt "${PROMPT:-A kitten playing a tiny piano on stage}" \
  --negative_prompt "${NEG:-}" \
  --ref_path "${REF:-ref.png}" \
  --num_frames 193 --fps 24 --height 720 --width 1280 \
  --num_inference_steps 50 --cfg_scale 5.0 --sigma_shift 5.0 --seed 42 \
  --offload group --weight_dtype fp8 --cfg_cache_interval 3 \
  --offload_resident_small \
  --output output_720p.mp4 "$@"
