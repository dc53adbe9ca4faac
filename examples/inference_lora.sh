#!/usr/bin/env bash
# Counterpart of the reference's scripts/lora_eample.sh: generation with a
# trained LoRA folded into the base (works with this framework's npz LoRAs
# AND reference-trained .pt checkpoints — converted on the fly).
set -euo pipefail
python scripts/inference_single_lora.py \
  --base_model "${CKPT:-checkpoints/MOVA-360p}" \
  --lora_path "${LORA:?set LORA=path/to/lora_weights.npz or a reference .pt dir}" \
  --prompt "${PROMPT:-A kitten playing a tiny piano on stage}" \
  --ref_path "${REF:-ref.png}" \
  --num_frames 193 --height 352 --width 640 --seed 42 \
  --num_inference_steps 50 --cfg_scale 5.0 --sigma_shift 5.0 \
  --output output_lora.mp4 "$@"
