#!/usr/bin/env bash
# Counterpart of the reference's low_resource_train.sh: single-chip LoRA on
# a chip whose HBM cannot hold the pipeline — fp8 host-staged base weights,
# AdamW8bit int8 optimizer moments, gradient accumulation, amortized expert
# restaging (configs/training/lora_low_resource.py).
set -euo pipefail
python scripts/train.py configs/training/lora_low_resource.py \
  --set pipeline.ckpt_path="${CKPT:-checkpoints/MOVA-360p}" \
        data.metadata_path="${DATA:-data/metadata.json}" \
        trainer.max_steps="${STEPS:-2000}" "$@"
