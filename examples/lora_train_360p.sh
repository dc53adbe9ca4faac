#!/usr/bin/env bash
# Counterpart of the reference's accelerate_train_8gpu.sh: LoRA training on
# a data x fsdp x cp mesh, Orbax checkpoints with auto-resume.
set -euo pipefail
python scripts/train.py configs/training/lora_360p.py \
  --set pipeline.ckpt_path="${CKPT:-checkpoints/MOVA-360p}" \
        data.metadata_path="${DATA:-data/metadata.json}" \
        trainer.max_steps="${STEPS:-2000}" "$@"
