"""LoRA fine-tune on MOVA-360p (counterpart of
configs/training/mova_train_accelerate_8gpu.py — the FSDP(2)xCP(4) 8-GPU
recipe maps to mesh fsdp=2 cp=4)."""

config = dict(
    pipeline=dict(ckpt_path="checkpoints/MOVA-360p"),
    mesh=dict(data=1, fsdp=2, cp=4),
    data=dict(
        metadata_path="data/train/metadata.json",
        height=352, width=640, num_frames=49, fps=24.0,
        batch_size=1, num_workers=2,
    ),
    trainer=dict(
        lr=1e-4, weight_decay=1e-2, warmup_steps=100, max_steps=2000,
        lr_schedule="cosine", lora_rank=16, lora_alpha=16.0,
        log_interval=10, save_interval=500, save_dir="./checkpoints/lora_360p",
        logger="tensorboard", remat=True,
    ),
)
