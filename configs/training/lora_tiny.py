"""Tiny smoke-training config (CI / CPU)."""

config = dict(
    pipeline=dict(ckpt_path="checkpoints/tiny"),
    mesh=dict(),
    data=dict(
        metadata_path="data/tiny/metadata.json",
        height=32, width=32, num_frames=5, fps=24.0, batch_size=1,
    ),
    trainer=dict(
        lr=1e-4, warmup_steps=2, max_steps=4, lora_rank=2,
        save_interval=4, log_interval=1, save_dir="./checkpoints/lora_tiny",
        logger="none",
    ),
)
