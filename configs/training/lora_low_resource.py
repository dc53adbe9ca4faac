"""Low-resource 360p LoRA training on ONE chip whose HBM cannot hold the
pipeline (counterpart of the reference's mova_train_low_resource.py:44-126:
AdamW8bit + FP8 CPU offload + gradient-checkpoint offload).

Load the checkpoint with fp8 storage and train with host-staged base
weights: only the active 14B expert (+audio tower + bridge) is HBM-resident,
encoders are staged per encode and freed, the expert restage is amortized
over expert_switch_interval optimizer steps, optimizer moments are
block-256 int8."""

config = dict(
    pipeline=dict(ckpt_path="checkpoints/MOVA-360p", weight_dtype="fp8"),
    mesh=dict(),  # single chip — the whole point of this regime
    data=dict(
        metadata_path="data/clips/metadata.json",
        height=352, width=640, num_frames=49, fps=24.0, batch_size=1,
        num_workers=2,
    ),
    trainer=dict(
        lr=1e-4, warmup_steps=100, max_steps=2000,
        lora_rank=16, lora_alpha=16.0,
        optimizer="AdamW8bit",          # bnb-equivalent int8 moments
        offload="component",            # host-staged frozen base weights
        expert_switch_interval=25,      # amortize the 14B restage
        grad_accum_steps=4,             # effective batch 4 at batch_size 1
        remat=True,
        save_interval=500, log_interval=10,
        save_dir="./checkpoints/lora_low_resource",
        logger="tensorboard",
    ),
)
