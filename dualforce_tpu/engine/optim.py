"""Optimizers + LR schedules (optax).

Replaces the reference's optimizer registry (torch.optim auto-registration +
bitsandbytes 8-bit Adam, mova/engine/optimizers/) and the trainer LR schedules
(accelerate_trainer.py:320-367 warmup + cosine/linear).

`adamw_8bit` provides the bitsandbytes-equivalent memory saving via optax's
block-wise int8 second-moment quantization.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from dualforce_tpu.registry import OPTIMIZERS

_BLOCK = 256  # bnb block size for 8-bit state quantization


def _q8(x: jnp.ndarray):
    """Block-wise absmax int8 quantization (bitsandbytes-style). Returns
    (q int8 [n_blocks, B], scale fp32 [n_blocks, 1], orig_size)."""
    flat = x.reshape(-1)
    n = flat.shape[0]
    pad = -n % _BLOCK
    if pad:
        flat = jnp.pad(flat, (0, pad))
    blocks = flat.reshape(-1, _BLOCK)
    scale = jnp.max(jnp.abs(blocks), axis=1, keepdims=True) / 127.0
    safe = jnp.where(scale == 0.0, 1.0, scale)
    q = jnp.clip(jnp.round(blocks / safe), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32), n


def _dq8(q, scale, n, shape):
    return (q.astype(jnp.float32) * scale).reshape(-1)[:n].reshape(shape)


class ScaleByAdam8bitState(NamedTuple):
    count: jnp.ndarray
    mu_q: any
    mu_s: any
    nu_q: any
    nu_s: any


def scale_by_adam_8bit(b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    """Adam with BOTH moment states stored block-wise int8 + fp32 block
    scales (~1.03 bytes/param per moment instead of 4 — the bitsandbytes
    AdamW8bit memory layout, low_resource_trainer.py:38-68). Moments are
    dequantized, updated in fp32, and requantized every step."""

    def init(params):
        def zq(p):
            q, s, _ = _q8(jnp.zeros(p.shape, jnp.float32))
            return q, s

        mu = jax.tree.map(lambda p: zq(p)[0], params)
        mu_s = jax.tree.map(lambda p: zq(p)[1], params)
        nu = jax.tree.map(lambda p: zq(p)[0], params)
        nu_s = jax.tree.map(lambda p: zq(p)[1], params)
        return ScaleByAdam8bitState(jnp.zeros([], jnp.int32), mu, mu_s, nu, nu_s)

    def update(updates, state, params=None):
        count = state.count + 1

        def upd(g, mq, ms, nq, ns):
            n = g.size
            mu = _dq8(mq, ms, n, g.shape)
            nu = _dq8(nq, ns, n, g.shape)
            g32 = g.astype(jnp.float32)
            mu = b1 * mu + (1 - b1) * g32
            nu = b2 * nu + (1 - b2) * jnp.square(g32)
            mu_hat = mu / (1 - b1 ** count.astype(jnp.float32))
            nu_hat = nu / (1 - b2 ** count.astype(jnp.float32))
            step = (mu_hat / (jnp.sqrt(nu_hat) + eps)).astype(g.dtype)
            mq2, ms2, _ = _q8(mu)
            nq2, ns2, _ = _q8(nu)
            return step, mq2, ms2, nq2, ns2

        out = jax.tree.map(upd, updates, state.mu_q, state.mu_s,
                           state.nu_q, state.nu_s)
        # out is `updates`-shaped with 5-tuple leaves (our param pytrees are
        # dicts/lists, never tuples, so tuple == leaf here)
        is_leaf = lambda t: isinstance(t, tuple)  # noqa: E731

        def pick(i):
            return jax.tree.map(lambda t: t[i], out, is_leaf=is_leaf)

        return pick(0), ScaleByAdam8bitState(count, pick(1), pick(2),
                                             pick(3), pick(4))

    return optax.GradientTransformation(init, update)


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
    low_resource_trainer.py:38-68): both Adam moments live as block-wise
    int8 + per-block fp32 scales (scale_by_adam_8bit above)."""
    base = scale_by_adam_8bit(b1=betas[0], b2=betas[1], eps=eps)
    lr_term = optax.scale_by_learning_rate(schedule if schedule is not None else lr)
    tx = optax.chain(base, optax.add_decayed_weights(weight_decay), lr_term)
    if max_grad_norm:
        tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
    return tx
