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


# ---------------------------------------------------------------------------
# Auto-registration of the optax optimizer family under torch-style names
# (the reference auto-registers every torch.optim class into OPTIMIZERS,
# torch_optimizers.py:7-24, so configs can pick any by `type=`; same here).
# Each factory takes (lr | schedule, max_grad_norm, torch-style kwargs) and
# returns an optax GradientTransformation with optional global-norm clipping.
# ---------------------------------------------------------------------------

def _register_optax(name: str, make):
    def factory(lr=1e-4, max_grad_norm: Optional[float] = 1.0, schedule=None,
                **kw):
        tx = make(schedule if schedule is not None else lr, kw)
        # torch parity: every torch.optim optimizer accepts weight_decay;
        # factories without a native one get decoupled decay chained in
        wd = kw.pop("weight_decay", 0.0)
        if wd:
            tx = optax.chain(optax.add_decayed_weights(wd), tx)
        if kw:
            raise TypeError(f"{name}: unknown kwargs {sorted(kw)}")
        if max_grad_norm:
            tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
        return tx

    factory.__name__ = name.lower()
    OPTIMIZERS.register_module(name=name, module=factory)
    return factory


def _betas(kw, default=(0.9, 0.999)):
    b1, b2 = kw.pop("betas", default)
    return {"b1": b1, "b2": b2}


_register_optax("Adam", lambda lr, kw: optax.adam(
    lr, **_betas(kw), eps=kw.pop("eps", 1e-8)))
_register_optax("Adamax", lambda lr, kw: optax.adamax(
    lr, **_betas(kw), eps=kw.pop("eps", 1e-8)))
_register_optax("NAdam", lambda lr, kw: optax.nadam(
    lr, **_betas(kw), eps=kw.pop("eps", 1e-8)))
_register_optax("NAdamW", lambda lr, kw: optax.nadamw(
    lr, **_betas(kw), eps=kw.pop("eps", 1e-8),
    weight_decay=kw.pop("weight_decay", 1e-2)))
_register_optax("RAdam", lambda lr, kw: optax.radam(
    lr, **_betas(kw), eps=kw.pop("eps", 1e-8)))
_register_optax("AdaBelief", lambda lr, kw: optax.adabelief(
    lr, **_betas(kw), eps=kw.pop("eps", 1e-16)))
_register_optax("SGD", lambda lr, kw: optax.sgd(
    lr, momentum=kw.pop("momentum", None), nesterov=kw.pop("nesterov", False)))
_register_optax("RMSprop", lambda lr, kw: optax.rmsprop(
    lr, decay=kw.pop("alpha", 0.99), eps=kw.pop("eps", 1e-8),
    momentum=kw.pop("momentum", None) or None))
_register_optax("Adagrad", lambda lr, kw: optax.adagrad(
    lr, initial_accumulator_value=kw.pop("initial_accumulator_value", 0.1),
    eps=kw.pop("eps", 1e-7)))
_register_optax("Adadelta", lambda lr, kw: optax.adadelta(
    lr, rho=kw.pop("rho", 0.9), eps=kw.pop("eps", 1e-6),
    weight_decay=kw.pop("weight_decay", 0.0)))
_register_optax("Lion", lambda lr, kw: optax.lion(
    lr, **_betas(kw, (0.9, 0.99)), weight_decay=kw.pop("weight_decay", 1e-3)))
_register_optax("LAMB", lambda lr, kw: optax.lamb(
    lr, **_betas(kw), eps=kw.pop("eps", 1e-6),
    weight_decay=kw.pop("weight_decay", 0.0)))
_register_optax("Adafactor", lambda lr, kw: optax.adafactor(
    lr, weight_decay_rate=kw.pop("weight_decay", None)))
_register_optax("Novograd", lambda lr, kw: optax.novograd(
    lr, **_betas(kw, (0.9, 0.25)), eps=kw.pop("eps", 1e-8),
    weight_decay=kw.pop("weight_decay", 0.0)))
