"""Block-wise int8 optimizer states (bitsandbytes AdamW8bit equivalent)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dualforce_tpu.engine.optim import adamw_8bit, scale_by_adam_8bit


def _loss(p):
    return jnp.sum(jnp.square(p["w"] @ p["v"] - 3.0)) + jnp.sum(jnp.square(p["b"]))


def _train(tx, steps=60):
    params = {"w": jnp.ones((8, 16)) * 0.5, "v": jnp.ones((16, 4)) * 0.5,
              "b": jnp.ones((4,))}
    state = tx.init(params)

    @jax.jit
    def step(params, state):
        loss, g = jax.value_and_grad(_loss)(params)
        updates, state = tx.update(g, state, params)
        return optax.apply_updates(params, updates), state, loss

    for _ in range(steps):
        params, state, loss = step(params, state)
    return float(loss), state


def test_adam8bit_converges_like_fp32():
    l8, _ = _train(adamw_8bit(lr=3e-2, weight_decay=0.0))
    l32, _ = _train(optax.adamw(3e-2, weight_decay=0.0))
    assert l8 < 1.0, l8                      # actually optimizes
    assert l8 < max(10 * l32, 1.0), (l8, l32)  # same ballpark as fp32


def test_states_are_int8_and_small():
    tx = scale_by_adam_8bit()
    params = {"w": jnp.zeros((1024, 256))}
    state = tx.init(params)
    assert state.mu_q["w"].dtype == jnp.int8
    assert state.nu_q["w"].dtype == jnp.int8
    fp32_bytes = 2 * params["w"].size * 4          # two fp32 moments
    q_bytes = sum(x.size * x.dtype.itemsize for x in
                  jax.tree.leaves((state.mu_q, state.mu_s,
                                   state.nu_q, state.nu_s)))
    assert q_bytes < 0.3 * fp32_bytes, (q_bytes, fp32_bytes)

    # one update keeps shapes/dtypes stable and finite
    g = {"w": jnp.ones((1024, 256)) * 0.1}
    updates, state2 = tx.update(g, state)
    assert updates["w"].shape == (1024, 256)
    assert np.isfinite(np.asarray(updates["w"])).all()
    assert state2.mu_q["w"].dtype == jnp.int8


def test_optimizer_registry_family():
    """Torch-style optimizer names are all registered and usable (reference
    auto-registers every torch.optim class, torch_optimizers.py:7-24)."""
    import jax
    import jax.numpy as jnp

    from dualforce_tpu.registry import OPTIMIZERS

    params = {"w": jnp.ones((8, 4)), "b": jnp.zeros((4,))}
    grads = jax.tree.map(lambda p: jnp.full_like(p, 0.1), params)
    names = ["AdamW", "AdamW8bit", "Adam", "SGD", "RMSprop", "Adagrad",
             "Adadelta", "Lion", "LAMB", "Adafactor", "Novograd", "NAdam",
             "NAdamW", "RAdam", "AdaBelief", "Adamax"]
    for n in names:
        assert n in OPTIMIZERS, n
        tx = OPTIMIZERS.get(n)(lr=1e-3)
        st = tx.init(params)
        up, _ = tx.update(grads, st, params)
        assert all(jnp.isfinite(x).all() for x in jax.tree.leaves(up)), n

    # betas pass through where meaningful; junk kwargs are rejected loudly
    OPTIMIZERS.get("Adam")(lr=1e-3, betas=(0.8, 0.95))
    import pytest

    with pytest.raises(TypeError):
        OPTIMIZERS.get("SGD")(lr=1e-3, betas=(0.9, 0.999))
