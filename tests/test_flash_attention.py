"""Pallas flash attention vs XLA reference (CPU interpret mode, small shapes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dualforce_tpu.ops.attention import attention_ref
from dualforce_tpu.ops.flash_attention import flash_attention


def _rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


@pytest.mark.parametrize("sq,sk,bq,bk", [
    (256, 256, 128, 128),       # aligned
    (300, 200, 128, 128),       # padded q and kv
    (256, 512, 128, 256),       # cross-attn shape (long kv)
])
def test_forward_matches_reference(sq, sk, bq, bk):
    b, n, d = 1, 2, 128
    q, k, v = _rand(0, (b, sq, n, d)), _rand(1, (b, sk, n, d)), _rand(2, (b, sk, n, d))
    got = flash_attention(q, k, v, block_q=bq, block_k=bk)
    want = attention_ref(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_forward_kv_mask():
    b, n, d, sq, sk = 2, 1, 128, 128, 256
    q, k, v = _rand(3, (b, sq, n, d)), _rand(4, (b, sk, n, d)), _rand(5, (b, sk, n, d))
    vlen = jnp.array([100, 256], jnp.int32)
    got = flash_attention(q, k, v, kv_valid_len=vlen, block_q=128, block_k=128)
    want = attention_ref(q, k, v, kv_valid_len=vlen)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("sq,sk", [(256, 256), (300, 200)])
def test_backward_matches_reference(sq, sk):
    b, n, d = 1, 2, 128
    q, k, v = _rand(6, (b, sq, n, d)), _rand(7, (b, sk, n, d)), _rand(8, (b, sk, n, d))
    w = _rand(9, (b, sq, n, d))

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, block_q=128, block_k=128) * w)

    def loss_ref(q, k, v):
        return jnp.sum(attention_ref(q, k, v) * w)

    g_got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for got, want, name in zip(g_got, g_want, "qkv"):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=5e-4, atol=5e-4,
            err_msg=f"d{name} mismatch")


def test_with_lse_values_and_grads():
    """(out, lse) variant: lse matches an explicit logsumexp, and grads are
    correct for a loss that uses BOTH outputs (lse cotangent folds into the
    backward's delta term)."""
    b, sq, sk, n, d = 1, 256, 300, 2, 128
    q, k, v = _rand(10, (b, sq, n, d)), _rand(11, (b, sk, n, d)), _rand(12, (b, sk, n, d))
    from dualforce_tpu.ops.flash_attention import flash_attention_with_lse

    def ref_with_lse(q, k, v):
        scale = d ** -0.5
        logits = jnp.einsum("bqnd,bknd->bnqk",
                            q.astype(jnp.float32) * scale, k.astype(jnp.float32))
        lse = jax.scipy.special.logsumexp(logits, axis=-1)   # [B, N, Sq]
        o = jnp.einsum("bnqk,bknd->bqnd", jax.nn.softmax(logits, -1),
                       v.astype(jnp.float32))
        return o, lse

    o, lse = flash_attention_with_lse(q, k, v, block_q=128, block_k=128)
    o_r, lse_r = ref_with_lse(q, k, v)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_r), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(lse_r), rtol=2e-5, atol=2e-5)

    wo = _rand(13, o.shape)
    wl = _rand(14, lse.shape)

    def loss_flash(q, k, v):
        o, lse = flash_attention_with_lse(q, k, v, block_q=128, block_k=128)
        return jnp.sum(o * wo) + jnp.sum(jnp.tanh(lse) * wl)

    def loss_ref(q, k, v):
        o, lse = ref_with_lse(q, k, v)
        return jnp.sum(o * wo) + jnp.sum(jnp.tanh(lse) * wl)

    g_got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for got, want, name in zip(g_got, g_want, "qkv"):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=5e-4, atol=5e-4,
            err_msg=f"d{name} mismatch")


@pytest.mark.parametrize("sq,sk,vlen", [
    (256, 256, None),            # aligned
    (300, 200, None),            # padded q and kv
    (256, 256, (100, 256)),      # per-batch kv mask (serving)
])
def test_sage_int8_close_to_reference(sq, sk, vlen):
    """Int8-QK kernel: within the int8 quantization floor of the exact
    reference (~1.5e-2 relative), all geometries incl. padding and kv mask."""
    from dualforce_tpu.ops.flash_attention import sage_attention

    b, n, d = (2 if vlen else 1), 2, 128
    q, k, v = _rand(40, (b, sq, n, d)), _rand(41, (b, sk, n, d)), _rand(42, (b, sk, n, d))
    vl = jnp.array(vlen, jnp.int32) if vlen else None
    got = np.asarray(sage_attention(q, k, v, kv_valid_len=vl,
                                    block_q=128, block_k=128), np.float32)
    want = np.asarray(attention_ref(q, k, v, kv_valid_len=vl), np.float32)
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 2.5e-2, f"sage rel err {rel:.3e}"
    np.testing.assert_allclose(got, want, atol=8e-2)


def test_sage_dispatch(monkeypatch):
    """impl='sage' must actually reach the int8 kernel through the
    dispatcher. Off-TPU the availability guard would fall back to ref (a
    ref-vs-ref comparison proves nothing), so force availability — the sage
    kernel itself runs fine in interpret mode."""
    import importlib

    # ops/__init__ re-exports the attention FUNCTION, shadowing the module
    # for `import ... as`; resolve the module itself
    attn_mod = importlib.import_module("dualforce_tpu.ops.attention")
    monkeypatch.setattr(attn_mod, "_flash_available", lambda: True)
    b, s, n, d = 1, 256, 1, 128
    q, k, v = _rand(43, (b, s, n, d)), _rand(44, (b, s, n, d)), _rand(45, (b, s, n, d))
    got = attn_mod.attention(q, k, v, impl="sage")
    want = attention_ref(q, k, v)
    rel = (np.linalg.norm(np.asarray(got, np.float32) - np.asarray(want)) /
           np.linalg.norm(np.asarray(want)))
    # int8 quantization floor: clearly differs from exact ref but is close
    assert 1e-4 < rel < 2.5e-2, f"rel={rel:.2e} (0 would mean ref fallback)"


def test_fast_softmax_matches_exact():
    """softmax_cap (static-shift fast mode) must match the exact kernel to
    fp precision for in-range scores, incl. padded kv and the LSE output."""
    b, sq, sk, n, d = 1, 300, 277, 2, 128
    q, k, v = _rand(30, (b, sq, n, d)), _rand(31, (b, sk, n, d)), _rand(32, (b, sk, n, d))
    exact = flash_attention(q, k, v, block_q=128, block_k=128)
    fast = flash_attention(q, k, v, block_q=128, block_k=128, softmax_cap=30.0)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact),
                               rtol=2e-5, atol=2e-5)

    # grads flow through the fast forward (bwd reuses the exact-path LSE math)
    w = _rand(33, (b, sq, n, d))
    g_fast = jax.grad(lambda q: jnp.sum(flash_attention(
        q, k, v, block_q=128, block_k=128, softmax_cap=30.0) * w))(q)
    g_exact = jax.grad(lambda q: jnp.sum(flash_attention(
        q, k, v, block_q=128, block_k=128) * w))(q)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_exact),
                               rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("s,want_bq,want_bk", [
    (43120, 3080, 3920),    # 360p: measured optima (VMEM-raised blocks)
    (176400, 2800, 3920),   # 720p
    (997, 1024, None),      # prime-ish: no divisor -> padded default / None
])
def test_block_selection(s, want_bq, want_bk):
    """_exact_bq/_exact_bk pick the measured-optimal exact divisors for the
    canonical geometries (and fall back cleanly when none exists)."""
    from dualforce_tpu.ops.flash_attention import _exact_bk, _exact_bq

    bq = _exact_bq(s, 1024)
    bk = _exact_bk(s, 1024)
    assert bq == want_bq
    assert bk == want_bk
    if bk is not None:
        assert s % bk == 0 and bk % 8 == 0
    if bq != 1024:
        assert s % bq == 0 and bq % 8 == 0


@pytest.mark.parametrize("sq,sk,vlen", [
    (256, 256, None),       # aligned
    (300, 200, None),       # padded q and kv (pad-row poisoning both modes)
    (256, 512, (100, 512)), # per-batch kv mask
])
def test_bwd_fused_matches_split(sq, sk, vlen):
    """The one-pass fused backward (dk+dv+dq, whole-row dq scratch) must
    match the split two-kernel backward bit-for-bit in intent (same math,
    same precisions) — tight tolerance, both modes forced explicitly."""
    from dualforce_tpu.ops import flash_attention as fa

    b, n, d = 2, 1, 128
    q, k, v = _rand(11, (b, sq, n, d)), _rand(12, (b, sk, n, d)), _rand(13, (b, sk, n, d))
    kvl = None if vlen is None else jnp.asarray(vlen, jnp.int32)

    def loss(q, k, v):
        out = flash_attention(q, k, v, kv_valid_len=kvl,
                              block_q=128, block_k=128)
        return jnp.sum(out * jnp.cos(out.astype(jnp.float32)))

    grads = {}
    old = fa._BWD_MODE
    try:
        for mode in ("split", "fused"):
            fa._BWD_MODE = mode
            grads[mode] = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    finally:
        fa._BWD_MODE = old
    for gs, gf, name in zip(grads["split"], grads["fused"], "qkv"):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gs),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=f"d{name} fused vs split")


def test_bwd_fused_scratch_cap_falls_back():
    """Sequences whose dq scratch would exceed the VMEM budget route to the
    split kernels under mode=auto."""
    from dualforce_tpu.ops import flash_attention as fa

    d = 128
    big_sq = (fa._FUSED_DQ_SCRATCH_CAP // (d * 4)) + 512
    assert big_sq * d * 4 > fa._FUSED_DQ_SCRATCH_CAP
    # decision logic only (a real array that size would be slow on CPU)
    sq_p = fa._ceil_to(big_sq, min(fa.DEFAULT_BQ, fa._BWD_BQ_CAP))
    assert sq_p * d * 4 > fa._FUSED_DQ_SCRATCH_CAP  # -> split
    small_sq = 43120
    sq_p = fa._ceil_to(small_sq, min(fa.DEFAULT_BQ, fa._BWD_BQ_CAP))
    assert sq_p * d * 4 <= fa._FUSED_DQ_SCRATCH_CAP  # 360p -> fused


def test_remat_save_attention_grads_match():
    """The optimize_remat custom_vjp (remat_save_attention(True)) must give
    bit-comparable grads to the default full-remat path under
    jax.checkpoint — it is the same bwd kernel, only the residual plumbing
    across the remat boundary changes."""
    from dualforce_tpu.ops.flash_attention import remat_save_attention

    b, n, d, s = 1, 2, 128, 256
    q, k, v = _rand(20, (b, s, n, d)), _rand(21, (b, s, n, d)), _rand(22, (b, s, n, d))
    w = _rand(23, (b, s, n, d))

    def loss(q, k, v):
        f = jax.checkpoint(
            lambda q, k, v: flash_attention(q, k, v, block_q=128, block_k=128))
        return jnp.sum(f(q, k, v) * w)

    prev = remat_save_attention(False)
    try:
        g_base = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        remat_save_attention(True)
        g_save = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    finally:
        remat_save_attention(prev)
    for got, want, name in zip(g_save, g_base, "qkv"):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6,
            err_msg=f"d{name} mismatch between remat modes")
