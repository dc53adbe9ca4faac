"""int4 packed weight storage (nn.quantize_linear_int4 / _linear_int4).

Round-5 addition: weights-only int4 with grouped scales makes a 14.3B
flagship video tower ~7.2 GB — fully HBM-resident on one 16 GB v5e — so
single-chip inference runs with offload="component" bulk staging instead of
layerwise group streaming (reference README 12 GB-VRAM row equivalent)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dualforce_tpu import nn


def test_int4_roundtrip_error_bounded():
    """Dequantized weights are within half an int4 step of the original."""
    p = nn.linear_init(jax.random.PRNGKey(0), 256, 96, jnp.float32)
    q = nn.quantize_linear_int4(p)
    w = nn.dequantize_int4(q["kernel_q4"], q["kernel_scale4"], jnp.float32)
    assert w.shape == p["kernel"].shape
    # per-element error <= 0.5 * its group's scale (+ float noise); groups
    # tile the input dim so expand scales to per-element for a tight bound
    scale = np.asarray(q["kernel_scale4"])          # [in/g, out]
    g = 256 // scale.shape[0]
    per_elem = np.repeat(scale, g, axis=0)          # [in, out]
    err = np.abs(np.asarray(w) - np.asarray(p["kernel"]))
    assert np.all(err <= per_elem * 0.5 + 1e-7)


def test_int4_matmul_close_and_dispatched():
    """linear() dispatches on kernel_q4; output near the fp32 matmul at the
    analytic int4 noise floor (~7% for uniform weights)."""
    p = nn.linear_init(jax.random.PRNGKey(1), 256, 512, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(2), (3, 7, 256), jnp.float32)
    q = nn.quantize_linear_int4(p)
    y_ref = nn.linear(p, x)
    y_q = nn.linear(q, x)
    rel = float(jnp.linalg.norm(y_q - y_ref) / jnp.linalg.norm(y_ref))
    assert rel < 0.12, rel
    # bias is applied on the quantized path too
    assert "bias" in q
    y_nb = nn.linear({k: v for k, v in q.items() if k != "bias"}, x)
    assert not np.allclose(np.asarray(y_q), np.asarray(y_nb))


def test_int4_stacked_kernels():
    """Scan-stacked [L, in, out] kernels quantize per layer slice."""
    ws = [nn.linear_init(jax.random.PRNGKey(i), 128, 64, jnp.float32)["kernel"]
          for i in range(4)]
    ql = nn.quantize_linear_int4({"kernel": jnp.stack(ws)})
    assert ql["kernel_q4"].shape == (4, 64, 64)
    assert ql["kernel_q4"].dtype == jnp.uint8
    assert ql["kernel_scale4"].shape == (4, 1, 64)
    for i in (0, 3):
        w = nn.dequantize_int4(ql["kernel_q4"][i], ql["kernel_scale4"][i],
                               jnp.float32)
        scale = np.asarray(ql["kernel_scale4"][i])
        per_elem = np.repeat(scale, 128 // scale.shape[0], axis=0)
        assert np.all(np.abs(np.asarray(w) - np.asarray(ws[i]))
                      <= per_elem * 0.5 + 1e-7)


def test_int4_tree_scopes():
    """Only projection linears under the quant scopes are converted."""
    key = jax.random.PRNGKey(3)
    tree = {"self_attn": {"q": nn.linear_init(key, 128, 128)},
            "ffn": {"up": nn.linear_init(key, 128, 256)},
            "modulation": {"kernel": jnp.ones((6, 128))},
            "head": {"kernel": jnp.ones((128, 64))}}
    qt = nn.quantize_tree_int4(tree)
    assert "kernel_q4" in qt["self_attn"]["q"]
    assert "kernel_q4" in qt["ffn"]["up"]
    assert "kernel" in qt["modulation"] and "kernel" in qt["head"]


def test_int4_bf16_activation_dtype():
    p = nn.linear_init(jax.random.PRNGKey(4), 128, 64, jnp.float32)
    q = nn.quantize_linear_int4(p)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 128), jnp.bfloat16)
    y = nn.linear(q, x)
    assert y.dtype == jnp.bfloat16
    assert bool(jnp.all(jnp.isfinite(y.astype(jnp.float32))))


def test_int4_odd_in_dim_rejected():
    p = {"kernel": jnp.ones((127, 8), jnp.float32)}
    with pytest.raises(ValueError):
        nn.quantize_linear_int4(p)


def test_pipeline_accepts_int4(tiny_cfg_params=None):
    """MOVAPipeline(quantize='int4') produces finite output on CPU at a
    tiny config (full generate path, FakeTokenizer)."""
    from tests.test_pipeline_e2e import FakeTokenizer

    from dualforce_tpu.config import tiny_test_config
    from dualforce_tpu.diffusion.pipeline import MOVAPipeline
    from dualforce_tpu.models.factory import init_pipeline_params

    cfg = tiny_test_config()
    params = init_pipeline_params(jax.random.PRNGKey(0), cfg,
                                  dtype=jnp.float32)
    img = np.zeros((32, 32, 3), np.float32)
    outs = {}
    for mode in ("none", "int4"):
        pipe = MOVAPipeline(cfg, params, tokenizer=FakeTokenizer(),
                            quantize=mode)
        r = pipe("tok1 tok2", img, seed=0, height=32, width=32,
                 num_frames=5, num_inference_steps=2, cfg_scale=5.0)
        assert r.video.dtype == np.uint8
        assert np.all(np.isfinite(r.audio))
        outs[mode] = np.asarray(r.video, np.float32)
    # int4 output is close to (but not identical with) the fp path
    assert not np.array_equal(outs["none"], outs["int4"])
    assert np.mean(np.abs(outs["none"] - outs["int4"])) < 16.0  # u8 scale
