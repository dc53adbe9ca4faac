"""Checkpoint ingestion end-to-end: build a tiny HF-layout MOVA checkpoint
(reference torch modules + HF UMT5 + Wan-named VAE) and load it through the
real path users hit first — config_from_checkpoint -> load_pipeline_params ->
load_tokenizer -> a dual-tower forward on the loaded weights."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from dualforce_tpu.config import tiny_test_config
from dualforce_tpu.convert.load_checkpoint import (
    config_from_checkpoint,
    load_pipeline_params,
    load_tokenizer,
)
from dualforce_tpu.diffusion.step import dual_tower_step


@pytest.fixture(scope="session")
def tiny_ckpt(tmp_path_factory):
    from make_tiny_checkpoint import build

    return build(str(tmp_path_factory.mktemp("ckpt") / "tiny_mova"))


def test_config_roundtrip(tiny_ckpt):
    want = tiny_test_config()
    got = config_from_checkpoint(tiny_ckpt)
    assert got.video_dit == want.video_dit
    assert got.audio_dit == want.audio_dit
    assert got.video_vae == want.video_vae
    assert got.audio_vae == want.audio_vae
    assert got.text_encoder == want.text_encoder
    assert got.bridge.interaction_strategy == want.bridge.interaction_strategy
    assert got.two_video_towers
    assert got.boundary_ratio == 0.9


def test_load_params_and_forward(tiny_ckpt):
    cfg = config_from_checkpoint(tiny_ckpt)
    params = load_pipeline_params(tiny_ckpt, cfg, dtype=jnp.float32)
    for mod in ("video_dit", "video_dit_2", "audio_dit", "bridge",
                "video_vae", "audio_vae", "text_encoder"):
        assert mod in params, mod

    # one dual-tower denoise forward on the loaded weights
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    visual = jax.random.normal(ks[0], (1, 36, 3, 8, 8), jnp.float32)
    audio = jax.random.normal(ks[1], (1, cfg.audio_dit.in_dim, 25), jnp.float32)
    ctx = jax.random.normal(ks[2], (1, 16, cfg.video_dit.text_dim), jnp.float32)
    t = jnp.full((1,), 500.0, jnp.float32)
    v_out, a_out = dual_tower_step(
        params["video_dit"], params["audio_dit"], params["bridge"],
        cfg.video_dit, cfg.audio_dit, cfg.bridge,
        visual, audio, ctx, t, t, video_fps=24.0, compute_dtype=jnp.float32)
    assert v_out.shape == (1, 16, 3, 8, 8)
    assert a_out.shape == (1, cfg.audio_dit.out_dim, 25)
    assert np.isfinite(np.asarray(v_out)).all()
    assert np.isfinite(np.asarray(a_out)).all()

    # VAE paths on loaded weights: encode/decode shapes + finiteness
    from dualforce_tpu.models import dac_vae, wan_vae

    video = jax.random.uniform(ks[0], (1, 5, 32, 32, 3), jnp.float32, -1, 1)
    z = wan_vae.encode_mode(params["video_vae"], cfg.video_vae, video)
    assert z.shape[1] == 2 and np.isfinite(np.asarray(z)).all()
    wav = jax.random.normal(ks[1], (1, 1, cfg.audio_vae.hop_length * 3), jnp.float32)
    lat = dac_vae.encode_mode(params["audio_vae"], cfg.audio_vae, wav)
    assert np.isfinite(np.asarray(lat)).all()


def test_orbax_cache_roundtrip(tiny_ckpt, tmp_path):
    """cache=True: first load converts + saves; second load restores the
    Orbax cache and matches the converted pytrees exactly."""
    cfg = config_from_checkpoint(tiny_ckpt)
    cache_dir = str(tmp_path / "orbax_cache")
    first = load_pipeline_params(tiny_ckpt, cfg, dtype=jnp.float32,
                                 cache=True, cache_dir=cache_dir)
    assert os.path.isdir(cache_dir) and os.listdir(cache_dir)
    second = load_pipeline_params(tiny_ckpt, cfg, dtype=jnp.float32,
                                  cache=True, cache_dir=cache_dir)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), first, second)


def test_fp8_weight_storage(tiny_ckpt):
    """dtype=float8_e4m3fn stores matmul kernels in fp8 (≈half the tower
    bytes), keeps norms/biases/modulation in bf16, and the forward upcasts at
    use — output stays close to the bf16-weights forward."""
    from dualforce_tpu.utils.misc import tree_size_bytes

    cfg = config_from_checkpoint(tiny_ckpt)
    p16 = load_pipeline_params(tiny_ckpt, cfg, dtype=jnp.bfloat16)
    p8 = load_pipeline_params(tiny_ckpt, cfg, dtype=jnp.float8_e4m3fn)
    assert (tree_size_bytes(p8["video_dit"])
            < 0.7 * tree_size_bytes(p16["video_dit"]))
    kern = p8["video_dit"]["blocks"]["self_attn"]["q"]["kernel"]
    assert kern.dtype == jnp.float8_e4m3fn
    norm = p8["video_dit"]["blocks"]["self_attn"]["norm_q"]["scale"]
    assert norm.dtype == jnp.bfloat16

    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    visual = jax.random.normal(ks[0], (1, 36, 3, 8, 8), jnp.float32)
    audio = jax.random.normal(ks[1], (1, cfg.audio_dit.in_dim, 25), jnp.float32)
    ctx = jax.random.normal(ks[2], (1, 16, cfg.video_dit.text_dim), jnp.float32) * 0.1
    t = jnp.full((1,), 500.0, jnp.float32)

    def run(p):
        v, a = dual_tower_step(
            p["video_dit"], p["audio_dit"], p["bridge"],
            cfg.video_dit, cfg.audio_dit, cfg.bridge,
            visual, audio, ctx, t, t, video_fps=24.0,
            compute_dtype=jnp.bfloat16)
        return np.asarray(v, np.float32), np.asarray(a, np.float32)

    v16, a16 = run(p16)
    v8, a8 = run(p8)
    assert np.isfinite(v8).all() and np.isfinite(a8).all()
    # fp8 e4m3 has ~2 decimal digits; expect correlated outputs, not identity
    def rel(a, b):
        return float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-9))
    assert rel(v8, v16) < 0.25, rel(v8, v16)
    assert rel(a8, a16) < 0.25, rel(a8, a16)


def test_tokenizer_and_text_encoder(tiny_ckpt):
    from dualforce_tpu.models import umt5

    cfg = config_from_checkpoint(tiny_ckpt)
    params = load_pipeline_params(tiny_ckpt, cfg, dtype=jnp.float32)
    tok = load_tokenizer(tiny_ckpt)
    enc = tok(["tok1 tok2 tok3"], padding="max_length", max_length=16,
              truncation=True, return_attention_mask=True, return_tensors="np")
    emb = umt5.encode(params["text_encoder"], cfg.text_encoder,
                      jnp.asarray(enc["input_ids"]),
                      jnp.asarray(enc["attention_mask"]),
                      compute_dtype=jnp.float32)
    assert emb.shape == (1, 16, cfg.text_encoder.d_model)
    assert np.isfinite(np.asarray(emb)).all()

    # parity of the loaded text encoder vs the HF module it came from
    import torch
    from transformers import UMT5EncoderModel

    hf = UMT5EncoderModel.from_pretrained(os.path.join(tiny_ckpt, "text_encoder")).eval()
    with torch.no_grad():
        want = hf(torch.tensor(enc["input_ids"]),
                  attention_mask=torch.tensor(enc["attention_mask"])
                  ).last_hidden_state.numpy()
    np.testing.assert_allclose(np.asarray(emb), want, rtol=1e-4, atol=1e-4)
