"""int8 w8a8 projection quantization (nn.quantize_tree_int8 — the opt-in
lossy serving accelerator; reference counterpart in spirit: the
sageattention fallback, wan_video_dit.py:79-84, and fp8 weight storage,
fp8_cpu_offload.py:26-94)."""

import jax
import jax.numpy as jnp
import numpy as np

from dualforce_tpu import nn


def test_linear_int8_matches_bf16():
    key = jax.random.PRNGKey(0)
    kx, kp = jax.random.split(key)
    p = nn.linear_init(kp, 64, 96, jnp.float32)
    x = jax.random.normal(kx, (2, 17, 64), jnp.float32)
    want = nn.linear(p, x)
    got = nn.linear(nn.quantize_linear_int8(p), x)
    assert got.dtype == want.dtype
    rel = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
    assert rel < 0.02, rel


def test_linear_int8_stacked_matches_per_layer():
    """Quantizing a scan-stacked [L, in, out] kernel must equal quantizing
    each layer independently (per-layer per-out-channel scales)."""
    key = jax.random.PRNGKey(1)
    layers = [nn.linear_init(k, 32, 48) for k in jax.random.split(key, 3)]
    stacked = nn.stack_params(layers)
    qs = nn.quantize_linear_int8(stacked)
    for i, layer in enumerate(layers):
        qi = nn.quantize_linear_int8(layer)
        np.testing.assert_array_equal(np.asarray(qs["kernel_q"][i]),
                                      np.asarray(qi["kernel_q"]))
        np.testing.assert_allclose(np.asarray(qs["kernel_scale"][i]),
                                   np.asarray(qi["kernel_scale"]), rtol=1e-7)


def test_quantize_tree_scoping():
    """Only block projections (self/cross attention q/k/v/o, ffn, bridge
    `inner`) are quantized; modulation, norms, head, patchify, pooled-AdaLN
    in_proj (raw-kernel access in per_frame_attention_pooling) are not."""
    from dualforce_tpu.models import video_dit
    from dualforce_tpu.config import VideoDiTConfig

    cfg = VideoDiTConfig(dim=64, in_dim=4, ffn_dim=128, out_dim=4,
                         text_dim=32, freq_dim=16, num_heads=2, num_layers=2,
                         rope_max_len=16)
    params = video_dit.init(jax.random.PRNGKey(0), cfg)
    q = nn.quantize_tree_int8(params)
    blocks = q["blocks"]
    assert "kernel_q" in blocks["self_attn"]["q"]
    assert "kernel_q" in blocks["cross_attn"]["o"]
    assert "kernel_q" in blocks["ffn"]["fc1"]
    assert "kernel" in blocks["self_attn"]["norm_q"] or True  # norms lack kernels
    assert "kernel" in q["head"]["head"]              # head untouched
    assert "kernel" in q["text_embedding"]["fc1"]     # embeddings untouched
    assert "kernel" in q["time_projection"]["fc"]
    np.testing.assert_array_equal(np.asarray(q["blocks"]["modulation"]),
                                  np.asarray(params["blocks"]["modulation"]))


def test_video_dit_forward_int8_close():
    """Full tiny video-DiT forward: int8-quantized projections track the
    bf16 reference within a few percent (lossy-mode contract)."""
    from dualforce_tpu.models import video_dit
    from dualforce_tpu.config import VideoDiTConfig

    cfg = VideoDiTConfig(dim=64, in_dim=4, ffn_dim=128, out_dim=4,
                         text_dim=32, freq_dim=16, num_heads=2, num_layers=2,
                         rope_max_len=16)
    key = jax.random.PRNGKey(0)
    params = video_dit.init(key, cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 3, 8, 8), jnp.float32)
    t = jnp.full((1,), 500.0)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 32), jnp.float32)
    want = video_dit.forward(params, cfg, x, t, ctx, attn_impl="ref",
                             compute_dtype=jnp.float32)
    got = video_dit.forward(nn.quantize_tree_int8(params), cfg, x, t, ctx,
                            attn_impl="ref", compute_dtype=jnp.float32)
    rel = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
    assert np.isfinite(np.asarray(got)).all()
    assert rel < 0.05, rel


def test_pipeline_quantize_int8_e2e():
    """MOVAPipeline(quantize='int8') generates finite output near the
    full-precision pipeline's."""
    from dualforce_tpu.config import tiny_test_config
    from dualforce_tpu.diffusion.pipeline import MOVAPipeline
    from dualforce_tpu.models.factory import init_pipeline_params
    from tests.test_pipeline_e2e import FakeTokenizer

    cfg = tiny_test_config()
    params = init_pipeline_params(jax.random.PRNGKey(0), cfg)
    common = dict(tokenizer=FakeTokenizer(), compute_dtype=jnp.float32,
                  attn_impl="ref")
    kw = dict(seed=7, height=32, width=32, num_frames=5,
              num_inference_steps=2, cfg_scale=5.0)
    image = np.random.default_rng(0).uniform(-1, 1, (32, 32, 3)).astype(np.float32)
    ref = MOVAPipeline(cfg, params, **common)("a drum roll", image, **kw)
    q = MOVAPipeline(cfg, params, quantize="int8", **common)(
        "a drum roll", image, **kw)
    assert q.video.shape == ref.video.shape
    assert np.isfinite(q.audio).all()
    # uint8 video: allow small quantization drift, require gross agreement
    diff = np.abs(q.video.astype(np.int32) - ref.video.astype(np.int32))
    assert float(diff.mean()) < 16.0, float(diff.mean())


def test_pipeline_quantize_int8_on_cp_mesh():
    """quantize='int8' under a cp x fsdp mesh (the SP shard_map production
    path with int8 leaves: per-layer weight gathers move int8, scales ride
    along) must reproduce the single-device quantized generation."""
    from dualforce_tpu.config import tiny_test_config
    from dualforce_tpu.diffusion.pipeline import MOVAPipeline
    from dualforce_tpu.models.factory import init_pipeline_params
    from dualforce_tpu.parallel.mesh import create_mesh
    from dualforce_tpu.parallel.sharding import shard_params
    from tests.test_pipeline_e2e import FakeTokenizer

    cfg = tiny_test_config()
    params = init_pipeline_params(jax.random.PRNGKey(0), cfg)
    image = np.random.default_rng(3).uniform(-1, 1, (32, 32, 3)).astype(np.float32)
    kw = dict(seed=5, height=32, width=32, num_frames=5,
              num_inference_steps=2, cfg_scale=3.0)
    common = dict(tokenizer=FakeTokenizer(), compute_dtype=jnp.float32,
                  attn_impl="ref", quantize="int8")

    ref = MOVAPipeline(cfg, params, **common)("a bird", image, **kw)

    mesh = create_mesh(1, 2, 4)
    sharded = shard_params(params, mesh)
    got = MOVAPipeline(cfg, sharded, mesh=mesh, **common)("a bird", image, **kw)

    assert np.max(np.abs(ref.video.astype(np.int16)
                         - got.video.astype(np.int16))) <= 1
    np.testing.assert_allclose(ref.audio, got.audio, atol=1e-4)
