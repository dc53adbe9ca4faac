"""End-to-end tiny-model generation: prompt + image -> video frames + waveform.

Exercises every interface of the stack (tokenize -> UMT5 -> VAE encode ->
jitted dual-tower denoise with expert switch + CFG -> VAE/DAC decode) at a
random-weight tiny config — SURVEY.md §7.2 phase 4's ONE-model milestone.
"""

import jax
import numpy as np

from dualforce_tpu.config import tiny_test_config
from dualforce_tpu.diffusion.pipeline import MOVAPipeline
from dualforce_tpu.diffusion.sampler import build_plan
from dualforce_tpu.diffusion.flow_match import FlowMatchPairScheduler
from dualforce_tpu.models.factory import init_pipeline_params


class FakeTokenizer:
    """Byte-level stand-in for T5TokenizerFast (no checkpoint in this image)."""

    def __call__(self, prompts, padding=None, max_length=512, truncation=True,
                 add_special_tokens=True, return_attention_mask=True,
                 return_tensors="np"):
        ids = np.zeros((len(prompts), max_length), np.int64)
        mask = np.zeros((len(prompts), max_length), np.int64)
        for i, p in enumerate(prompts):
            toks = [2 + (b % 500) for b in p.encode()][: max_length - 1] + [1]
            ids[i, : len(toks)] = toks
            mask[i, : len(toks)] = 1
        return {"input_ids": ids, "attention_mask": mask}


def _build_pipeline():
    cfg = tiny_test_config()
    params = init_pipeline_params(jax.random.PRNGKey(0), cfg)
    return MOVAPipeline(cfg, params, tokenizer=FakeTokenizer(),
                        compute_dtype=jax.numpy.float32, attn_impl="ref")


def test_generate_tiny():
    pipe = _build_pipeline()
    image = np.random.default_rng(0).uniform(-1, 1, (32, 32, 3)).astype(np.float32)
    res = pipe("a cat playing piano", image, negative_prompt="blurry",
               seed=42, height=32, width=32, num_frames=5, video_fps=24.0,
               num_inference_steps=3, cfg_scale=5.0)
    assert res.video.shape == (5, 32, 32, 3)
    assert res.video.dtype == np.uint8
    # decoded audio is trimmed to the exact video duration (the latent
    # length is rounded UP to the hop grid; the surplus is cut at decode)
    assert res.audio.shape == (int(48000 * 5 / 24),)
    assert np.isfinite(res.audio).all()
    assert res.sample_rate == 48000


def test_generate_deterministic_and_cfg_batch_equivalent():
    pipe = _build_pipeline()
    image = np.random.default_rng(1).uniform(-1, 1, (32, 32, 3)).astype(np.float32)
    kw = dict(seed=7, height=32, width=32, num_frames=5,
              num_inference_steps=2, cfg_scale=3.0)
    r1 = pipe("hello", image, **kw)
    r2 = pipe("hello", image, **kw)
    np.testing.assert_array_equal(r1.video, r2.video)
    np.testing.assert_array_equal(r1.audio, r2.audio)
    # batched-CFG path must match the two-pass path numerically (fp32)
    r3 = pipe("hello", image, cfg_batch=True, **kw)
    np.testing.assert_allclose(r3.audio, r1.audio, atol=1e-4)
    assert np.mean(np.abs(r3.video.astype(int) - r1.video.astype(int))) < 1.0


def test_ctx_valid_len_masks_pad_keys():
    """Step-level equivalence for the per-batch kv mask: GARBAGE beyond the
    valid context length + ctx_valid_len must equal running with the context
    physically truncated to that length (VERDICT r2 weak #6 wiring)."""
    from dualforce_tpu.diffusion.step import dual_tower_step

    cfg = tiny_test_config()
    params = init_pipeline_params(jax.random.PRNGKey(0), cfg, with_vaes=False,
                                  with_text=False, two_video_towers=False)
    ks = jax.random.split(jax.random.PRNGKey(3), 4)
    visual = jax.random.normal(ks[0], (2, 36, 3, 8, 8), jax.numpy.float32)
    audio = jax.random.normal(ks[1], (2, cfg.audio_dit.in_dim, 25),
                              jax.numpy.float32)
    L, valid = 16, (9, 4)
    ctx = jax.random.normal(ks[2], (2, L, cfg.video_dit.text_dim),
                            jax.numpy.float32)
    t = jax.numpy.full((2,), 500.0, jax.numpy.float32)

    def run(c, vlen):
        v, a = dual_tower_step(
            params["video_dit"], params["audio_dit"], params["bridge"],
            cfg.video_dit, cfg.audio_dit, cfg.bridge,
            visual, audio, c, t, t, video_fps=24.0,
            compute_dtype=jax.numpy.float32, attn_impl="ref",
            ctx_valid_len=(None if vlen is None
                           else jax.numpy.asarray(vlen, jax.numpy.int32)))
        return np.asarray(v), np.asarray(a)

    # per-item truncated references (pad each item's tail with the OTHER
    # item's tokens so a mask failure cannot cancel out)
    garbage = ctx[::-1]
    masked_in = jax.numpy.concatenate(
        [jax.numpy.where(jax.numpy.arange(L)[None, :, None] < v,
                         ctx[i:i + 1], garbage[i:i + 1])
         for i, v in enumerate(valid)], axis=0)
    got_v, got_a = run(masked_in, valid)
    for i, vl in enumerate(valid):
        # reference: batch of 1 with the context cut at vl
        want_v, want_a = dual_tower_step(
            params["video_dit"], params["audio_dit"], params["bridge"],
            cfg.video_dit, cfg.audio_dit, cfg.bridge,
            visual[i:i + 1], audio[i:i + 1], ctx[i:i + 1, :vl], t[:1], t[:1],
            video_fps=24.0, compute_dtype=jax.numpy.float32, attn_impl="ref")
        np.testing.assert_allclose(got_v[i], np.asarray(want_v)[0],
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(got_a[i], np.asarray(want_a)[0],
                                   rtol=2e-4, atol=2e-4)


def test_mask_ctx_pad_pipeline():
    """mask_ctx_pad=True end-to-end: runs deterministically, and for a
    prompt that fills ALL context positions it is bit-identical to the
    default (nothing masked); cfg_batch threads the concatenated lens."""
    cfg = tiny_test_config()
    params = init_pipeline_params(jax.random.PRNGKey(0), cfg)
    image = np.random.default_rng(3).uniform(-1, 1, (32, 32, 3)).astype(np.float32)
    kw = dict(seed=5, height=32, width=32, num_frames=5,
              num_inference_steps=2, cfg_scale=3.0)
    full_prompt = "x" * 600  # FakeTokenizer -> 512 tokens, mask all-ones
    base = MOVAPipeline(cfg, params, tokenizer=FakeTokenizer(),
                        compute_dtype=jax.numpy.float32, attn_impl="ref")
    masked = MOVAPipeline(cfg, params, tokenizer=FakeTokenizer(),
                          compute_dtype=jax.numpy.float32, attn_impl="ref",
                          mask_ctx_pad=True)
    r_base = base(full_prompt, image, negative_prompt="y" * 600, **kw)
    r_mask = masked(full_prompt, image, negative_prompt="y" * 600, **kw)
    np.testing.assert_array_equal(r_base.video, r_mask.video)
    np.testing.assert_array_equal(r_base.audio, r_mask.audio)

    # short prompt + cfg_batch: exercises len concat; deterministic
    r1 = masked("a dog", image, cfg_batch=True, **kw)
    r2 = masked("a dog", image, cfg_batch=True, **kw)
    np.testing.assert_array_equal(r1.video, r2.video)
    assert np.isfinite(r1.audio).all()


def test_component_offload_matches_resident():
    """offload="component" (host-resident params, modules staged per phase,
    experts never co-resident) must produce bit-identical output to the
    HBM-resident path."""
    cfg = tiny_test_config()
    params = init_pipeline_params(jax.random.PRNGKey(0), cfg)
    host_params = jax.tree.map(np.asarray, params)
    image = np.random.default_rng(2).uniform(-1, 1, (32, 32, 3)).astype(np.float32)
    kw = dict(seed=11, height=32, width=32, num_frames=5,
              num_inference_steps=3, cfg_scale=5.0)

    resident = MOVAPipeline(cfg, params, tokenizer=FakeTokenizer(),
                            compute_dtype=jax.numpy.float32, attn_impl="ref")
    offloaded = MOVAPipeline(cfg, host_params, tokenizer=FakeTokenizer(),
                             compute_dtype=jax.numpy.float32, attn_impl="ref",
                             offload="component")
    r1 = resident("a cat", image, **kw)
    r2 = offloaded("a cat", image, **kw)
    np.testing.assert_array_equal(r1.video, r2.video)
    np.testing.assert_array_equal(r1.audio, r2.audio)


def test_cfg_cache_interval():
    """interval=1 must be EXACT vs the baseline; interval=2 is the cached
    approximation (finite, deterministic, refreshed at the expert boundary)."""
    pipe = _build_pipeline()
    image = np.random.default_rng(3).uniform(-1, 1, (32, 32, 3)).astype(np.float32)
    kw = dict(seed=5, height=32, width=32, num_frames=5,
              num_inference_steps=4, cfg_scale=5.0)
    base = pipe("hello", image, **kw)
    exact = pipe("hello", image, cfg_cache_interval=1, **kw)
    np.testing.assert_array_equal(base.video, exact.video)

    cached = pipe("hello", image, cfg_cache_interval=2, **kw)
    assert np.isfinite(cached.audio).all()
    cached2 = pipe("hello", image, cfg_cache_interval=2, **kw)
    np.testing.assert_array_equal(cached.video, cached2.video)
    # the approximation must actually engage (output differs from exact)
    assert not np.array_equal(cached.video, base.video)

    import pytest

    with pytest.raises(ValueError):
        pipe("hello", image, cfg_cache_interval=2, cfg_batch=True, **kw)


def test_generate_batch_matches_singles():
    """pipe.generate with a 2-request batch must match two single runs
    (same seeds/prompts); this is the serving continuous-batching unit."""
    pipe = _build_pipeline()
    rng = np.random.default_rng(4)
    img1 = rng.uniform(-1, 1, (32, 32, 3)).astype(np.float32)
    img2 = rng.uniform(-1, 1, (32, 32, 3)).astype(np.float32)
    kw = dict(height=32, width=32, num_frames=5, num_inference_steps=2,
              cfg_scale=5.0)
    r1 = pipe("a cat", img1, negative_prompt="blurry", seed=3, **kw)
    r2 = pipe("a dog", img2, negative_prompt="noisy", seed=9, **kw)
    batch = pipe.generate(["a cat", "a dog"], [img1, img2],
                          negative_prompts=["blurry", "noisy"], seeds=[3, 9],
                          **kw)
    for single, batched in zip((r1, r2), batch):
        np.testing.assert_allclose(batched.audio, single.audio, atol=1e-4)
        assert np.mean(np.abs(batched.video.astype(int)
                              - single.video.astype(int))) < 0.5


def test_warmup_compiles_without_running():
    """AOT warmup must lower+compile the denoise bucket without executing it,
    and generation afterwards must USE the warmed executable (the jit's own
    dispatch cache stays empty)."""
    pipe = _build_pipeline()
    pipe.warmup(height=32, width=32, num_frames=5, num_inference_steps=2,
                cfg_scale=5.0)
    (dispatch,) = pipe._denoise_cache.values()
    assert len(dispatch._warm) == 1       # compiled executable registered
    img = np.random.default_rng(7).uniform(-1, 1, (32, 32, 3)).astype(np.float32)
    r = pipe("hi", img, seed=1, height=32, width=32, num_frames=5,
             num_inference_steps=2, cfg_scale=5.0)
    assert r.video.shape == (5, 32, 32, 3)
    assert dispatch._jit._cache_size() == 0  # served by the warmed executable

    # different geometry falls back to the jit path transparently
    r2 = pipe("hi", img, seed=1, height=32, width=32, num_frames=9,
              num_inference_steps=2, cfg_scale=5.0)
    assert r2.video.shape == (9, 32, 32, 3)


def test_dual_sigma_shift_not_sticky():
    """A request WITH visual/audio shifts must not leak its sigma columns
    into a later request WITHOUT them (scheduler postprocess is reset)."""
    pipe = _build_pipeline()
    img = np.random.default_rng(8).uniform(-1, 1, (32, 32, 3)).astype(np.float32)
    kw = dict(seed=2, height=32, width=32, num_frames=5,
              num_inference_steps=2, cfg_scale=1.0)
    base = pipe("hi", img, **kw)
    shifted = pipe("hi", img, visual_shift=2.0, audio_shift=9.0, **kw)
    assert not np.array_equal(shifted.audio, base.audio)
    again = pipe("hi", img, **kw)   # must match the ORIGINAL, not the shifted
    np.testing.assert_array_equal(again.video, base.video)
    np.testing.assert_array_equal(again.audio, base.audio)


def test_plan_boundary_switch():
    cfg = tiny_test_config()
    sched = FlowMatchPairScheduler(cfg.scheduler)
    sched.set_timesteps(50, shift=5.0)
    plan = build_plan(sched, boundary_ratio=0.9)
    ts = plan.pair_timesteps[:, 0]
    b = plan.boundary_step
    assert (ts[:b] >= 900).all() and (ts[b:] < 900).all()
    # sigma columns align with timesteps
    np.testing.assert_allclose(plan.sigmas_visual[:-1] * 1000, ts, rtol=1e-4)


def test_dual_cfg():
    """Dual CFG (cfg_scale_bridge = the paper's s_B): s_B=0 must be EXACTLY
    text CFG; s_B!=0 adds a bridge-off third pass that changes the output;
    composition with cfg_batch and cfg_cache_interval stays finite and
    deterministic."""
    pipe = _build_pipeline()
    image = np.random.default_rng(9).uniform(-1, 1, (32, 32, 3)).astype(np.float32)
    kw = dict(seed=13, height=32, width=32, num_frames=5,
              num_inference_steps=3, cfg_scale=5.0)
    base = pipe("hello", image, **kw)
    zero = pipe("hello", image, cfg_scale_bridge=0.0, **kw)
    np.testing.assert_array_equal(zero.video, base.video)
    np.testing.assert_array_equal(zero.audio, base.audio)

    dual = pipe("hello", image, cfg_scale_bridge=3.5, **kw)
    assert np.isfinite(dual.audio).all()
    assert not np.array_equal(dual.video, base.video)
    dual2 = pipe("hello", image, cfg_scale_bridge=3.5, **kw)
    np.testing.assert_array_equal(dual.video, dual2.video)

    # batched CFG composes with the dual term (fp32-tight vs two-pass)
    dual_b = pipe("hello", image, cfg_scale_bridge=3.5, cfg_batch=True, **kw)
    np.testing.assert_allclose(dual_b.audio, dual.audio, atol=1e-4)
    assert np.mean(np.abs(dual_b.video.astype(int) - dual.video.astype(int))) < 1.0

    # cached-negative CFG composes with the dual term
    dual_c = pipe("hello", image, cfg_scale_bridge=3.5, cfg_cache_interval=2, **kw)
    assert np.isfinite(dual_c.audio).all()

    # dual guidance without text CFG (cfg_scale=1): only pos + bridge-off passes
    kw1 = dict(kw, cfg_scale=1.0)
    plain = pipe("hello", image, **kw1)
    dual_only = pipe("hello", image, cfg_scale_bridge=2.0, **kw1)
    assert not np.array_equal(dual_only.video, plain.video)


def test_generate_on_cp_mesh_matches_single_device():
    """Public-pipeline cp equivalence: MOVAPipeline(mesh=...) with
    fsdp x cp sharded params must reproduce the single-device generation
    (regression: the mesh used to be cosmetic — no activation sharding hints
    were installed outside __graft_entry__, so cp replicated the sequence)."""
    from dualforce_tpu.parallel.mesh import create_mesh
    from dualforce_tpu.parallel.sharding import shard_params

    cfg = tiny_test_config()
    params = init_pipeline_params(jax.random.PRNGKey(0), cfg)
    image = np.random.default_rng(3).uniform(-1, 1, (32, 32, 3)).astype(np.float32)
    kw = dict(seed=5, height=32, width=32, num_frames=5,
              num_inference_steps=2, cfg_scale=3.0)

    ref = MOVAPipeline(cfg, params, tokenizer=FakeTokenizer(),
                       compute_dtype=jax.numpy.float32, attn_impl="ref")(
        "a bird", image, **kw)

    mesh = create_mesh(1, 2, 4)   # 8 virtual CPU devices (conftest)
    sharded = shard_params(params, mesh)
    got = MOVAPipeline(cfg, sharded, tokenizer=FakeTokenizer(),
                       compute_dtype=jax.numpy.float32, attn_impl="ref",
                       mesh=mesh)("a bird", image, **kw)

    # fp32 collectives may reorder reductions: allow 1-count uint8 wobble
    assert np.max(np.abs(ref.video.astype(np.int16)
                         - got.video.astype(np.int16))) <= 1
    np.testing.assert_allclose(ref.audio, got.audio, atol=1e-4)


def test_warmup_on_cp_mesh():
    """AOT warmup must lower the SEQUENCE-PARALLEL denoise program (shard_map
    over cp with abstract args) and generation must use the warmed
    executable with outputs matching the single-device run."""
    from dualforce_tpu.parallel.mesh import create_mesh
    from dualforce_tpu.parallel.sharding import shard_params

    cfg = tiny_test_config()
    params = init_pipeline_params(jax.random.PRNGKey(0), cfg)
    image = np.random.default_rng(3).uniform(-1, 1, (32, 32, 3)).astype(np.float32)
    kw = dict(seed=5, height=32, width=32, num_frames=5,
              num_inference_steps=2, cfg_scale=3.0)

    ref = MOVAPipeline(cfg, params, tokenizer=FakeTokenizer(),
                       compute_dtype=jax.numpy.float32, attn_impl="ref")(
        "a bird", image, **kw)

    mesh = create_mesh(1, 2, 4)
    sharded = shard_params(params, mesh)
    pipe = MOVAPipeline(cfg, sharded, tokenizer=FakeTokenizer(),
                        compute_dtype=jax.numpy.float32, attn_impl="ref",
                        mesh=mesh)
    pipe.warmup(height=32, width=32, num_frames=5, num_inference_steps=2,
                cfg_scale=3.0)
    (dispatch,) = pipe._denoise_cache.values()
    assert len(dispatch._warm) == 1
    got = pipe("a bird", image, **kw)
    assert dispatch._jit._cache_size() == 0  # served by the warmed executable
    assert np.max(np.abs(ref.video.astype(np.int16)
                         - got.video.astype(np.int16))) <= 1
    np.testing.assert_allclose(ref.audio, got.audio, atol=1e-4)


def test_resumable_chunked_generation_matches():
    """prepare_state / denoise_state(chunks) / finalize_state across
    simulated process restarts (state round-tripped through host numpy)
    must reproduce the one-shot __call__ bit-for-bit — incl. the CFG
    negative-cache carry (cfg_cache_interval=2 with chunk boundaries that
    land mid-cache-window) and the expert-switch cache reset."""
    cfg = tiny_test_config()
    params = init_pipeline_params(jax.random.PRNGKey(0), cfg)
    host_params = jax.tree.map(np.asarray, params)
    image = np.random.default_rng(5).uniform(-1, 1, (32, 32, 3)).astype(np.float32)
    kw = dict(height=32, width=32, num_frames=5, num_inference_steps=5,
              cfg_scale=5.0, cfg_cache_interval=2)

    pipe = MOVAPipeline(cfg, host_params, tokenizer=FakeTokenizer(),
                        compute_dtype=jax.numpy.float32, attn_impl="ref",
                        offload="group", offload_group_size=1)
    one = pipe("a fox drumming", image, seed=3, **kw)

    st = pipe.prepare_state(["a fox drumming"], [image], seeds=[3], **kw)

    def roundtrip(s):
        # simulate save/load: every array leaves the device as numpy
        out = {}
        for k, v in s.items():
            if k == "settings":
                out[k] = dict(v)
            elif v is None or isinstance(v, (int, float)):
                out[k] = v
            else:
                out[k] = np.asarray(v)
        return out

    st = roundtrip(st)
    sizes = [2, 1, 2]  # boundaries at steps 2 and 3 — mid cache window
    for n in sizes:
        pipe2 = MOVAPipeline(cfg, host_params, tokenizer=FakeTokenizer(),
                             compute_dtype=jax.numpy.float32, attn_impl="ref",
                             offload="group", offload_group_size=1)
        st = roundtrip(pipe2.denoise_state(st, max_steps=n))
    assert st["step"] == 5
    res = pipe.finalize_state(st)[0]
    np.testing.assert_array_equal(res.video, one.video)
    np.testing.assert_array_equal(res.audio, one.audio)
