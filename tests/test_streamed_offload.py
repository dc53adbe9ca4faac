"""Layerwise group-streamed offload (reference `--offload group`,
README.md "Layerwise (group offload)" row): the streamed denoise must be
numerically equivalent to the resident path — same layer body, same order —
across group sizes, CFG modes, and interaction strategies.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dualforce_tpu.config import tiny_test_config
from dualforce_tpu.diffusion.pipeline import MOVAPipeline
from dualforce_tpu.diffusion.sampler import build_plan, denoise_loop
from dualforce_tpu.diffusion.streamed import denoise_streamed, plan_groups
from dualforce_tpu.models.factory import init_pipeline_params
from test_pipeline_e2e import FakeTokenizer


def test_plan_groups_partitioning():
    cfg = tiny_test_config(visual_layers=5, audio_layers=3)
    specs = plan_groups(cfg.bridge, 5, 2)
    # shared depth 3 -> groups (0,2),(2,3); tail -> (3,5)
    assert [s["v"] for s in specs] == [(0, 2), (2, 3), (3, 5)]
    assert [s["shared"] for s in specs] == [2, 1, 0]
    assert specs[0]["interact"] == (0, 1) and specs[0]["b"] == (0, 2)
    assert specs[1]["interact"] == (0,) and specs[1]["b"] == (2, 3)
    assert specs[2]["interact"] == () and specs[2]["b"] == (0, 0)
    # tail groups carry no audio layers
    assert specs[2]["a"] == (3, 3)


def test_plan_groups_sparse_interaction():
    cfg = tiny_test_config(visual_layers=7, audio_layers=6,
                           interaction_strategy="distributed")
    # interact = [0, 3] within shared depth 6
    specs = plan_groups(cfg.bridge, 7, 4)
    assert [s["v"] for s in specs] == [(0, 4), (4, 6), (6, 7)]
    assert specs[0]["interact"] == (0, 3) and specs[0]["b"] == (0, 2)
    assert specs[1]["interact"] == () and specs[1]["b"] == (0, 0)


def _setup(visual_layers=5, audio_layers=3, strategy="full"):
    cfg = tiny_test_config(visual_layers=visual_layers,
                           audio_layers=audio_layers,
                           interaction_strategy=strategy)
    params = init_pipeline_params(jax.random.PRNGKey(0), cfg,
                                  with_vaes=False, with_text=False,
                                  two_video_towers=False)
    ks = jax.random.split(jax.random.PRNGKey(1), 5)
    b, F, lh, lw = 1, 3, 8, 8
    latents = jax.random.normal(ks[0], (b, 16, F, lh, lw), jnp.float32)
    condition = jax.random.normal(ks[1], (b, 20, F, lh, lw), jnp.float32)
    audio = jax.random.normal(ks[2], (b, cfg.audio_dit.in_dim, 25), jnp.float32)
    ctx_pos = jax.random.normal(ks[3], (b, 16, cfg.video_dit.text_dim), jnp.float32)
    ctx_neg = jax.random.normal(ks[4], (b, 16, cfg.video_dit.text_dim), jnp.float32)
    from dualforce_tpu.diffusion.flow_match import FlowMatchPairScheduler

    sched = FlowMatchPairScheduler(cfg.scheduler)
    sched.set_timesteps(4, shift=5.0)
    plan = build_plan(sched, boundary_ratio=0.0)
    return cfg, params, plan, (latents, condition, audio, ctx_pos, ctx_neg)


def _run_resident(cfg, params, plan, data, **kw):
    latents, condition, audio, ctx_pos, ctx_neg = data
    return denoise_loop(
        params["video_dit"], None, params["audio_dit"], params["bridge"],
        cfg, latents, condition, audio, ctx_pos, ctx_neg, plan,
        compute_dtype=jnp.float32, attn_impl="ref", **kw)


def _run_streamed(cfg, params, plan, data, group_size=2, **kw):
    latents, condition, audio, ctx_pos, ctx_neg = data
    return denoise_streamed(
        params["video_dit"], params["audio_dit"], params["bridge"],
        cfg, latents, condition, audio, ctx_pos, ctx_neg, plan,
        0, plan.num_steps, group_size=group_size,
        compute_dtype=jnp.float32, attn_impl="ref", **kw)


@pytest.mark.parametrize("group_size", [1, 2, 100])
def test_streamed_equals_resident(group_size):
    cfg, params, plan, data = _setup()
    lat_r, alat_r = _run_resident(cfg, params, plan, data, cfg_scale=4.0)
    lat_s, alat_s = _run_streamed(cfg, params, plan, data,
                                  group_size=group_size, cfg_scale=4.0)
    np.testing.assert_allclose(np.asarray(lat_s), np.asarray(lat_r),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(alat_s), np.asarray(alat_r),
                               rtol=2e-5, atol=2e-5)


def test_streamed_cfg_modes_match():
    cfg, params, plan, data = _setup()
    for kw in (dict(cfg_scale=4.0, cfg_batch=True),
               dict(cfg_scale=4.0, cfg_cache_interval=2),
               dict(cfg_scale=1.0),
               dict(cfg_scale=4.0, cfg_scale_bridge=1.5)):
        lat_r, alat_r = _run_resident(cfg, params, plan, data, **kw)
        lat_s, alat_s = _run_streamed(cfg, params, plan, data, **kw)
        np.testing.assert_allclose(np.asarray(lat_s), np.asarray(lat_r),
                                   rtol=2e-5, atol=2e-5, err_msg=str(kw))
        np.testing.assert_allclose(np.asarray(alat_s), np.asarray(alat_r),
                                   rtol=2e-5, atol=2e-5, err_msg=str(kw))


def test_streamed_resident_small_matches():
    """resident_small pins audio tower + bridge in HBM and streams only the
    video groups; results must be bit-comparable to the all-streamed path."""
    cfg, params, plan, data = _setup()
    lat_r, alat_r = _run_resident(cfg, params, plan, data, cfg_scale=4.0)
    lat_s, alat_s = _run_streamed(cfg, params, plan, data, group_size=2,
                                  cfg_scale=4.0, resident_small=True)
    np.testing.assert_allclose(np.asarray(lat_s), np.asarray(lat_r),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(alat_s), np.asarray(alat_r),
                               rtol=2e-5, atol=2e-5)


def test_streamed_resident_small_sparse_interaction():
    """Sparse strategies exercise the on-device bridge slice remapping."""
    cfg, params, plan, data = _setup(visual_layers=7, audio_layers=6,
                                     strategy="distributed")
    lat_r, alat_r = _run_resident(cfg, params, plan, data, cfg_scale=4.0)
    lat_s, alat_s = _run_streamed(cfg, params, plan, data, group_size=4,
                                  cfg_scale=4.0, resident_small=True)
    np.testing.assert_allclose(np.asarray(lat_s), np.asarray(lat_r),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(alat_s), np.asarray(alat_r),
                               rtol=2e-5, atol=2e-5)


def test_streamed_sparse_interaction_matches():
    """Non-"full" strategies exercise the per-layer general path with
    group-local bridge index remapping."""
    cfg, params, plan, data = _setup(visual_layers=7, audio_layers=6,
                                     strategy="distributed")
    lat_r, alat_r = _run_resident(cfg, params, plan, data, cfg_scale=4.0)
    lat_s, alat_s = _run_streamed(cfg, params, plan, data, group_size=4,
                                  cfg_scale=4.0)
    np.testing.assert_allclose(np.asarray(lat_s), np.asarray(lat_r),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(alat_s), np.asarray(alat_r),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_generate_group_offload():
    """Full generate() under offload='group' equals offload='none' (both
    towers, expert switch, CFG)."""
    cfg = tiny_test_config()
    params = init_pipeline_params(jax.random.PRNGKey(0), cfg)
    host_params = jax.tree.map(np.asarray, params)
    image = np.random.default_rng(0).uniform(-1, 1, (32, 32, 3)).astype(np.float32)
    kw = dict(seed=11, height=32, width=32, num_frames=5,
              num_inference_steps=3, cfg_scale=5.0)
    r_none = MOVAPipeline(cfg, params, tokenizer=FakeTokenizer(),
                          compute_dtype=jnp.float32, attn_impl="ref")(
        "a cat", image, **kw)
    r_group = MOVAPipeline(cfg, host_params, tokenizer=FakeTokenizer(),
                           compute_dtype=jnp.float32, attn_impl="ref",
                           offload="group", offload_group_size=1)(
        "a cat", image, **kw)
    assert np.mean(np.abs(r_group.video.astype(int) -
                          r_none.video.astype(int))) < 1.0
    np.testing.assert_allclose(r_group.audio, r_none.audio, atol=1e-4)


def test_e2e_driver_pass_schedule():
    """Chunk planning used by the 720p driver's multi-process mode: pass
    counts follow the cfg-cache cadence with cache carry (refresh at step 0,
    every k steps, and at the expert boundary), and greedy chunking never
    exceeds the per-process pass budget."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "run_720p_e2e", os.path.join(os.path.dirname(__file__), "..",
                                     "tools", "run_720p_e2e.py"))
    drv = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(drv)

    # k=3, boundary at 4: refreshes at 0, 3 (cadence), 4 (boundary reset), 6
    counts = drv.pass_schedule(8, 3, 4)
    assert counts == [2, 1, 1, 2, 2, 1, 2, 1]
    chunks = drv.split_chunks(counts, 3)
    assert chunks[0][0] == 0 and chunks[-1][1] == 8
    assert [a for a, b in chunks[1:]] == [b for a, b in chunks[:-1]]
    for a, b in chunks:
        assert sum(counts[a:b]) <= 3
    # no-cache mode: every step is 2 passes
    assert drv.pass_schedule(4, 1, 99) == [2, 2, 2, 2]
    # single chunk when the budget covers everything
    assert drv.split_chunks(counts, 100) == [(0, 8)]


def test_e2e_driver_state_roundtrip(tmp_path):
    import importlib.util
    import os

    import numpy as np

    spec = importlib.util.spec_from_file_location(
        "run_720p_e2e", os.path.join(os.path.dirname(__file__), "..",
                                     "tools", "run_720p_e2e.py"))
    drv = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(drv)

    state = {"step": 3, "settings": {"cfg_scale": 5.0, "video_fps": 24.0},
             "latents": np.arange(12, dtype=np.float32).reshape(3, 4),
             "ctx_neg": None, "neg_cache_v": np.ones((2, 2), np.float32)}
    p = str(tmp_path / "state.npz")
    drv.save_state(state, p)
    got = drv.load_state(p)
    assert got["step"] == 3 and got["settings"] == state["settings"]
    np.testing.assert_array_equal(got["latents"], state["latents"])
    np.testing.assert_array_equal(got["neg_cache_v"], state["neg_cache_v"])
    assert got["ctx_neg"] is None and got["neg_cache_a"] is None


def test_e2e_driver_state_roundtrip_bf16(tmp_path):
    """Regression: real (non-dry) runs carry bf16 ctx embeddings; np.savez
    silently serializes ml_dtypes descrs as raw void ('|V2'), which then
    crashed denoise_state in the next chunk worker. save_state must encode
    the true dtype and load_state must rebuild it bit-exactly."""
    import importlib.util
    import os

    import ml_dtypes
    import numpy as np

    spec = importlib.util.spec_from_file_location(
        "run_720p_e2e", os.path.join(os.path.dirname(__file__), "..",
                                     "tools", "run_720p_e2e.py"))
    drv = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(drv)

    rng = np.random.default_rng(0)
    ctx = rng.standard_normal((1, 8, 16)).astype(ml_dtypes.bfloat16)
    state = {"step": 1, "settings": {"cfg_scale": 5.0},
             "latents": rng.standard_normal((2, 3)).astype(np.float32),
             "ctx_pos": ctx, "ctx_neg": None}
    p = str(tmp_path / "state.npz")
    drv.save_state(state, p)
    got = drv.load_state(p)
    assert got["ctx_pos"].dtype == ml_dtypes.bfloat16
    np.testing.assert_array_equal(
        got["ctx_pos"].view(np.uint16), ctx.view(np.uint16))
    # jnp must accept the rebuilt array (the original failure mode)
    import jax.numpy as jnp
    jnp.asarray(got["ctx_pos"]).block_until_ready()

    # a state file written by the PRE-fix save_state (descr lost to '|V2')
    # must still load: the itemsize-2 fallback views it as bf16
    legacy = {"__settings__": np.frombuffer(b'{"cfg_scale": 5.0}', np.uint8),
              "__step__": np.int64(1), "ctx_pos": ctx}
    with open(p, "wb") as f:
        np.savez(f, **legacy)
    got = drv.load_state(p)
    assert got["ctx_pos"].dtype == ml_dtypes.bfloat16
    np.testing.assert_array_equal(
        got["ctx_pos"].view(np.uint16), ctx.view(np.uint16))


def test_e2e_driver_fetch_chunked():
    """Sliced d2h must be bit-identical to a whole-array fetch, for both a
    multi-chunk f32 leaf and a sub-chunk bf16 leaf (the state mix a real
    720p run saves between chunk workers)."""
    import importlib.util
    import os

    import jax.numpy as jnp
    import ml_dtypes
    import numpy as np

    spec = importlib.util.spec_from_file_location(
        "run_720p_e2e", os.path.join(os.path.dirname(__file__), "..",
                                     "tools", "run_720p_e2e.py"))
    drv = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(drv)

    rng = np.random.default_rng(3)
    big = rng.standard_normal((7, 513, 330)).astype(np.float32)  # 4.5 MiB
    got = drv.fetch_chunked(jnp.asarray(big), chunk_mib=1,
                            log=lambda *a, **k: None)  # 5 uneven slices
    assert got.dtype == np.float32
    np.testing.assert_array_equal(got, big)

    small = rng.standard_normal((4, 5)).astype(ml_dtypes.bfloat16)
    got = drv.fetch_chunked(jnp.asarray(small), log=lambda *a, **k: None)
    assert got.dtype == ml_dtypes.bfloat16
    np.testing.assert_array_equal(got.view(np.uint16), small.view(np.uint16))


@pytest.mark.parametrize("resident_small", [False, True])
def test_streamed_resident_video_groups_matches(resident_small):
    """Partial residency (first K video groups pinned in HBM across passes)
    must be bit-comparable to full streaming, with and without the
    resident_small audio/bridge pinning it composes with."""
    cfg, params, plan, data = _setup()
    lat_r, alat_r = _run_resident(cfg, params, plan, data, cfg_scale=4.0)
    lat_s, alat_s = _run_streamed(cfg, params, plan, data, group_size=2,
                                  cfg_scale=4.0,
                                  resident_small=resident_small,
                                  resident_video_groups=1)
    np.testing.assert_allclose(np.asarray(lat_s), np.asarray(lat_r),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(alat_s), np.asarray(alat_r),
                               rtol=2e-5, atol=2e-5)
