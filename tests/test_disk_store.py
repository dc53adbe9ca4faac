"""Disk-backed parameter store (--offload_to_disk_path): round-trip fidelity
and end-to-end generation with memmapped params + component staging —
the reference's group-offload-to-disk niche (inference_single.py:92-97)."""

import jax
import numpy as np

from dualforce_tpu.config import tiny_test_config
from dualforce_tpu.convert.disk_store import (
    load_params_mmap,
    save_params_to_dir,
    store_matches,
)
from dualforce_tpu.diffusion.pipeline import MOVAPipeline
from dualforce_tpu.models.factory import init_pipeline_params

from tests.test_pipeline_e2e import FakeTokenizer


def test_roundtrip_and_match(tmp_path):
    cfg = tiny_test_config()
    params = init_pipeline_params(jax.random.PRNGKey(0), cfg)
    store = str(tmp_path / "store")
    assert not store_matches(params, store)
    save_params_to_dir(params, store, fingerprint="src-v1")
    assert store_matches(params, store)
    assert store_matches(None, store, fingerprint="src-v1")
    # a store from a different source/dtype must NOT be silently reused
    assert not store_matches(None, store, fingerprint="src-v2")
    loaded = load_params_mmap(params, store)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(loaded)[0],
    ):
        assert pa == pb
        assert isinstance(b, np.memmap)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dtype_mismatch_detected(tmp_path):
    """A bf16 store must not match a template loaded at a different dtype."""
    import jax.numpy as jnp

    cfg = tiny_test_config()
    params = init_pipeline_params(jax.random.PRNGKey(0), cfg)
    bf16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    store = str(tmp_path / "store")
    save_params_to_dir(bf16, store)
    assert store_matches(bf16, store)
    assert not store_matches(params, store)   # fp32 template vs bf16 store


def test_manifest_only_load_matches_template_load(tmp_path):
    """load_params_mmap_from_manifest rebuilds the identical tree without a
    template (no full-RAM checkpoint load on repeat runs)."""
    from dualforce_tpu.convert.disk_store import load_params_mmap_from_manifest

    cfg = tiny_test_config()
    params = init_pipeline_params(jax.random.PRNGKey(0), cfg)
    store = str(tmp_path / "store")
    save_params_to_dir(params, store)
    a = load_params_mmap(params, store)
    b = load_params_mmap_from_manifest(store)
    fa = jax.tree_util.tree_flatten_with_path(a)
    fb = jax.tree_util.tree_flatten_with_path(b)
    assert [p for p, _ in fa[0]] == [p for p, _ in fb[0]]
    for (_, x), (_, y) in zip(fa[0], fb[0]):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_generation_from_disk_matches_hbm(tmp_path):
    cfg = tiny_test_config()
    params = init_pipeline_params(jax.random.PRNGKey(0), cfg)
    image = np.random.default_rng(0).uniform(-1, 1, (32, 32, 3)).astype(np.float32)
    kw = dict(seed=11, height=32, width=32, num_frames=5,
              num_inference_steps=2, cfg_scale=3.0)

    ref = MOVAPipeline(cfg, params, tokenizer=FakeTokenizer(),
                       compute_dtype=jax.numpy.float32, attn_impl="ref")(
        "a dog", image, **kw)

    store = str(tmp_path / "store")
    save_params_to_dir(params, store)
    mm = load_params_mmap(params, store)
    got = MOVAPipeline(cfg, mm, tokenizer=FakeTokenizer(),
                       compute_dtype=jax.numpy.float32, attn_impl="ref",
                       offload="component")("a dog", image, **kw)

    np.testing.assert_array_equal(ref.video, got.video)
    np.testing.assert_allclose(ref.audio, got.audio, atol=1e-6)
