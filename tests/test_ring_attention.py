"""Sequence-parallel attention collectives on an 8-virtual-device CPU mesh."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from dualforce_tpu.ops.attention import attention_ref
from dualforce_tpu.parallel.mesh import create_mesh
from dualforce_tpu.parallel.ring_attention import (
    _inner_pallas,
    lse_combine_cross_attention,
    ring_attention,
    ulysses_attention,
)


def _mesh(cp):
    return create_mesh(1, 1, cp)


@pytest.mark.parametrize("cp", [2, 4])
def test_ring_attention_matches_full(cp):
    mesh = _mesh(cp)
    b, s, n, d = 1, 8 * cp, 4, 16
    q = jax.random.normal(jax.random.PRNGKey(0), (b, s, n, d))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, s, n, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, s, n, d))

    fn = shard_map(
        functools.partial(ring_attention, axis_name="cp"),
        mesh=mesh,
        in_specs=(P(None, "cp"), P(None, "cp"), P(None, "cp")),
        out_specs=P(None, "cp"),
    )
    got = fn(q, k, v)
    want = attention_ref(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_lse_combine_cross_attention_matches_full():
    cp = 4
    mesh = _mesh(cp)
    b, sq, sk, n, d = 1, 6, 8 * cp, 2, 16
    q = jax.random.normal(jax.random.PRNGKey(3), (b, sq, n, d))
    k = jax.random.normal(jax.random.PRNGKey(4), (b, sk, n, d))
    v = jax.random.normal(jax.random.PRNGKey(5), (b, sk, n, d))

    fn = shard_map(
        functools.partial(lse_combine_cross_attention, axis_name="cp"),
        mesh=mesh,
        in_specs=(P(), P(None, "cp"), P(None, "cp")),
        out_specs=P(),
    )
    got = fn(q, k, v)
    want = attention_ref(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("cp", [2, 4])
def test_ulysses_attention_matches_full(cp):
    mesh = _mesh(cp)
    b, s, n, d = 1, 4 * cp, 4, 16
    q = jax.random.normal(jax.random.PRNGKey(6), (b, s, n, d))
    k = jax.random.normal(jax.random.PRNGKey(7), (b, s, n, d))
    v = jax.random.normal(jax.random.PRNGKey(8), (b, s, n, d))

    fn = shard_map(
        functools.partial(ulysses_attention, axis_name="cp"),
        mesh=mesh,
        in_specs=(P(None, "cp"), P(None, "cp"), P(None, "cp")),
        out_specs=P(None, "cp"),
    )
    got = fn(q, k, v)
    want = attention_ref(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_ring_attention_pallas_inner():
    """head_dim 128 engages the Pallas flash inner (interpret mode on CPU)
    inside the shard_map ring — values AND grads must match full attention."""
    cp = 2
    mesh = _mesh(cp)
    b, s, n, d = 1, 128 * cp, 2, 128
    q = jax.random.normal(jax.random.PRNGKey(20), (b, s, n, d))
    k = jax.random.normal(jax.random.PRNGKey(21), (b, s, n, d))
    v = jax.random.normal(jax.random.PRNGKey(22), (b, s, n, d))
    w = jax.random.normal(jax.random.PRNGKey(23), (b, s, n, d))

    ring = shard_map(
        functools.partial(ring_attention, axis_name="cp", inner=_inner_pallas),
        mesh=mesh,
        in_specs=(P(None, "cp"), P(None, "cp"), P(None, "cp")),
        out_specs=P(None, "cp"),
        check_rep=False,   # Pallas HLO interpreter limitation off-TPU
    )
    got = ring(q, k, v)
    want = attention_ref(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)

    g1 = jax.grad(lambda q, k, v: jnp.sum(ring(q, k, v) * w), argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda q, k, v: jnp.sum(attention_ref(q, k, v) * w), argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=5e-4, atol=5e-4)


def test_lse_combine_pallas_inner():
    cp = 2
    mesh = _mesh(cp)
    b, sq, sk, n, d = 1, 256, 128 * cp, 1, 128
    q = jax.random.normal(jax.random.PRNGKey(24), (b, sq, n, d))
    k = jax.random.normal(jax.random.PRNGKey(25), (b, sk, n, d))
    v = jax.random.normal(jax.random.PRNGKey(26), (b, sk, n, d))
    fn = shard_map(
        functools.partial(lse_combine_cross_attention, axis_name="cp",
                          inner=_inner_pallas),
        mesh=mesh,
        in_specs=(P(), P(None, "cp"), P(None, "cp")),
        out_specs=P(),
        check_rep=False,   # Pallas HLO interpreter limitation off-TPU
    )
    got = fn(q, k, v)
    want = attention_ref(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_ring_attention_grads_match():
    cp = 2
    mesh = _mesh(cp)
    b, s, n, d = 1, 8 * cp, 2, 8
    q = jax.random.normal(jax.random.PRNGKey(9), (b, s, n, d))
    k = jax.random.normal(jax.random.PRNGKey(10), (b, s, n, d))
    v = jax.random.normal(jax.random.PRNGKey(11), (b, s, n, d))
    w = jax.random.normal(jax.random.PRNGKey(12), (b, s, n, d))

    ring = shard_map(
        functools.partial(ring_attention, axis_name="cp"),
        mesh=mesh,
        in_specs=(P(None, "cp"), P(None, "cp"), P(None, "cp")),
        out_specs=P(None, "cp"),
    )
    g1 = jax.grad(lambda q, k, v: jnp.sum(ring(q, k, v) * w), argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda q, k, v: jnp.sum(attention_ref(q, k, v) * w), argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=5e-5, atol=5e-5)
