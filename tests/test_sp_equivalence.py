"""cp=1 vs cp=N equivalence of the sequence-parallel dual-tower forward
(SURVEY.md §4 implication (d)) on the CPU virtual-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dualforce_tpu.config import tiny_test_config
from dualforce_tpu.models import audio_dit, video_dit
from dualforce_tpu.models.dual_tower import forward_dual_tower
from dualforce_tpu.models.factory import init_pipeline_params
from dualforce_tpu.ops.rope import (
    build_aligned_cross_rope,
    build_audio_freqs,
    build_video_freqs,
)
from dualforce_tpu.parallel.mesh import create_mesh
from dualforce_tpu.parallel.sp import sp_forward_blocks


def _setup(apply_cross_rope=True, grid=(4, 2, 2), la=8, pooled_adaln=False):
    cfg = tiny_test_config(visual_layers=3, audio_layers=2,
                           apply_cross_rope=apply_cross_rope)
    if pooled_adaln:
        import dataclasses
        cfg = dataclasses.replace(
            cfg, bridge=dataclasses.replace(cfg.bridge, pooled_adaln=True))
    params = init_pipeline_params(jax.random.PRNGKey(0), cfg, with_vaes=False,
                                  with_text=False, two_video_towers=False)
    vcfg, acfg, bcfg = cfg.video_dit, cfg.audio_dit, cfg.bridge
    rng = jax.random.PRNGKey(7)
    ks = jax.random.split(rng, 6)
    b = 1
    lv = grid[0] * grid[1] * grid[2]
    vx = jax.random.normal(ks[0], (b, lv, vcfg.dim))
    ax = jax.random.normal(ks[1], (b, la, acfg.dim))
    vctx = jax.random.normal(ks[2], (b, 12, vcfg.dim))
    actx = jax.random.normal(ks[3], (b, 12, acfg.dim))
    vtm = jax.random.normal(ks[4], (b, 6, vcfg.dim)) * 0.1
    atm = jax.random.normal(ks[5], (b, 6, acfg.dim)) * 0.1

    v_rope = tuple(jnp.asarray(r) for r in
                   build_video_freqs(video_dit.rope_tables(vcfg), grid))
    a_rope = tuple(jnp.asarray(r) for r in
                   build_audio_freqs(audio_dit.rope_tables(acfg), la))
    cross = None
    if apply_cross_rope:
        (cv, sv), (ca, sa) = build_aligned_cross_rope(
            video_fps=24.0, grid=grid, audio_steps=la, audio_fps=bcfg.audio_fps,
            head_dim=bcfg.head_dim)
        cross = ((jnp.asarray(cv), jnp.asarray(sv)),
                 (jnp.asarray(ca), jnp.asarray(sa)))
    return (cfg, params, vcfg, acfg, bcfg, vx, ax, vctx, actx, vtm, atm,
            v_rope, a_rope, cross)


@pytest.mark.parametrize("cp", [2, 4])
@pytest.mark.parametrize("apply_cross_rope", [True, False])
def test_sp_matches_single_device(cp, apply_cross_rope):
    (cfg, params, vcfg, acfg, bcfg, vx, ax, vctx, actx, vtm, atm,
     v_rope, a_rope, cross) = _setup(apply_cross_rope)

    want_v, want_a = forward_dual_tower(
        params["video_dit"]["blocks"], params["audio_dit"]["blocks"],
        params["bridge"], vcfg, acfg, bcfg,
        vx, ax, vctx, actx, vtm, atm, v_rope, a_rope, cross_rope=cross,
        attn_impl="ref")

    mesh = create_mesh(1, 1, cp)
    got_v, got_a = sp_forward_blocks(
        mesh, params["video_dit"]["blocks"], params["audio_dit"]["blocks"],
        params["bridge"], vcfg, acfg, bcfg,
        vx, ax, vctx, actx, vtm, atm, v_rope, a_rope, cross_rope=cross,
        attn_impl="ref")

    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(got_a), np.asarray(want_a),
                               rtol=3e-5, atol=3e-5)


@pytest.mark.parametrize("cp,grid,la", [
    (4, (3, 2, 2), 7),   # 12 % 4 = 0 video, audio pad 1
    (8, (3, 2, 2), 7),   # video pad 4 (one rank FULLY padded), audio pad 1
                         # (rank 7's audio chunk fully padded)
])
def test_sp_exact_with_padding(cp, grid, la):
    """cp>1 must equal cp=1 EXACTLY when token counts don't divide cp — the
    pad tails are masked out of every softmax (VERDICT r1 item 3; the real
    geometry has 403 audio tokens, 403 % cp != 0 for all cp > 1)."""
    (cfg, params, vcfg, acfg, bcfg, vx, ax, vctx, actx, vtm, atm,
     v_rope, a_rope, cross) = _setup(True, grid=grid, la=la)

    want_v, want_a = forward_dual_tower(
        params["video_dit"]["blocks"], params["audio_dit"]["blocks"],
        params["bridge"], vcfg, acfg, bcfg,
        vx, ax, vctx, actx, vtm, atm, v_rope, a_rope, cross_rope=cross,
        attn_impl="ref")

    mesh = create_mesh(1, 1, cp)
    got_v, got_a = sp_forward_blocks(
        mesh, params["video_dit"]["blocks"], params["audio_dit"]["blocks"],
        params["bridge"], vcfg, acfg, bcfg,
        vx, ax, vctx, actx, vtm, atm, v_rope, a_rope, cross_rope=cross,
        attn_impl="ref")

    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(got_a), np.asarray(want_a),
                               rtol=3e-5, atol=3e-5)


@pytest.mark.parametrize("cp,grid,la", [
    (4, (3, 2, 2), 7),   # frames straddle shard boundaries; audio pad 1
    (8, (3, 2, 2), 7),   # video pad 4 (one rank fully padded)
])
def test_sp_pooled_adaln_matches_single_device(cp, grid, la):
    """pooled-AdaLN bridge conditioning under SP: per-frame probe pooling of
    the cp-sharded video side must equal the single-device pooling exactly,
    including frames that straddle shards and fully-padded ranks."""
    (cfg, params, vcfg, acfg, bcfg, vx, ax, vctx, actx, vtm, atm,
     v_rope, a_rope, cross) = _setup(True, grid=grid, la=la, pooled_adaln=True)
    assert "pool" in params["bridge"]["v2a"]   # pooled params actually present

    want_v, want_a = forward_dual_tower(
        params["video_dit"]["blocks"], params["audio_dit"]["blocks"],
        params["bridge"], vcfg, acfg, bcfg,
        vx, ax, vctx, actx, vtm, atm, v_rope, a_rope, cross_rope=cross,
        attn_impl="ref", video_grid=grid)

    mesh = create_mesh(1, 1, cp)
    got_v, got_a = sp_forward_blocks(
        mesh, params["video_dit"]["blocks"], params["audio_dit"]["blocks"],
        params["bridge"], vcfg, acfg, bcfg,
        vx, ax, vctx, actx, vtm, atm, v_rope, a_rope, cross_rope=cross,
        attn_impl="ref", video_grid=grid)

    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(got_a), np.asarray(want_a),
                               rtol=3e-5, atol=3e-5)


def test_sp_pooled_adaln_grads_match():
    """Grads flow through the segment-op pooling + psum combine identically
    to the single-device pooled path."""
    (cfg, params, vcfg, acfg, bcfg, vx, ax, vctx, actx, vtm, atm,
     v_rope, a_rope, cross) = _setup(True, grid=(3, 2, 2), la=7,
                                     pooled_adaln=True)
    bp = params["bridge"]
    mesh = create_mesh(1, 1, 4)

    def loss_single(bp, vx, ax):
        ov, oa = forward_dual_tower(
            params["video_dit"]["blocks"], params["audio_dit"]["blocks"], bp,
            vcfg, acfg, bcfg, vx, ax, vctx, actx, vtm, atm, v_rope, a_rope,
            cross_rope=cross, attn_impl="ref", video_grid=(3, 2, 2))
        return jnp.sum(ov ** 2) + jnp.sum(oa ** 2)

    def loss_sp(bp, vx, ax):
        ov, oa = sp_forward_blocks(
            mesh, params["video_dit"]["blocks"], params["audio_dit"]["blocks"],
            bp, vcfg, acfg, bcfg, vx, ax, vctx, actx, vtm, atm,
            v_rope, a_rope, cross_rope=cross, attn_impl="ref",
            video_grid=(3, 2, 2))
        return jnp.sum(ov ** 2) + jnp.sum(oa ** 2)

    g1 = jax.grad(loss_single, argnums=(0, 1, 2))(bp, vx, ax)
    g2 = jax.grad(loss_sp, argnums=(0, 1, 2))(bp, vx, ax)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-4)


def test_sp_grads_match_with_padding():
    """jax.grad through the padded sequence-parallel stack equals the
    single-device grads (training cp correctness)."""
    (cfg, params, vcfg, acfg, bcfg, vx, ax, vctx, actx, vtm, atm,
     v_rope, a_rope, cross) = _setup(True, grid=(3, 2, 2), la=7)
    bp = params["bridge"]

    def loss_single(bp, vx, ax):
        ov, oa = forward_dual_tower(
            params["video_dit"]["blocks"], params["audio_dit"]["blocks"], bp,
            vcfg, acfg, bcfg, vx, ax, vctx, actx, vtm, atm, v_rope, a_rope,
            cross_rope=cross, attn_impl="ref")
        return jnp.sum(ov ** 2) + jnp.sum(oa ** 2)

    mesh = create_mesh(1, 1, 4)

    def loss_sp(bp, vx, ax):
        ov, oa = sp_forward_blocks(
            mesh, params["video_dit"]["blocks"], params["audio_dit"]["blocks"],
            bp, vcfg, acfg, bcfg, vx, ax, vctx, actx, vtm, atm,
            v_rope, a_rope, cross_rope=cross, attn_impl="ref")
        return jnp.sum(ov ** 2) + jnp.sum(oa ** 2)

    g1 = jax.grad(loss_single, argnums=(0, 1, 2))(bp, vx, ax)
    g2 = jax.grad(loss_sp, argnums=(0, 1, 2))(bp, vx, ax)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-4)


def test_sp_hlo_ring_not_allgather():
    """The compiled SP program must move K/V via collective-permute (ring) —
    NOT by all-gathering the full video sequence into each shard's attention
    (the round-1 GSPMD-hints failure mode, VERDICT r1 item 2b)."""
    (cfg, params, vcfg, acfg, bcfg, vx, ax, vctx, actx, vtm, atm,
     v_rope, a_rope, cross) = _setup(True, grid=(16, 2, 2), la=8)
    lv = vx.shape[1]  # 64
    mesh = create_mesh(1, 1, 4)

    def run(vx, ax):
        return sp_forward_blocks(
            mesh, params["video_dit"]["blocks"], params["audio_dit"]["blocks"],
            params["bridge"], vcfg, acfg, bcfg,
            vx, ax, vctx, actx, vtm, atm, v_rope, a_rope, cross_rope=cross,
            attn_impl="ref")

    hlo = jax.jit(run).lower(vx, ax).compile().as_text()
    assert "collective-permute" in hlo, "ring attention did not lower to collective-permute"
    # the only permitted full-sequence all-gathers are of the TINY audio side;
    # no all-gather result may carry the full video token count (the video
    # K/V stay sharded and rotate through the ring)
    import re

    for line in hlo.splitlines():
        if "all-gather" in line and "= " in line:
            shapes = re.findall(r"\[([0-9,]+)\]", line.split("=")[0])
            for sh in shapes:
                dims = [int(x) for x in sh.split(",") if x]
                assert lv not in dims, f"full video sequence all-gather: {line.strip()}"


def test_sp_grads_match_with_fsdp_sharded_params():
    """Grad correctness of the explicit ZeRO-3 path: params fsdp-sharded,
    per-layer all-gather inside the scan, check_vma off — grads must still
    equal the single-device reference (justifies the check_vma=False in
    parallel/sp.py)."""
    from dualforce_tpu.parallel.sharding import shard_params

    (cfg, params, vcfg, acfg, bcfg, vx, ax, vctx, actx, vtm, atm,
     v_rope, a_rope, cross) = _setup(True, grid=(3, 2, 2), la=7)

    def loss_single(bp, vb, ab, vx, ax):
        ov, oa = forward_dual_tower(
            vb, ab, bp, vcfg, acfg, bcfg, vx, ax, vctx, actx, vtm, atm,
            v_rope, a_rope, cross_rope=cross, attn_impl="ref")
        return jnp.sum(ov ** 2) + jnp.sum(oa ** 2)

    mesh = create_mesh(1, 2, 4)
    sharded = shard_params({"v": params["video_dit"]["blocks"],
                            "a": params["audio_dit"]["blocks"],
                            "b": params["bridge"]}, mesh)

    def loss_sp(bp, vb, ab, vx, ax):
        ov, oa = sp_forward_blocks(
            mesh, vb, ab, bp, vcfg, acfg, bcfg, vx, ax, vctx, actx, vtm, atm,
            v_rope, a_rope, cross_rope=cross, attn_impl="ref")
        return jnp.sum(ov ** 2) + jnp.sum(oa ** 2)

    args_single = (params["bridge"], params["video_dit"]["blocks"],
                   params["audio_dit"]["blocks"], vx, ax)
    args_sp = (sharded["b"], sharded["v"], sharded["a"], vx, ax)
    g1 = jax.grad(loss_single, argnums=(0, 1, 2))(*args_single)
    with mesh:
        g2 = jax.jit(jax.grad(loss_sp, argnums=(0, 1, 2)))(*args_sp)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-4)
