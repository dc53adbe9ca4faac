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


def _setup(apply_cross_rope=True):
    cfg = tiny_test_config(visual_layers=3, audio_layers=2,
                           apply_cross_rope=apply_cross_rope)
    params = init_pipeline_params(jax.random.PRNGKey(0), cfg, with_vaes=False,
                                  with_text=False, two_video_towers=False)
    vcfg, acfg, bcfg = cfg.video_dit, cfg.audio_dit, cfg.bridge
    grid = (4, 2, 2)  # 16 video tokens -> divides cp=2,4
    la = 8            # 8 audio tokens
    rng = jax.random.PRNGKey(7)
    ks = jax.random.split(rng, 6)
    b = 1
    vx = jax.random.normal(ks[0], (b, 16, vcfg.dim))
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
