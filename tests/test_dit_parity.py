"""Numerical parity of the JAX towers/bridge vs the reference torch modules
(CPU, fp32, tiny configs, converted weights)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from dualforce_tpu.config import tiny_test_config
from dualforce_tpu.convert import convert_audio_dit, convert_bridge, convert_video_dit
from dualforce_tpu.diffusion.step import dual_tower_step
from dualforce_tpu.models import audio_dit, video_dit

from _torch_ref import load

ref_vdit = load("mova.diffusion.models.wan_video_dit")
ref_adit = load("mova.diffusion.models.wan_audio_dit")
ref_bridge = load("mova.diffusion.models.interactionv2")

CFG = tiny_test_config()


def _torch_video_model(vcfg, seed=0):
    torch.manual_seed(seed)
    return ref_vdit.WanModel(
        dim=vcfg.dim, in_dim=vcfg.in_dim, ffn_dim=vcfg.ffn_dim, out_dim=vcfg.out_dim,
        text_dim=vcfg.text_dim, freq_dim=vcfg.freq_dim, eps=vcfg.eps,
        patch_size=tuple(vcfg.patch_size), num_heads=vcfg.num_heads,
        num_layers=vcfg.num_layers, has_image_input=False,
    ).eval()


def _torch_audio_model(acfg, seed=1):
    torch.manual_seed(seed)
    return ref_adit.WanAudioModel(
        dim=acfg.dim, in_dim=acfg.in_dim, ffn_dim=acfg.ffn_dim, out_dim=acfg.out_dim,
        text_dim=acfg.text_dim, freq_dim=acfg.freq_dim, eps=acfg.eps,
        patch_size=[acfg.patch_size], num_heads=acfg.num_heads,
        num_layers=acfg.num_layers, has_image_input=False, vae_type=acfg.vae_type,
    ).eval()


def _torch_bridge(bcfg, seed=2):
    torch.manual_seed(seed)
    return ref_bridge.DualTowerConditionalBridge(
        visual_layers=bcfg.visual_layers, audio_layers=bcfg.audio_layers,
        visual_hidden_dim=bcfg.visual_hidden_dim, audio_hidden_dim=bcfg.audio_hidden_dim,
        audio_fps=bcfg.audio_fps, head_dim=bcfg.head_dim,
        interaction_strategy=bcfg.interaction_strategy,
        apply_cross_rope=bcfg.apply_cross_rope,
        trainable_condition_scale=bcfg.trainable_condition_scale,
    ).eval()


def test_video_dit_forward_parity():
    vcfg = CFG.video_dit
    tm = _torch_video_model(vcfg)
    params = convert_video_dit(tm.state_dict(), vcfg)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, vcfg.in_dim, 3, 4, 4), dtype=np.float32)
    ctx = rng.standard_normal((1, 16, vcfg.text_dim), dtype=np.float32)
    t = np.array([512.0], np.float32)

    with torch.no_grad():
        want = tm(torch.tensor(x), torch.tensor(t), torch.tensor(ctx)).numpy()
    got = video_dit.forward(params, vcfg, jnp.asarray(x), jnp.asarray(t),
                            jnp.asarray(ctx), attn_impl="ref",
                            compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-4)


def test_audio_dit_forward_parity():
    acfg = CFG.audio_dit
    tm = _torch_audio_model(acfg)
    params = convert_audio_dit(tm.state_dict(), acfg)

    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, acfg.in_dim, 24), dtype=np.float32)
    ctx = rng.standard_normal((1, 16, acfg.text_dim), dtype=np.float32)
    t = np.array([137.0], np.float32)

    with torch.no_grad():
        want = tm(torch.tensor(x), torch.tensor(t), torch.tensor(ctx)).numpy()
    got = audio_dit.forward(params, acfg, jnp.asarray(x), jnp.asarray(t),
                            jnp.asarray(ctx), attn_impl="ref",
                            compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-4)


def _torch_dual_tower_step(tv, ta, tb, visual_latents, audio_latents, ctx, t, at,
                           video_fps=24.0):
    """Torch oracle mirroring inference_single_step + forward_dual_tower_dit
    (pipeline_mova.py:500-711), using the reference modules."""
    visual_t = tv.time_embedding(ref_vdit.sinusoidal_embedding_1d(tv.freq_dim, t))
    visual_t_mod = tv.time_projection(visual_t).unflatten(1, (6, tv.dim))
    audio_t = ta.time_embedding(ref_adit.sinusoidal_embedding_1d(ta.freq_dim, at))
    audio_t_mod = ta.time_projection(audio_t).unflatten(1, (6, ta.dim))
    visual_ctx = tv.text_embedding(ctx)
    audio_ctx = ta.text_embedding(ctx)

    vx, (f, h, w) = tv.patchify(visual_latents)
    grid = (f, h, w)
    visual_freqs = torch.cat([
        tv.freqs[0][:f].view(f, 1, 1, -1).expand(f, h, w, -1),
        tv.freqs[1][:h].view(1, h, 1, -1).expand(f, h, w, -1),
        tv.freqs[2][:w].view(1, 1, w, -1).expand(f, h, w, -1),
    ], dim=-1).reshape(f * h * w, 1, -1)
    ax, (fa,) = ta.patchify(audio_latents, None)
    audio_freqs = torch.cat([
        ta.freqs[0][:fa].view(fa, -1), ta.freqs[1][:fa].view(fa, -1),
        ta.freqs[2][:fa].view(fa, -1),
    ], dim=-1).reshape(fa, 1, -1)

    if tb.apply_cross_rope:
        v_rope, a_rope = tb.build_aligned_freqs(
            video_fps=video_fps, grid_size=grid, audio_steps=ax.shape[1],
            device=vx.device, dtype=vx.dtype)
    else:
        v_rope = a_rope = None

    min_layers = min(len(tv.blocks), len(ta.blocks))
    for i in range(min_layers):
        if tb.should_interact(i, "a2v"):
            vx, ax = tb(i, vx, ax, x_freqs=v_rope, y_freqs=a_rope,
                        condition_scale=1.0, video_grid_size=grid)
        vx = tv.blocks[i](vx, visual_ctx, visual_t_mod, visual_freqs)
        ax = ta.blocks[i](ax, audio_ctx, audio_t_mod, audio_freqs)
    for i in range(min_layers, len(tv.blocks)):
        vx = tv.blocks[i](vx, visual_ctx, visual_t_mod, visual_freqs)

    v_out = tv.unpatchify(tv.head(vx, visual_t), grid)
    a_out = ta.unpatchify(ta.head(ax, audio_t), (fa,))
    return v_out, a_out


@pytest.mark.parametrize("strategy", ["full", "distributed", "shallow_focus"])
def test_dual_tower_step_parity(strategy):
    cfg = tiny_test_config(visual_layers=3, audio_layers=2,
                           interaction_strategy=strategy)
    vcfg, acfg, bcfg = cfg.video_dit, cfg.audio_dit, cfg.bridge
    tv = _torch_video_model(vcfg)
    ta = _torch_audio_model(acfg)
    tb = _torch_bridge(bcfg)

    vp = convert_video_dit(tv.state_dict(), vcfg)
    ap = convert_audio_dit(ta.state_dict(), acfg)
    bp = convert_bridge(tb.state_dict(), bcfg)

    rng = np.random.default_rng(7)
    vis = rng.standard_normal((1, vcfg.in_dim, 3, 4, 4), dtype=np.float32)
    aud = rng.standard_normal((1, acfg.in_dim, 25), dtype=np.float32)
    ctx = rng.standard_normal((1, 16, vcfg.text_dim), dtype=np.float32)
    t = np.array([905.0], np.float32)
    at = np.array([873.0], np.float32)

    with torch.no_grad():
        want_v, want_a = _torch_dual_tower_step(
            tv, ta, tb, torch.tensor(vis), torch.tensor(aud), torch.tensor(ctx),
            torch.tensor(t), torch.tensor(at))

    got_v, got_a = dual_tower_step(
        vp, ap, bp, vcfg, acfg, bcfg,
        jnp.asarray(vis), jnp.asarray(aud), jnp.asarray(ctx),
        jnp.asarray(t), jnp.asarray(at),
        compute_dtype=jnp.float32, attn_impl="ref")

    np.testing.assert_allclose(np.asarray(got_v), want_v.numpy(), rtol=2e-3, atol=3e-4)
    np.testing.assert_allclose(np.asarray(got_a), want_a.numpy(), rtol=2e-3, atol=3e-4)


def test_dual_tower_step_parity_pooled_adaln():
    """pooled_adaln bridge variant (per-frame pooling + AdaLN on the v2a
    query side, interactionv2.py:75-350)."""
    import dataclasses

    cfg = tiny_test_config(visual_layers=2, audio_layers=2)
    bcfg = dataclasses.replace(cfg.bridge, pooled_adaln=True)
    vcfg, acfg = cfg.video_dit, cfg.audio_dit
    tv = _torch_video_model(vcfg)
    ta = _torch_audio_model(acfg)
    torch.manual_seed(3)
    tb = ref_bridge.DualTowerConditionalBridge(
        visual_layers=bcfg.visual_layers, audio_layers=bcfg.audio_layers,
        visual_hidden_dim=bcfg.visual_hidden_dim,
        audio_hidden_dim=bcfg.audio_hidden_dim, audio_fps=bcfg.audio_fps,
        head_dim=bcfg.head_dim, interaction_strategy=bcfg.interaction_strategy,
        apply_cross_rope=bcfg.apply_cross_rope, pooled_adaln=True,
    ).eval()

    vp = convert_video_dit(tv.state_dict(), vcfg)
    ap = convert_audio_dit(ta.state_dict(), acfg)
    bp = convert_bridge(tb.state_dict(), bcfg)
    assert "pool" in jax.tree_util.tree_map(lambda x: x, bp["v2a"])  # pooled params present

    rng = np.random.default_rng(11)
    vis = rng.standard_normal((1, vcfg.in_dim, 3, 4, 4), dtype=np.float32)
    aud = rng.standard_normal((1, acfg.in_dim, 13), dtype=np.float32)
    ctx = rng.standard_normal((1, 16, vcfg.text_dim), dtype=np.float32)
    t = np.array([400.0], np.float32)
    at = np.array([420.0], np.float32)

    with torch.no_grad():
        want_v, want_a = _torch_dual_tower_step(
            tv, ta, tb, torch.tensor(vis), torch.tensor(aud), torch.tensor(ctx),
            torch.tensor(t), torch.tensor(at))

    got_v, got_a = dual_tower_step(
        vp, ap, bp, vcfg, acfg, bcfg,
        jnp.asarray(vis), jnp.asarray(aud), jnp.asarray(ctx),
        jnp.asarray(t), jnp.asarray(at),
        compute_dtype=jnp.float32, attn_impl="ref")
    np.testing.assert_allclose(np.asarray(got_v), want_v.numpy(), rtol=2e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(got_a), want_a.numpy(), rtol=2e-3, atol=5e-4)


def test_trainable_condition_scale_is_used():
    """With trainable_condition_scale=True and NO external scale, the bridge
    residual must be scaled by the PARAM (regression: an external default of
    1.0 used to shadow it — interactionv2.py:526-535 semantics)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from dualforce_tpu.config import tiny_test_config
    from dualforce_tpu.diffusion.step import dual_tower_step, make_rope_pack
    from dualforce_tpu.models.factory import init_pipeline_params

    cfg = tiny_test_config(visual_layers=2, audio_layers=1)
    cfg = dataclasses.replace(
        cfg, bridge=dataclasses.replace(cfg.bridge,
                                        trainable_condition_scale=True))
    params = init_pipeline_params(jax.random.PRNGKey(0), cfg,
                                  with_vaes=False, with_text=False,
                                  two_video_towers=False)
    assert "condition_scale" in params["bridge"]
    F, H, W = 3, 2, 4
    La = 10
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    visual = jax.random.normal(ks[0], (1, cfg.video_dit.in_dim, F, 2 * H, 2 * W))
    audio = jax.random.normal(ks[1], (1, cfg.audio_dit.in_dim, La))
    ctx = jax.random.normal(ks[2], (1, 16, cfg.video_dit.text_dim))
    t = jnp.full((1,), 500.0)
    rope = make_rope_pack(cfg.video_dit, cfg.audio_dit, cfg.bridge,
                          (F, H, W), La, 24.0)

    def run(params, external=None):
        return dual_tower_step(
            params["video_dit"], params["audio_dit"], params["bridge"],
            cfg.video_dit, cfg.audio_dit, cfg.bridge, visual, audio, ctx,
            t, t, video_fps=24.0, compute_dtype=jnp.float32,
            attn_impl="ref", rope_pack=rope, condition_scale=external)

    # param scale 0 with no external arg == external 0 (bridge off)
    p0 = jax.tree.map(lambda x: x, params)
    p0["bridge"] = {**params["bridge"],
                    "condition_scale": jnp.zeros((1,), jnp.float32)}
    v_param0, a_param0 = run(p0)
    v_ext0, a_ext0 = run(params, external=0.0)
    assert jnp.allclose(v_param0, v_ext0) and jnp.allclose(a_param0, a_ext0)

    # ...and differs from the param-scale-1 output (the param is LIVE)
    v1, _ = run(params)  # param scale = 1.0 (init)
    assert not jnp.allclose(v_param0, v1)

    # explicit external scale still wins over the param
    v_ext1, _ = run(p0, external=1.0)
    assert jnp.allclose(v_ext1, v1)
