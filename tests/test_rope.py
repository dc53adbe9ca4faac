"""RoPE parity vs the reference's complex-multiply and rotate-half conventions."""

import numpy as np
import torch

from dualforce_tpu.ops import (
    apply_rope_half,
    apply_rope_interleaved,
    build_aligned_cross_rope,
    build_audio_freqs,
    build_video_freqs,
    precompute_freqs_1d,
    precompute_freqs_3d,
)

from _torch_ref import load

ref_vdit = load("mova.diffusion.models.wan_video_dit")
ref_adit = load("mova.diffusion.models.wan_audio_dit")
ref_bridge = load("mova.diffusion.models.interactionv2")


def _ref_video_freqs(head_dim, grid):
    f, h, w = grid
    fc = ref_vdit.precompute_freqs_cis_3d(head_dim)
    return torch.cat([
        fc[0][:f].view(f, 1, 1, -1).expand(f, h, w, -1),
        fc[1][:h].view(1, h, 1, -1).expand(f, h, w, -1),
        fc[2][:w].view(1, 1, w, -1).expand(f, h, w, -1),
    ], dim=-1).reshape(f * h * w, 1, -1)


def test_video_rope_matches_reference():
    head_dim, grid, n_heads = 128, (3, 4, 5), 2
    B, L = 1, 3 * 4 * 5
    x = np.random.default_rng(0).standard_normal((B, L, n_heads * head_dim)).astype(np.float32)

    freqs = _ref_video_freqs(head_dim, grid)
    want = ref_vdit.rope_apply_head_dim(torch.tensor(x), freqs, head_dim).numpy()

    tables = precompute_freqs_3d(head_dim, end=16)
    cos, sin = build_video_freqs(tables, grid)
    got = apply_rope_interleaved(
        np.asarray(x).reshape(B, L, n_heads, head_dim), cos, sin
    ).reshape(B, L, n_heads * head_dim)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_audio_rope_dac_matches_reference():
    head_dim, n_heads, L = 128, 2, 37
    x = np.random.default_rng(1).standard_normal((1, L, n_heads * head_dim)).astype(np.float32)

    fc = ref_adit.precompute_freqs_cis_1d(head_dim)
    freqs = torch.cat([
        fc[0][:L].view(L, -1), fc[1][:L].view(L, -1), fc[2][:L].view(L, -1)
    ], dim=-1).reshape(L, 1, -1)
    want = ref_vdit.rope_apply_head_dim(torch.tensor(x), freqs, head_dim).numpy()

    cos, sin = build_audio_freqs(precompute_freqs_1d(head_dim, end=64), L)
    got = apply_rope_interleaved(x.reshape(1, L, n_heads, head_dim), cos, sin)
    np.testing.assert_allclose(
        np.asarray(got).reshape(1, L, -1), want, rtol=2e-5, atol=2e-5
    )


def test_audio_rope_oobleck_matches_reference():
    head_dim, L = 128, 29
    x = np.random.default_rng(2).standard_normal((1, L, head_dim)).astype(np.float32)

    fc = ref_adit.legacy_precompute_freqs_cis_1d(head_dim, base_tps=4.0, target_tps=44100 / 2048)
    freqs = torch.cat([
        fc[0][:L].view(L, -1), fc[1][:L].view(L, -1), fc[2][:L].view(L, -1)
    ], dim=-1).reshape(L, 1, -1)
    want = ref_vdit.rope_apply_head_dim(torch.tensor(x), freqs, head_dim).numpy()

    cos, sin = build_audio_freqs(
        precompute_freqs_1d(head_dim, end=64, variant="oobleck"), L
    )
    got = apply_rope_interleaved(x.reshape(1, L, 1, head_dim), cos, sin)
    np.testing.assert_allclose(
        np.asarray(got).reshape(1, L, -1), want, rtol=2e-5, atol=2e-5
    )


def test_cross_rope_matches_reference_bridge():
    torch.manual_seed(0)
    head_dim = 64
    bridge = ref_bridge.DualTowerConditionalBridge(
        visual_layers=1, audio_layers=1, visual_hidden_dim=128, audio_hidden_dim=64,
        audio_fps=50.0, head_dim=head_dim, interaction_strategy="full",
        apply_cross_rope=True,
    )
    grid = (3, 2, 2)
    audio_steps = 11
    (cos_v_t, sin_v_t), (cos_a_t, sin_a_t) = bridge.build_aligned_freqs(
        video_fps=24.0, grid_size=grid, audio_steps=audio_steps,
        device=torch.device("cpu"), dtype=torch.float32,
    )
    (cos_v, sin_v), (cos_a, sin_a) = build_aligned_cross_rope(
        video_fps=24.0, grid=grid, audio_steps=audio_steps, audio_fps=50.0,
        head_dim=head_dim,
    )
    np.testing.assert_allclose(cos_v, cos_v_t.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(sin_v, sin_v_t.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(cos_a, cos_a_t.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(sin_a, sin_a_t.numpy(), rtol=1e-5, atol=1e-6)

    # rotate-half application parity
    L = grid[0] * grid[1] * grid[2]
    q = np.random.default_rng(3).standard_normal((1, L, 2, head_dim)).astype(np.float32)
    q_t = torch.tensor(q)
    want, _ = ref_bridge.apply_rotary_pos_emb(q_t, q_t, cos_v_t, sin_v_t, unsqueeze_dim=2)
    got = apply_rope_half(q, cos_v, sin_v)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-5, atol=1e-5)


def test_first_frame_bias_positions():
    (cos_v, _), _ = build_aligned_cross_rope(
        video_fps=24.0, grid=(4, 1, 1), audio_steps=5, audio_fps=50.0,
        head_dim=8, first_frame_bias=True,
    )
    # angles at dim 0 equal position (inv_freq[0] = 1)
    pos = np.arccos(np.clip(cos_v[0, :, 0], -1, 1))
    expect = (np.array([0.0, 1 / 24, 1 / 24 + 1 / 6, 1 / 24 + 2 / 6]) * 50.0) % (2 * np.pi)
    np.testing.assert_allclose(pos, np.minimum(expect, 2 * np.pi - expect), atol=1e-4)
