"""Audio (DAC) parity vs the reference torch model, and Wan video VAE
structural/causality tests (no diffusers oracle available in this image)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from dualforce_tpu.config import DACVAEConfig, WanVAEConfig
from dualforce_tpu.convert.torch_import import convert_dac
from dualforce_tpu.models import dac_vae, wan_vae

from _torch_ref import load

ref_dac = load("mova.diffusion.models.dac_vae")

TINY_DAC = DACVAEConfig(encoder_dim=8, encoder_rates=(2, 3, 4), decoder_dim=64,
                        decoder_rates=(4, 3, 2), latent_dim=8, sample_rate=48000)


def _torch_dac(cfg, seed=0):
    torch.manual_seed(seed)
    return ref_dac.DAC(
        encoder_dim=cfg.encoder_dim, encoder_rates=list(cfg.encoder_rates),
        latent_dim=cfg.latent_dim, decoder_dim=cfg.decoder_dim,
        decoder_rates=list(cfg.decoder_rates), sample_rate=cfg.sample_rate,
        continuous=True,
    ).eval()


def test_dac_encode_decode_parity():
    cfg = TINY_DAC
    tm = _torch_dac(cfg)
    params = convert_dac(tm.state_dict(), cfg)

    rng = np.random.default_rng(0)
    hop = cfg.hop_length
    audio = rng.standard_normal((1, 1, hop * 5), dtype=np.float32) * 0.3

    with torch.no_grad():
        z_dist, *_ = tm.encode(torch.tensor(audio))
        want_mean = z_dist.mean.numpy()
        want_wav = tm.decode(torch.tensor(want_mean)).numpy()

    got_mean = dac_vae.encode_mode(params, cfg, jnp.asarray(audio))
    np.testing.assert_allclose(np.asarray(got_mean), want_mean, rtol=1e-4, atol=1e-5)

    got_wav = dac_vae.decode(params, cfg, jnp.asarray(want_mean))
    np.testing.assert_allclose(np.asarray(got_wav), want_wav, rtol=1e-4, atol=1e-5)


def test_dac_padded_length():
    cfg = TINY_DAC
    tm = _torch_dac(cfg)
    params = convert_dac(tm.state_dict(), cfg)
    hop = cfg.hop_length
    audio = np.random.default_rng(1).standard_normal((1, 1, hop * 3 + 7), dtype=np.float32)
    with torch.no_grad():
        z_dist, *_ = tm.encode(tm.preprocess(torch.tensor(audio), cfg.sample_rate))
        want = z_dist.mean.numpy()
    got = dac_vae.encode_mode(params, cfg, jnp.asarray(audio))
    assert got.shape == want.shape == (1, cfg.latent_dim, 4)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_dac_chunked_compress_decompress_match_full():
    """Chunked streaming (CodecMixin equivalent) == full pass on interior
    and edges (window padding reproduces the full-pass boundary context)."""
    cfg = TINY_DAC
    key = jax.random.PRNGKey(0)
    params = dac_vae.init(key, cfg)
    hop = cfg.hop_length
    audio = jnp.asarray(
        np.random.default_rng(2).standard_normal((1, 1, hop * 119 + 11), dtype=np.float32) * 0.3)

    # receptive fields must make chunking kick in at this length
    assert 16 + 2 * dac_vae.encoder_receptive_frames(cfg) < 120
    assert 16 + 2 * dac_vae.decoder_receptive_frames(cfg) < 120

    full = dac_vae.encode_mode(params, cfg, audio)
    chunked = dac_vae.compress(params, cfg, audio, chunk_frames=16)
    assert chunked.shape == full.shape
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full),
                               rtol=1e-4, atol=1e-5)

    wav_full = dac_vae.decode(params, cfg, full)
    wav_chunked = dac_vae.decompress(params, cfg, full, chunk_frames=16)
    assert wav_chunked.shape == wav_full.shape
    np.testing.assert_allclose(np.asarray(wav_chunked), np.asarray(wav_full),
                               rtol=1e-4, atol=1e-5)


# --- Wan video VAE (no oracle; structural + causality invariants) -----------

TINY_WAN = WanVAEConfig(base_dim=8, z_dim=4, dim_mult=(1, 2, 2), num_res_blocks=1,
                        temperal_downsample=(False, True),
                        latents_mean=tuple([0.0] * 4), latents_std=tuple([1.0] * 4))


def test_wan_vae_shapes_roundtrip():
    cfg = TINY_WAN
    key = jax.random.PRNGKey(0)
    params = wan_vae.init(key, cfg)
    T, H, W = 9, 16, 16  # (T-1) % 2 == 0 for one temporal down
    video = jax.random.normal(jax.random.PRNGKey(1), (1, T, H, W, 3))
    mean, logvar = wan_vae.encode_moments(params, cfg, video)
    # one temporal downsample (stride 2): F = (T-1)/2 + 1; spatial /4 (2 downs)
    assert mean.shape == (1, (T - 1) // 2 + 1, H // 4, W // 4, cfg.z_dim)
    out = wan_vae.decode(params, cfg, mean)
    assert out.shape == (1, T, H, W, 3)


def test_wan_vae_encoder_causality():
    """Latent frame t must not depend on input frames strictly after its
    receptive window (causal convs): perturbing the LAST input frames must
    not change the FIRST latent frame."""
    cfg = TINY_WAN
    params = wan_vae.init(jax.random.PRNGKey(0), cfg)
    v1 = jax.random.normal(jax.random.PRNGKey(2), (1, 9, 8, 8, 3))
    v2 = v1.at[:, 5:].set(jax.random.normal(jax.random.PRNGKey(3), (1, 4, 8, 8, 3)))
    m1, _ = wan_vae.encode_moments(params, cfg, v1)
    m2, _ = wan_vae.encode_moments(params, cfg, v2)
    np.testing.assert_allclose(np.asarray(m1[:, 0]), np.asarray(m2[:, 0]),
                               rtol=1e-5, atol=1e-6)


def test_wan_vae_decoder_causality():
    cfg = TINY_WAN
    params = wan_vae.init(jax.random.PRNGKey(0), cfg)
    z1 = jax.random.normal(jax.random.PRNGKey(4), (1, 5, 4, 4, cfg.z_dim))
    z2 = z1.at[:, 3:].set(0.0)
    o1 = wan_vae.decode(params, cfg, z1)
    o2 = wan_vae.decode(params, cfg, z2)
    # first output frame depends only on first latent frame
    np.testing.assert_allclose(np.asarray(o1[:, 0]), np.asarray(o2[:, 0]),
                               rtol=1e-5, atol=1e-6)


def test_wan_vae_frame_count_193():
    """Shipped geometry: 193 frames <-> 49 latent frames (SURVEY.md §0.1)."""
    cfg = WanVAEConfig()
    T = 13  # (13-1)/4+1 = 4 latent frames with two temporal downs
    params = wan_vae.init(jax.random.PRNGKey(0),
                          WanVAEConfig(base_dim=8, z_dim=4, dim_mult=(1, 1, 2, 2),
                                       num_res_blocks=1,
                                       temperal_downsample=(False, True, True),
                                       latents_mean=tuple([0.0] * 4),
                                       latents_std=tuple([1.0] * 4)))
    cfg_t = WanVAEConfig(base_dim=8, z_dim=4, dim_mult=(1, 1, 2, 2), num_res_blocks=1,
                         temperal_downsample=(False, True, True),
                         latents_mean=tuple([0.0] * 4), latents_std=tuple([1.0] * 4))
    video = jax.random.normal(jax.random.PRNGKey(5), (1, T, 16, 16, 3))
    mean, _ = wan_vae.encode_moments(params, cfg_t, video)
    assert mean.shape[1] == (T - 1) // 4 + 1
    out = wan_vae.decode(params, cfg_t, mean)
    assert out.shape[1] == T


def test_wan_vae_streaming_decode_matches_full():
    """Chunked (cache-carried) decode must equal the full-sequence decode."""
    cfg = TINY_WAN
    params = wan_vae.init(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(6), (1, 5, 4, 4, cfg.z_dim))
    full = wan_vae.decode(params, cfg, z)
    stream = wan_vae.decode_streaming(params, cfg, z)
    assert stream.shape == full.shape
    np.testing.assert_allclose(np.asarray(stream), np.asarray(full),
                               rtol=1e-4, atol=1e-4)


def test_wan_vae_streaming_chunk_fallback():
    """(F-1) % chunk != 0 falls back to per-frame stepping; any chunk value
    that divides must match the full decode exactly."""
    cfg = TINY_WAN
    params = wan_vae.init(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(8), (1, 7, 4, 4, cfg.z_dim))
    full = wan_vae.decode(params, cfg, z)
    for chunk in (2, 3, 4, 6):   # 6 % {4} != 0 -> fallback; {2,3,6} divide
        stream = wan_vae.decode_streaming(params, cfg, z, chunk=chunk)
        np.testing.assert_allclose(np.asarray(stream), np.asarray(full),
                                   rtol=1e-4, atol=1e-4)


def test_wan_vae_streaming_single_frame():
    cfg = TINY_WAN
    params = wan_vae.init(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(7), (1, 1, 4, 4, cfg.z_dim))
    full = wan_vae.decode(params, cfg, z)
    stream = wan_vae.decode_streaming(params, cfg, z)
    np.testing.assert_allclose(np.asarray(stream), np.asarray(full),
                               rtol=1e-4, atol=1e-4)


def test_dac_rvq_parity():
    """RVQ (discrete) DAC mode vs the torch oracle: quantized z, codes,
    reconstruction from z and from codes (dac_vae.py:346-588,935-960)."""
    cfg = DACVAEConfig(encoder_dim=8, encoder_rates=(2, 3, 4), decoder_dim=64,
                       decoder_rates=(4, 3, 2), latent_dim=8, continuous=False,
                       n_codebooks=3, codebook_size=32, codebook_dim=4)
    torch.manual_seed(3)
    tm = ref_dac.DAC(
        encoder_dim=cfg.encoder_dim, encoder_rates=list(cfg.encoder_rates),
        latent_dim=cfg.latent_dim, decoder_dim=cfg.decoder_dim,
        decoder_rates=list(cfg.decoder_rates), sample_rate=cfg.sample_rate,
        continuous=False, n_codebooks=cfg.n_codebooks,
        codebook_size=cfg.codebook_size, codebook_dim=cfg.codebook_dim,
    ).eval()
    params = convert_dac(tm.state_dict(), cfg)
    assert "quantizer" in params and len(params["quantizer"]) == 3

    audio = np.random.default_rng(5).standard_normal(
        (2, 1, cfg.hop_length * 6), dtype=np.float32) * 0.3
    with torch.no_grad():
        want_z, want_codes, want_lat, *_ = tm.encode(torch.tensor(audio))
        want_wav = tm.decode(want_z).numpy()
        want_from_codes = tm.quantizer.from_codes(want_codes)[0].numpy()

    got_z, got_codes, got_lat, commit, codebook = dac_vae.encode_quantized(
        params, cfg, jnp.asarray(audio))
    np.testing.assert_array_equal(np.asarray(got_codes), want_codes.numpy())
    np.testing.assert_allclose(np.asarray(got_z), want_z.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_lat), want_lat.numpy(),
                               rtol=1e-4, atol=1e-5)
    assert np.isfinite(float(commit)) and np.isfinite(float(codebook))

    got_wav = dac_vae.decode(params, cfg, got_z)
    np.testing.assert_allclose(np.asarray(got_wav), want_wav,
                               rtol=1e-4, atol=1e-5)

    # discrete transport path: reconstruct from CODES alone
    zq_codes, _ = dac_vae.rvq_from_codes(params["quantizer"],
                                         jnp.asarray(want_codes.numpy()))
    np.testing.assert_allclose(np.asarray(zq_codes.transpose(0, 2, 1)),
                               want_from_codes, rtol=1e-4, atol=1e-5)

    # partial-stack encode (n_quantizers=2) matches the oracle
    with torch.no_grad():
        want_z2, want_codes2, *_ = tm.encode(torch.tensor(audio), n_quantizers=2)
    got_z2, got_codes2, *_ = dac_vae.encode_quantized(
        params, cfg, jnp.asarray(audio), n_quantizers=2)
    assert got_codes2.shape[1] == 2
    np.testing.assert_array_equal(np.asarray(got_codes2), want_codes2.numpy())
    np.testing.assert_allclose(np.asarray(got_z2), want_z2.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_dac_rvq_chunked_compress_decompress():
    """RVQ streaming: chunked compress -> codes identical to the full pass;
    chunked code decode matches the full decode (interior-exact windows)."""
    cfg = DACVAEConfig(encoder_dim=8, encoder_rates=(2, 3, 4), decoder_dim=64,
                       decoder_rates=(4, 3, 2), latent_dim=8, continuous=False,
                       n_codebooks=2, codebook_size=16, codebook_dim=4)
    params = dac_vae.init(jax.random.PRNGKey(2), cfg)
    hop = cfg.hop_length
    audio = jnp.asarray(np.random.default_rng(6).standard_normal(
        (1, 1, hop * 40), dtype=np.float32) * 0.3)

    full_codes = dac_vae.encode_quantized(params, cfg, audio)[1]
    chunked_codes = dac_vae.compress(params, cfg, audio, chunk_frames=8)
    assert chunked_codes.dtype == full_codes.dtype
    np.testing.assert_array_equal(np.asarray(chunked_codes),
                                  np.asarray(full_codes))

    full_wav = dac_vae.decode_codes(params, cfg, full_codes)
    chunk_wav = dac_vae.decompress(params, cfg, full_codes, chunk_frames=8)
    np.testing.assert_allclose(np.asarray(chunk_wav), np.asarray(full_wav),
                               rtol=1e-4, atol=1e-5)
