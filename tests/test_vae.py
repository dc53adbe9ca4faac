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


def test_wan_vae_torch_oracle_parity():
    """Converter oracle (VERDICT r2 missing #3): random-init torch Wan VAE
    (Wan-official state-dict naming, tests/_torch_wan_vae.py) -> state_dict ->
    _convert_wan_vae -> JAX model must match torch encode/decode numerically.
    Catches kernel-transpose/key-mapping bugs in the converter AND layout bugs
    in the JAX model through an independent channel-first torch path."""
    from dualforce_tpu.convert.load_checkpoint import _convert_wan_vae
    from _torch_wan_vae import WanVAEOracle

    cfg = WanVAEConfig(base_dim=8, z_dim=4, dim_mult=(1, 2, 2),
                       num_res_blocks=1, temperal_downsample=(False, True),
                       latents_mean=tuple([0.0] * 4),
                       latents_std=tuple([1.0] * 4))
    torch.manual_seed(0)
    tm = WanVAEOracle(cfg).eval()
    params = _convert_wan_vae(
        {k: v.numpy() for k, v in tm.state_dict().items()}, cfg)
    params = jax.tree.map(jnp.asarray, params)

    rng = np.random.default_rng(42)
    video = rng.uniform(-1, 1, (1, 3, 5, 16, 16)).astype(np.float32)  # NCTHW
    with torch.no_grad():
        want_mean, want_logvar = tm.encode_moments(torch.tensor(video))
        want_dec = tm.decode(want_mean).numpy()

    video_j = jnp.asarray(video.transpose(0, 2, 3, 4, 1))  # NTHWC
    got_mean, got_logvar = wan_vae.encode_moments(params, cfg, video_j)
    np.testing.assert_allclose(
        np.asarray(got_mean).transpose(0, 4, 1, 2, 3), want_mean.numpy(),
        rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(got_logvar).transpose(0, 4, 1, 2, 3), want_logvar.numpy(),
        rtol=1e-4, atol=1e-4)

    got_dec = wan_vae.decode(params, cfg, got_mean)
    np.testing.assert_allclose(
        np.asarray(got_dec).transpose(0, 4, 1, 2, 3), want_dec,
        rtol=1e-3, atol=1e-3)

    # streaming paths agree with the oracle too
    got_stream = wan_vae.encode_mode_streaming(params, cfg, video_j)
    np.testing.assert_allclose(
        np.asarray(got_stream).transpose(0, 4, 1, 2, 3), want_mean.numpy(),
        rtol=1e-4, atol=1e-4)


def test_wan_vae_torch_oracle_two_temporal_downs():
    """Shipped-architecture shape (dim_mult (1,1,2,2), two temporal downs,
    shortcut-free first stage) through the converter oracle."""
    from dualforce_tpu.convert.load_checkpoint import _convert_wan_vae
    from _torch_wan_vae import WanVAEOracle

    cfg = WanVAEConfig(base_dim=8, z_dim=4, dim_mult=(1, 1, 2, 2),
                       num_res_blocks=2,
                       temperal_downsample=(False, True, True),
                       latents_mean=tuple([0.0] * 4),
                       latents_std=tuple([1.0] * 4))
    torch.manual_seed(1)
    tm = WanVAEOracle(cfg).eval()
    params = jax.tree.map(jnp.asarray, _convert_wan_vae(
        {k: v.numpy() for k, v in tm.state_dict().items()}, cfg))

    rng = np.random.default_rng(7)
    video = rng.uniform(-1, 1, (1, 3, 9, 16, 16)).astype(np.float32)
    with torch.no_grad():
        want_mean, _ = tm.encode_moments(torch.tensor(video))
        want_dec = tm.decode(want_mean).numpy()
    video_j = jnp.asarray(video.transpose(0, 2, 3, 4, 1))
    got_mean = wan_vae.encode_mode(params, cfg, video_j)
    np.testing.assert_allclose(
        np.asarray(got_mean).transpose(0, 4, 1, 2, 3), want_mean.numpy(),
        rtol=1e-4, atol=1e-4)
    got_dec = wan_vae.decode_streaming(params, cfg, got_mean)
    np.testing.assert_allclose(
        np.asarray(got_dec).transpose(0, 4, 1, 2, 3), want_dec,
        rtol=1e-3, atol=1e-3)


def test_wan_vae_streaming_encode_matches_full():
    """Chunked (cache-carried) encode must equal the full-sequence encode
    (wan_vae.encode_moments_streaming; reference encodes with the same
    feature cache it decodes with)."""
    cfg = TINY_WAN
    params = wan_vae.init(jax.random.PRNGKey(0), cfg)
    T = 9  # one temporal downsample in TINY_WAN -> st=2, (T-1)%2==0
    video = jax.random.normal(jax.random.PRNGKey(9), (2, T, 16, 16, 3))
    fm, fl = wan_vae.encode_moments(params, cfg, video)
    sm, sl = wan_vae.encode_moments_streaming(params, cfg, video)
    assert sm.shape == fm.shape
    np.testing.assert_allclose(np.asarray(sm), np.asarray(fm),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(sl), np.asarray(fl),
                               rtol=1e-4, atol=1e-4)


def test_wan_vae_streaming_encode_bf16_compute():
    """compute_dtype=bf16 (the 720p-in-16GB mode) must equal a full-sequence
    encode run at the same precision: the recursion is dtype-agnostic, so the
    only delta vs f32 is the quantization itself."""
    cfg = TINY_WAN
    params = wan_vae.init(jax.random.PRNGKey(0), cfg)
    video = jax.random.normal(jax.random.PRNGKey(9), (2, 9, 16, 16, 3))
    # full-sequence reference at bf16: bf16 encoder, f32 quant head (same
    # construction as the streaming path)
    p16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params["encoder"])
    h = wan_vae.encoder_apply(p16, cfg, video.astype(jnp.bfloat16))
    moments = wan_vae.causal_conv3d(params["quant_conv"],
                                    h.astype(jnp.float32))
    fm, fl = jnp.split(moments, 2, axis=-1)
    sm, sl = wan_vae.encode_moments_streaming(
        params, cfg, video, compute_dtype=jnp.bfloat16)
    assert sm.dtype == fm.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(sm), np.asarray(fm),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(sl), np.asarray(fl),
                               rtol=2e-2, atol=2e-2)
    # and bf16 compute stays close to the f32 result (conditioning-grade)
    f32m, _ = wan_vae.encode_moments(params, cfg, video)
    np.testing.assert_allclose(np.asarray(sm), np.asarray(f32m),
                               rtol=0.15, atol=0.15)


def test_wan_vae_streaming_encode_two_temporal_downs():
    """Shipped-architecture shape (two temporal downsamples, st=4): every
    dividing chunk matches; non-dividing chunk falls back to st."""
    cfg = WanVAEConfig(base_dim=8, z_dim=4, dim_mult=(1, 1, 2, 2),
                       num_res_blocks=1,
                       temperal_downsample=(False, True, True),
                       latents_mean=tuple([0.0] * 4),
                       latents_std=tuple([1.0] * 4))
    params = wan_vae.init(jax.random.PRNGKey(1), cfg)
    T = 17  # (17-1)/4+1 = 5 latent frames
    video = jax.random.normal(jax.random.PRNGKey(10), (1, T, 16, 16, 3))
    full, _ = wan_vae.encode_moments(params, cfg, video)
    for chunk in (None, 4, 8, 16, 12, 6):  # 12,6 don't divide/align -> fallback
        stream, _ = wan_vae.encode_moments_streaming(params, cfg, video,
                                                     chunk=chunk)
        np.testing.assert_allclose(np.asarray(stream), np.asarray(full),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=f"chunk={chunk}")


def test_wan_vae_streaming_encode_single_frame():
    cfg = TINY_WAN
    params = wan_vae.init(jax.random.PRNGKey(0), cfg)
    video = jax.random.normal(jax.random.PRNGKey(11), (1, 1, 16, 16, 3))
    full = wan_vae.encode_mode(params, cfg, video)
    stream = wan_vae.encode_mode_streaming(params, cfg, video)
    np.testing.assert_allclose(np.asarray(stream), np.asarray(full),
                               rtol=1e-4, atol=1e-4)


def test_wan_vae_streaming_encode_sample_matches_full():
    """encode_sample vs streaming with the SAME key must agree (same moments
    -> same noise draw)."""
    cfg = TINY_WAN
    params = wan_vae.init(jax.random.PRNGKey(0), cfg)
    video = jax.random.normal(jax.random.PRNGKey(12), (1, 5, 16, 16, 3))
    k = jax.random.PRNGKey(13)
    full = wan_vae.encode_sample(params, cfg, video, k)
    stream = wan_vae.encode_sample_streaming(params, cfg, video, k)
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
