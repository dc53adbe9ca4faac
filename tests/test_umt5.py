"""UMT5 encoder parity vs transformers' torch UMT5EncoderModel (tiny config)."""

import jax.numpy as jnp
import numpy as np
import torch
from transformers import UMT5Config as HFUMT5Config
from transformers import UMT5EncoderModel

from dualforce_tpu.config import UMT5Config
from dualforce_tpu.models.umt5 import convert_umt5, encode


def _models():
    cfg = UMT5Config(vocab_size=256, d_model=32, d_kv=8, d_ff=64, num_layers=3,
                     num_heads=4)
    hf_cfg = HFUMT5Config(
        vocab_size=cfg.vocab_size, d_model=cfg.d_model, d_kv=cfg.d_kv,
        d_ff=cfg.d_ff, num_layers=cfg.num_layers, num_heads=cfg.num_heads,
        relative_attention_num_buckets=cfg.relative_attention_num_buckets,
        relative_attention_max_distance=cfg.relative_attention_max_distance,
        feed_forward_proj="gated-gelu", dropout_rate=0.0, is_encoder_decoder=False,
        use_cache=False, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    tm = UMT5EncoderModel(hf_cfg).eval()
    params = convert_umt5(tm.state_dict(), cfg)
    return cfg, tm, params


def test_umt5_encoder_parity():
    cfg, tm, params = _models()
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, (2, 19))
    mask = np.ones((2, 19), np.int64)
    mask[1, 11:] = 0
    with torch.no_grad():
        want = tm(torch.tensor(ids), attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
    got = encode(params, cfg, jnp.asarray(ids), jnp.asarray(mask),
                 compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_umt5_no_mask():
    cfg, tm, params = _models()
    ids = np.random.default_rng(1).integers(0, cfg.vocab_size, (1, 7))
    with torch.no_grad():
        want = tm(torch.tensor(ids)).last_hidden_state.numpy()
    got = encode(params, cfg, jnp.asarray(ids), compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)
