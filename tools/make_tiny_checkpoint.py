"""Build a TINY MOVA checkpoint in the released HF DiffusionPipeline layout.

Produces a directory with one subdir per module (video_dit, video_dit_2,
audio_dit, dual_tower_bridge, video_vae, audio_vae, text_encoder, tokenizer)
each holding config.json + model.safetensors — exactly the layout
`convert/load_checkpoint.py` ingests (SURVEY.md §5.4). The DiT/bridge/DAC
weights come from the reference torch modules (the same oracles the parity
tests use), the text encoder from transformers' UMT5EncoderModel, and the
video VAE from this framework's own init emitted under Wan-official naming.

Used by tests/test_checkpoint_load.py and for end-to-end CLI smoke runs:

    python tools/make_tiny_checkpoint.py /tmp/tiny_ckpt
    python scripts/inference_single.py --ckpt_path /tmp/tiny_ckpt ...
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from dualforce_tpu.utils.misc import respect_platform_env  # noqa: E402

respect_platform_env()  # JAX_PLATFORMS=cpu must keep subprocesses off the chip
sys.path.insert(0, os.path.join(_REPO, "tests"))


def _save_module(path: str, sd, config: dict) -> None:
    from safetensors import numpy as st_numpy

    os.makedirs(path, exist_ok=True)
    arrays = {}
    for k, v in sd.items():
        a = v.detach().cpu().float().numpy() if hasattr(v, "detach") else np.asarray(v)
        arrays[k] = np.ascontiguousarray(a, dtype=np.float32)
    st_numpy.save_file(arrays, os.path.join(path, "model.safetensors"))
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(config, f, indent=2, default=list)


def _wan_vae_torch_named(params) -> dict:
    """Emit our wan_vae pytree under Wan-official torch naming — the exact
    inverse of load_checkpoint._convert_wan_vae."""
    sd = {}

    def conv5(prefix, p):  # causal 3D conv: [t,h,w,i,o] -> [o,i,t,h,w]
        sd[f"{prefix}.weight"] = np.transpose(np.asarray(p["kernel"]), (4, 3, 0, 1, 2))
        sd[f"{prefix}.bias"] = np.asarray(p["bias"])

    def conv4(prefix, p):  # per-frame 2D conv: [1,kh,kw,i,o] -> [o,i,kh,kw]
        k = np.asarray(p["kernel"])[0]
        sd[f"{prefix}.weight"] = np.transpose(k, (3, 2, 0, 1))
        sd[f"{prefix}.bias"] = np.asarray(p["bias"])

    def norm(prefix, p):
        sd[f"{prefix}.gamma"] = np.asarray(p["gamma"]).reshape(1, -1, 1, 1, 1)
        if "bias" in p:
            sd[f"{prefix}.bias"] = np.asarray(p["bias"])

    def res_block(prefix, p):
        norm(f"{prefix}.residual.0", p["norm1"])
        conv5(f"{prefix}.residual.2", p["conv1"])
        norm(f"{prefix}.residual.3", p["norm2"])
        conv5(f"{prefix}.residual.6", p["conv2"])
        if "shortcut" in p:
            conv5(f"{prefix}.shortcut", p["shortcut"])

    def attn_block(prefix, p):
        norm(f"{prefix}.norm", p["norm"])
        conv4(f"{prefix}.to_qkv", p["to_qkv"])
        conv4(f"{prefix}.proj", p["proj"])

    enc = params["encoder"]
    conv5("encoder.conv1", enc["conv1"])
    idx = 0
    for stage in enc["stages"]:
        for bp in stage["blocks"]:
            res_block(f"encoder.downsamples.{idx}", bp)
            idx += 1
        if "down" in stage:
            conv4(f"encoder.downsamples.{idx}.resample.1", stage["down"]["conv"])
            if "time_conv" in stage["down"]:
                conv5(f"encoder.downsamples.{idx}.time_conv", stage["down"]["time_conv"])
            idx += 1
    res_block("encoder.middle.0", enc["mid"]["rb1"])
    attn_block("encoder.middle.1", enc["mid"]["attn"])
    res_block("encoder.middle.2", enc["mid"]["rb2"])
    norm("encoder.head.0", enc["head_norm"])
    conv5("encoder.head.2", enc["head_conv"])

    dec = params["decoder"]
    conv5("decoder.conv1", dec["conv1"])
    res_block("decoder.middle.0", dec["mid"]["rb1"])
    attn_block("decoder.middle.1", dec["mid"]["attn"])
    res_block("decoder.middle.2", dec["mid"]["rb2"])
    idx = 0
    for stage in dec["stages"]:
        for bp in stage["blocks"]:
            res_block(f"decoder.upsamples.{idx}", bp)
            idx += 1
        if "up" in stage:
            conv4(f"decoder.upsamples.{idx}.resample.1", stage["up"]["conv"])
            if "time_conv" in stage["up"]:
                conv5(f"decoder.upsamples.{idx}.time_conv", stage["up"]["time_conv"])
            idx += 1
    norm("decoder.head.0", dec["head_norm"])
    conv5("decoder.head.2", dec["head_conv"])

    conv5("quant_conv", params["quant_conv"])
    conv5("post_quant_conv", params["post_quant_conv"])
    return sd


def build(out_dir: str, seed: int = 0) -> str:
    import jax
    import torch

    from dualforce_tpu.config import tiny_test_config, to_dict
    from dualforce_tpu.models import wan_vae
    from _torch_ref import load

    cfg = tiny_test_config()
    ref_vdit = load("mova.diffusion.models.wan_video_dit")
    ref_adit = load("mova.diffusion.models.wan_audio_dit")
    ref_bridge = load("mova.diffusion.models.interactionv2")
    ref_dac = load("mova.diffusion.models.dac_vae")

    os.makedirs(out_dir, exist_ok=True)

    # --- video towers (two experts) ---
    v = cfg.video_dit
    v_cfg = dict(dim=v.dim, in_dim=v.in_dim, ffn_dim=v.ffn_dim, out_dim=v.out_dim,
                 text_dim=v.text_dim, freq_dim=v.freq_dim, eps=v.eps,
                 patch_size=list(v.patch_size), num_heads=v.num_heads,
                 num_layers=v.num_layers, rope_max_len=v.rope_max_len)
    for name, s in (("video_dit", seed), ("video_dit_2", seed + 1)):
        torch.manual_seed(s)
        torch_cfg = {k: val for k, val in v_cfg.items() if k != "rope_max_len"}
        tm = ref_vdit.WanModel(has_image_input=False, **{**torch_cfg,
                               "patch_size": tuple(v.patch_size)}).eval()
        _save_module(os.path.join(out_dir, name), tm.state_dict(), v_cfg)

    # --- audio tower ---
    a = cfg.audio_dit
    torch.manual_seed(seed + 2)
    ta = ref_adit.WanAudioModel(
        dim=a.dim, in_dim=a.in_dim, ffn_dim=a.ffn_dim, out_dim=a.out_dim,
        text_dim=a.text_dim, freq_dim=a.freq_dim, eps=a.eps,
        patch_size=[a.patch_size], num_heads=a.num_heads,
        num_layers=a.num_layers, has_image_input=False, vae_type=a.vae_type).eval()
    _save_module(os.path.join(out_dir, "audio_dit"), ta.state_dict(), dict(
        dim=a.dim, in_dim=a.in_dim, ffn_dim=a.ffn_dim, out_dim=a.out_dim,
        text_dim=a.text_dim, freq_dim=a.freq_dim, eps=a.eps,
        patch_size=[a.patch_size], num_heads=a.num_heads, num_layers=a.num_layers,
        vae_type=a.vae_type, rope_max_len=a.rope_max_len))

    # --- bridge ---
    b = cfg.bridge
    torch.manual_seed(seed + 3)
    tb = ref_bridge.DualTowerConditionalBridge(
        visual_layers=b.visual_layers, audio_layers=b.audio_layers,
        visual_hidden_dim=b.visual_hidden_dim, audio_hidden_dim=b.audio_hidden_dim,
        audio_fps=b.audio_fps, head_dim=b.head_dim,
        interaction_strategy=b.interaction_strategy,
        apply_cross_rope=b.apply_cross_rope).eval()
    _save_module(os.path.join(out_dir, "dual_tower_bridge"), tb.state_dict(), dict(
        visual_layers=b.visual_layers, audio_layers=b.audio_layers,
        visual_hidden_dim=b.visual_hidden_dim, audio_hidden_dim=b.audio_hidden_dim,
        audio_fps=b.audio_fps, head_dim=b.head_dim,
        interaction_strategy=b.interaction_strategy,
        apply_cross_rope=b.apply_cross_rope))

    # --- video VAE (our init, Wan-official naming) ---
    vv = cfg.video_vae
    vae_params = wan_vae.init(jax.random.PRNGKey(seed + 4), vv)
    _save_module(os.path.join(out_dir, "video_vae"),
                 _wan_vae_torch_named(vae_params), to_dict(vv))

    # --- audio VAE (reference DAC, weight-norm intact) ---
    av = cfg.audio_vae
    torch.manual_seed(seed + 5)
    td = ref_dac.DAC(encoder_dim=av.encoder_dim, encoder_rates=list(av.encoder_rates),
                     latent_dim=av.latent_dim, decoder_dim=av.decoder_dim,
                     decoder_rates=list(av.decoder_rates),
                     sample_rate=av.sample_rate, continuous=True).eval()
    _save_module(os.path.join(out_dir, "audio_vae"), td.state_dict(), to_dict(av))

    # --- text encoder (HF UMT5) + tokenizer ---
    from transformers import UMT5Config, UMT5EncoderModel

    t = cfg.text_encoder
    hf_cfg = UMT5Config(
        vocab_size=t.vocab_size, d_model=t.d_model, d_kv=t.d_kv, d_ff=t.d_ff,
        num_layers=t.num_layers, num_heads=t.num_heads,
        relative_attention_num_buckets=t.relative_attention_num_buckets,
        relative_attention_max_distance=t.relative_attention_max_distance,
        layer_norm_epsilon=t.layer_norm_epsilon)
    torch.manual_seed(seed + 6)
    te = UMT5EncoderModel(hf_cfg).eval()
    te.save_pretrained(os.path.join(out_dir, "text_encoder"))

    from tokenizers import Tokenizer, models as tok_models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    vocab = {"<pad>": 0, "</s>": 1, "<unk>": 2}
    vocab.update({f"tok{i}": 3 + i for i in range(t.vocab_size - 3)})
    wl = Tokenizer(tok_models.WordLevel(vocab, unk_token="<unk>"))
    wl.pre_tokenizer = pre_tokenizers.Whitespace()
    fast = PreTrainedTokenizerFast(tokenizer_object=wl, pad_token="<pad>",
                                   eos_token="</s>", unk_token="<unk>")
    fast.save_pretrained(os.path.join(out_dir, "tokenizer"))

    with open(os.path.join(out_dir, "model_index.json"), "w") as f:
        json.dump({"boundary_ratio": 0.9, "audio_vae_type": "dac"}, f)
    return out_dir


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tiny_mova_ckpt"
    build(out)
    print(f"tiny checkpoint written to {out}")
