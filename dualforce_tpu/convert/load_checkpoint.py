"""Load released MOVA checkpoints (HF DiffusionPipeline directory layout) into
this framework's param pytrees.

Reference layout (SURVEY.md §5.4): one subdir per module — video_dit,
video_dit_2, audio_dit, dual_tower_bridge, video_vae, audio_vae, text_encoder,
tokenizer, scheduler — each with config.json + *.safetensors (or pytorch
.bin). Conversion is one-time; converted params can be cached as an Orbax
checkpoint for fast sharded reload.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import numpy as np

from dualforce_tpu.config import (
    AudioDiTConfig,
    BridgeConfig,
    DACVAEConfig,
    MOVAConfig,
    UMT5Config,
    VideoDiTConfig,
    WanVAEConfig,
)
from dualforce_tpu.convert.torch_import import (
    convert_audio_dit,
    convert_bridge,
    convert_dac,
    convert_video_dit,
)
from dualforce_tpu.models.umt5 import convert_umt5


def load_state_dict(module_dir: str) -> Dict[str, np.ndarray]:
    """Read all safetensors shards (or torch .bin) in a module dir."""
    sd: Dict[str, np.ndarray] = {}
    files = sorted(os.listdir(module_dir))
    st_files = [f for f in files if f.endswith(".safetensors")]
    if st_files:
        from safetensors import numpy as st_numpy

        for f in st_files:
            sd.update(st_numpy.load_file(os.path.join(module_dir, f)))
        return sd
    bin_files = [f for f in files if f.endswith((".bin", ".pt", ".pth"))]
    if bin_files:
        import torch

        for f in bin_files:
            loaded = torch.load(os.path.join(module_dir, f), map_location="cpu",
                                weights_only=True)
            sd.update({k: v.float().numpy() for k, v in loaded.items()})
        return sd
    raise FileNotFoundError(f"no weight files in {module_dir}")


def _read_config(module_dir: str) -> Dict[str, Any]:
    with open(os.path.join(module_dir, "config.json")) as f:
        return json.load(f)


def config_from_checkpoint(ckpt_dir: str) -> MOVAConfig:
    """Derive the MOVAConfig from the per-module config.json files."""
    def mod(name):
        return _read_config(os.path.join(ckpt_dir, name))

    v = mod("video_dit")
    a = mod("audio_dit")
    b = mod("dual_tower_bridge")
    vv = mod("video_vae")
    av = mod("audio_vae")
    # HF text_encoder config (optional — defaults are umt5-xxl); without this,
    # any non-xxl text encoder would fail weight conversion
    te_path = os.path.join(ckpt_dir, "text_encoder", "config.json")
    te = {}
    if os.path.exists(te_path):
        with open(te_path) as f:
            te = json.load(f)
    text_encoder = UMT5Config(
        vocab_size=te.get("vocab_size", 256384),
        d_model=te.get("d_model", 4096),
        d_kv=te.get("d_kv", 64),
        d_ff=te.get("d_ff", 10240),
        num_layers=te.get("num_layers", 24),
        num_heads=te.get("num_heads", 64),
        relative_attention_num_buckets=te.get("relative_attention_num_buckets", 32),
        relative_attention_max_distance=te.get("relative_attention_max_distance", 128),
        layer_norm_epsilon=te.get("layer_norm_epsilon", 1e-6),
    )

    pipe_cfg = {}
    mi = os.path.join(ckpt_dir, "model_index.json")
    if os.path.exists(mi):
        with open(mi) as f:
            pipe_cfg = json.load(f)

    return MOVAConfig(
        video_dit=VideoDiTConfig(
            dim=v["dim"], in_dim=v["in_dim"], ffn_dim=v["ffn_dim"],
            out_dim=v["out_dim"], text_dim=v.get("text_dim", 4096),
            freq_dim=v.get("freq_dim", 256), eps=v.get("eps", 1e-6),
            patch_size=tuple(v["patch_size"]), num_heads=v["num_heads"],
            num_layers=v["num_layers"],
            rope_max_len=v.get("rope_max_len", 1024)),
        audio_dit=AudioDiTConfig(
            dim=a["dim"], in_dim=a["in_dim"], ffn_dim=a["ffn_dim"],
            out_dim=a["out_dim"], text_dim=a.get("text_dim", 4096),
            freq_dim=a.get("freq_dim", 256), eps=a.get("eps", 1e-6),
            patch_size=(a["patch_size"][0] if isinstance(a["patch_size"], (list, tuple))
                        else a["patch_size"]),
            num_heads=a["num_heads"], num_layers=a["num_layers"],
            vae_type=a.get("vae_type", "dac"),
            rope_max_len=a.get("rope_max_len", 8192)),
        bridge=BridgeConfig(
            visual_layers=b.get("visual_layers", v["num_layers"]),
            audio_layers=b.get("audio_layers", a["num_layers"]),
            visual_hidden_dim=b.get("visual_hidden_dim", v["dim"]),
            audio_hidden_dim=b.get("audio_hidden_dim", a["dim"]),
            audio_fps=b.get("audio_fps", 50.0),
            head_dim=b.get("head_dim", 128),
            interaction_strategy=b.get("interaction_strategy", "full"),
            apply_cross_rope=b.get("apply_cross_rope", True),
            apply_first_frame_bias_in_rope=b.get("apply_first_frame_bias_in_rope", False),
            trainable_condition_scale=b.get("trainable_condition_scale", False),
            pooled_adaln=b.get("pooled_adaln", False)),
        video_vae=WanVAEConfig(
            base_dim=vv.get("base_dim", 96), z_dim=vv.get("z_dim", 16),
            dim_mult=tuple(vv.get("dim_mult", (1, 2, 4, 4))),
            num_res_blocks=vv.get("num_res_blocks", 2),
            attn_scales=tuple(vv.get("attn_scales", ())),
            temperal_downsample=tuple(vv.get("temperal_downsample", (False, True, True))),
            # fall back to the dataclass defaults (Wan-official stats) when
            # the config.json omits the normalization tables
            **({"latents_mean": tuple(vv["latents_mean"])}
               if vv.get("latents_mean") is not None else {}),
            **({"latents_std": tuple(vv["latents_std"])}
               if vv.get("latents_std") is not None else {})),
        audio_vae=DACVAEConfig(
            encoder_dim=av.get("encoder_dim", 128),
            encoder_rates=tuple(av.get("encoder_rates", (2, 3, 4, 5, 8))),
            decoder_dim=av.get("decoder_dim", 2048),
            decoder_rates=tuple(av.get("decoder_rates", (8, 5, 4, 3, 2))),
            latent_dim=av.get("latent_dim", 128),
            sample_rate=av.get("sample_rate", 48000),
            continuous=av.get("continuous", True)),
        text_encoder=text_encoder,
        boundary_ratio=pipe_cfg.get("boundary_ratio", 0.9),
        audio_vae_type=pipe_cfg.get("audio_vae_type", "dac"),
        two_video_towers=os.path.isdir(os.path.join(ckpt_dir, "video_dit_2")),
    )


def _convert_wan_vae(sd: Dict[str, np.ndarray], cfg: WanVAEConfig) -> Dict:
    """Wan-official naming -> wan_vae pytree (encoder.conv1 / downsamples.N /
    middle.N / head.N; decoder mirrored). Kernel layout [o,i,t,h,w] -> [t,h,w,i,o]."""

    def conv(prefix):
        w = np.asarray(sd[f"{prefix}.weight"])
        if w.ndim == 5:
            k = w.transpose(2, 3, 4, 1, 0)
        elif w.ndim == 4:  # Conv2d inside Resample -> (1, kh, kw, i, o)
            k = w.transpose(2, 3, 1, 0)[None]
        else:
            raise ValueError(f"unexpected conv rank for {prefix}: {w.shape}")
        return {"kernel": k, "bias": np.asarray(sd[f"{prefix}.bias"])}

    def norm(prefix):
        p = {"gamma": np.asarray(sd[f"{prefix}.gamma"]).reshape(-1)}
        if f"{prefix}.bias" in sd:
            b = np.asarray(sd[f"{prefix}.bias"])
            if b.ndim:
                p["bias"] = b.reshape(-1)
        return p

    def res_block(prefix, has_shortcut):
        p = {
            "norm1": norm(f"{prefix}.residual.0"),
            "conv1": conv(f"{prefix}.residual.2"),
            "norm2": norm(f"{prefix}.residual.3"),
            "conv2": conv(f"{prefix}.residual.6"),
        }
        if has_shortcut:
            p["shortcut"] = conv(f"{prefix}.shortcut")
        return p

    def attn_block(prefix):
        return {
            "norm": norm(f"{prefix}.norm"),
            "to_qkv": conv(f"{prefix}.to_qkv"),
            "proj": conv(f"{prefix}.proj"),
        }

    dims = [cfg.base_dim * u for u in (1,) + tuple(cfg.dim_mult)]

    # ---- encoder ----
    enc = {"conv1": conv("encoder.conv1")}
    stages, idx = [], 0
    for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
        blocks = []
        d = din
        for _ in range(cfg.num_res_blocks):
            blocks.append(res_block(f"encoder.downsamples.{idx}", d != dout))
            d = dout
            idx += 1
        stage = {"blocks": blocks}
        if i != len(cfg.dim_mult) - 1:
            down = {"conv": conv(f"encoder.downsamples.{idx}.resample.1")}
            if cfg.temperal_downsample[i]:
                down["time_conv"] = conv(f"encoder.downsamples.{idx}.time_conv")
            stage["down"] = down
            idx += 1
        stages.append(stage)
    enc["stages"] = stages
    enc["mid"] = {
        "rb1": res_block("encoder.middle.0", False),
        "attn": attn_block("encoder.middle.1"),
        "rb2": res_block("encoder.middle.2", False),
    }
    enc["head_norm"] = norm("encoder.head.0")
    enc["head_conv"] = conv("encoder.head.2")

    # ---- decoder ----
    mult = tuple(cfg.dim_mult)
    ddims = [cfg.base_dim * u for u in (mult[-1],) + tuple(reversed(mult))]
    temperal_upsample = tuple(reversed(cfg.temperal_downsample))
    dec = {"conv1": conv("decoder.conv1")}
    dec["mid"] = {
        "rb1": res_block("decoder.middle.0", False),
        "attn": attn_block("decoder.middle.1"),
        "rb2": res_block("decoder.middle.2", False),
    }
    stages, idx = [], 0
    for i, (din, dout) in enumerate(zip(ddims[:-1], ddims[1:])):
        if i in (1, 2, 3):
            din = din // 2
        blocks = []
        d = din
        for _ in range(cfg.num_res_blocks + 1):
            blocks.append(res_block(f"decoder.upsamples.{idx}", d != dout))
            d = dout
            idx += 1
        stage = {"blocks": blocks}
        if i != len(mult) - 1:
            up = {"conv": conv(f"decoder.upsamples.{idx}.resample.1")}
            if temperal_upsample[i]:
                up["time_conv"] = conv(f"decoder.upsamples.{idx}.time_conv")
            stage["up"] = up
            idx += 1
        stages.append(stage)
    dec["stages"] = stages
    dec["head_norm"] = norm("decoder.head.0")
    dec["head_conv"] = conv("decoder.head.2")

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": conv("quant_conv") if "quant_conv.weight" in sd else
        {"kernel": np.eye(2 * cfg.z_dim, dtype=np.float32)[None, None, None],
         "bias": np.zeros((2 * cfg.z_dim,), np.float32)},
        "post_quant_conv": conv("post_quant_conv") if "post_quant_conv.weight" in sd else
        {"kernel": np.eye(cfg.z_dim, dtype=np.float32)[None, None, None],
         "bias": np.zeros((cfg.z_dim,), np.float32)},
    }


def load_pipeline_params(ckpt_dir: str, cfg: Optional[MOVAConfig] = None,
                         dtype=None, to_device: bool = True,
                         cache: bool = False,
                         cache_dir: Optional[str] = None) -> Dict[str, Any]:
    """Convert a full MOVA checkpoint directory to pipeline params.

    to_device=False keeps the trees as host numpy arrays (for the
    component-offload pipeline mode, which stages modules to HBM on demand).
    cache=True stores the converted pytrees as an Orbax checkpoint next to the
    source (one-time conversion; subsequent loads restore directly, sharded
    under an active Mesh). The cache records the tower dtype and the source
    weight mtimes — a dtype change or updated checkpoint invalidates it."""
    import jax
    import jax.numpy as jnp

    if cfg is None:
        cfg = config_from_checkpoint(ckpt_dir)
    dtype = dtype or jnp.bfloat16

    cache_path = os.path.abspath(cache_dir or os.path.join(ckpt_dir, ".dftpu_orbax"))
    meta_path = cache_path + ".meta.json"
    src_mtime = max((os.path.getmtime(os.path.join(r, f))
                     for r, _, fs in os.walk(ckpt_dir) for f in fs
                     if f.endswith((".safetensors", ".bin", ".pt", ".pth"))),
                    default=0.0)
    want_meta = {"dtype": jnp.dtype(dtype).name, "src_mtime": src_mtime}
    if cache and os.path.isdir(cache_path) and os.listdir(cache_path):
        have_meta = {}
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                have_meta = json.load(f)
        if have_meta == want_meta:
            import orbax.checkpoint as ocp

            params = ocp.PyTreeCheckpointer().restore(cache_path)
            if not to_device:
                params = jax.tree.map(np.asarray, params)
            return params
        # stale or mismatched cache: fall through and rebuild it

    params: Dict[str, Any] = {}
    params["video_dit"] = convert_video_dit(
        load_state_dict(os.path.join(ckpt_dir, "video_dit")), cfg.video_dit)
    if os.path.isdir(os.path.join(ckpt_dir, "video_dit_2")):
        params["video_dit_2"] = convert_video_dit(
            load_state_dict(os.path.join(ckpt_dir, "video_dit_2")), cfg.video_dit)
    params["audio_dit"] = convert_audio_dit(
        load_state_dict(os.path.join(ckpt_dir, "audio_dit")), cfg.audio_dit)
    params["bridge"] = convert_bridge(
        load_state_dict(os.path.join(ckpt_dir, "dual_tower_bridge")), cfg.bridge)
    params["video_vae"] = _convert_wan_vae(
        load_state_dict(os.path.join(ckpt_dir, "video_vae")), cfg.video_vae)
    params["audio_vae"] = convert_dac(
        load_state_dict(os.path.join(ckpt_dir, "audio_vae")), cfg.audio_vae)
    params["text_encoder"] = convert_umt5(
        load_state_dict(os.path.join(ckpt_dir, "text_encoder")), cfg.text_encoder)

    from dualforce_tpu import nn as dnn

    if to_device:
        as_array = jnp.asarray
    else:
        # ml_dtypes gives numpy a native bfloat16; values stay host-resident
        def as_array(x):
            return np.asarray(x)

    # towers in compute dtype; VAEs stay fp32 (decode precision parity).
    # fp8 dtype = storage-only: kernels go fp8 (half the HBM), biases/norms/
    # modulation stay bf16, and nn.linear upcasts at use.
    fp8 = jnp.dtype(dtype) in (jnp.dtype(jnp.float8_e4m3fn),
                               jnp.dtype(jnp.float8_e5m2))
    for k in ("video_dit", "video_dit_2", "audio_dit", "bridge", "text_encoder"):
        if k in params:
            tree = jax.tree.map(as_array, params[k])
            params[k] = (dnn.cast_tree_fp8(tree, dtype) if fp8
                         else dnn.cast_tree(tree, dtype))
    for k in ("video_vae", "audio_vae"):
        params[k] = jax.tree.map(as_array, params[k])

    if cache:
        import orbax.checkpoint as ocp

        # save host-side arrays as-is: forcing jnp here would device_put the
        # whole pipeline, defeating to_device=False on HBM-constrained chips
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(cache_path, params, force=True)
        with open(meta_path, "w") as f:
            json.dump(want_meta, f)
    return params


def load_tokenizer(ckpt_dir: str):
    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(os.path.join(ckpt_dir, "tokenizer"))
