"""LoRA training CLI (counterpart of the reference's
scripts/training_scripts/{accelerate,low_resource}_train.py — one CLI here,
since HBM-resident sharded weights subsume both regimes).

Config: python file defining a dict `config` (registry `type=` dispatch like
the reference's mmengine configs), overridable with --set dotted.key=value.
See configs/training/lora_tiny.py for the schema.
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dualforce_tpu.utils.misc import respect_platform_env  # noqa: E402

respect_platform_env()  # JAX_PLATFORMS=cpu must keep subprocesses off the chip


def load_config(path: str) -> dict:
    spec = importlib.util.spec_from_file_location("train_config", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)  # type: ignore[union-attr]
    return mod.config


def apply_overrides(cfg: dict, overrides):
    for ov in overrides or []:
        key, _, value = ov.partition("=")
        node = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            node = node[p]
        try:
            import ast

            node[parts[-1]] = ast.literal_eval(value)
        except (ValueError, SyntaxError):
            node[parts[-1]] = value
    return cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--set", nargs="*", dest="overrides",
                    help="dotted config overrides, e.g. trainer.lr=2e-4")
    args = ap.parse_args()
    cfg_dict = apply_overrides(load_config(args.config), args.overrides)

    from dualforce_tpu.parallel.mesh import initialize_distributed

    initialize_distributed()  # multi-host: must precede any other jax use

    import jax
    import jax.numpy as jnp

    from dualforce_tpu.convert.load_checkpoint import (
        config_from_checkpoint,
        load_pipeline_params,
        load_tokenizer,
    )
    from dualforce_tpu.data.dataset import VideoAudioDataset, make_data_iter
    from dualforce_tpu.engine.trainer import LoRATrainer, TrainerConfig
    from dualforce_tpu.parallel.mesh import create_mesh
    from dualforce_tpu.parallel.sharding import shard_params

    ckpt = cfg_dict["pipeline"]["ckpt_path"]
    cfg = config_from_checkpoint(ckpt)
    wdtype = (jnp.float8_e4m3fn
              if cfg_dict["pipeline"].get("weight_dtype") == "fp8" else None)
    # offload='component' keeps base weights HOST-resident (staged per phase)
    offload = cfg_dict.get("trainer", {}).get("offload", "none")
    params = load_pipeline_params(ckpt, cfg, dtype=wdtype,
                                  to_device=(offload == "none"))
    tokenizer = load_tokenizer(ckpt)

    mesh_cfg = cfg_dict.get("mesh", {})
    mesh = None
    if mesh_cfg:
        mesh = create_mesh(mesh_cfg.get("data", 1), mesh_cfg.get("fsdp", 1),
                           mesh_cfg.get("cp", 1))
        params = shard_params(params, mesh)

    data_cfg = cfg_dict["data"]
    dataset = VideoAudioDataset(
        data_cfg["metadata_path"], height=data_cfg.get("height", 352),
        width=data_cfg.get("width", 640), num_frames=data_cfg.get("num_frames", 49),
        fps=data_cfg.get("fps", 24.0), sample_rate=cfg.audio_vae.sample_rate)
    data_iter = make_data_iter(dataset, tokenizer,
                               batch_size=data_cfg.get("batch_size", 1),
                               num_workers=data_cfg.get("num_workers", 2))

    tcfg = TrainerConfig(**cfg_dict.get("trainer", {}))
    trainer = LoRATrainer(cfg, params, tcfg,
                          is_main=jax.process_index() == 0, mesh=mesh)
    ctx = mesh if mesh is not None else _null()
    with ctx:
        trainer.train(data_iter)


class _null:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


if __name__ == "__main__":
    main()
