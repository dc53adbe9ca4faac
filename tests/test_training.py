"""LoRA training: step runs, loss finite, LoRA-only grads, checkpoint resume."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from dualforce_tpu.config import tiny_test_config
from dualforce_tpu.diffusion.flow_match import FlowMatchPairScheduler
from dualforce_tpu.diffusion.training import build_train_tables, encode_batch, training_loss
from dualforce_tpu.engine import lora as lora_mod
from dualforce_tpu.engine.trainer import LoRATrainer, TrainerConfig
from dualforce_tpu.models.factory import init_pipeline_params


def _batch(cfg, b=1, T=5, H=32, W=32):
    rng = np.random.default_rng(0)
    n_samples = int(48000 * T / 24)
    return {
        "video": jnp.asarray(rng.uniform(-1, 1, (b, T, H, W, 3)).astype(np.float32)),
        "audio": jnp.asarray(rng.uniform(-0.3, 0.3, (b, 1, n_samples)).astype(np.float32)),
        "text_ids": jnp.asarray(rng.integers(2, 500, (b, 64))),
        "text_mask": jnp.asarray(np.ones((b, 64), np.int64)),
    }


def test_lora_injection_targets():
    cfg = tiny_test_config()
    params = init_pipeline_params(jax.random.PRNGKey(0), cfg, with_vaes=False,
                                  with_text=False)
    lora = lora_mod.init_pipeline_lora(jax.random.PRNGKey(1), params, rank=4)
    assert set(lora) == {"video_dit", "video_dit_2", "audio_dit", "bridge"}
    # every tower attention projection targeted; ffn/patchify/time not
    names = list(lora["video_dit"])
    assert any("self_attn/q" in n for n in names)
    assert any("cross_attn/o" in n for n in names)
    assert not any("ffn" in n or "time" in n for n in names)
    # stacked-layer leading axis preserved
    a = lora["video_dit"]["blocks/self_attn/q/kernel"]["a"]
    assert a.shape[0] == cfg.video_dit.num_layers

    # zero-init B => merge is identity
    merged = lora_mod.merge_pipeline_lora(params, lora)
    w0 = params["video_dit"]["blocks"]["self_attn"]["q"]["kernel"]
    w1 = merged["video_dit"]["blocks"]["self_attn"]["q"]["kernel"]
    np.testing.assert_array_equal(np.asarray(w0), np.asarray(w1))


def test_training_loss_and_lora_grads():
    cfg = tiny_test_config()
    params = init_pipeline_params(jax.random.PRNGKey(0), cfg)
    sched = FlowMatchPairScheduler(cfg.scheduler)
    sched.set_timesteps(1000, training=True)
    tables = build_train_tables(sched, cfg.boundary_ratio)
    encoded = encode_batch(params, cfg, _batch(cfg), compute_dtype=jnp.float32)
    lora = lora_mod.init_pipeline_lora(jax.random.PRNGKey(1), params, rank=4)

    for expert in (0, 1):
        (loss, metrics), grads = jax.value_and_grad(training_loss, has_aux=True)(
            lora, params, cfg, tables, encoded, jax.random.PRNGKey(2), expert,
            compute_dtype=jnp.float32, remat=True, attn_impl="ref")
        assert np.isfinite(float(loss))
        assert float(metrics["video_loss"]) > 0 and float(metrics["audio_loss"]) > 0
        # active video tower's LoRA must receive gradient; inactive must not
        active = "video_dit" if expert == 0 else "video_dit_2"
        inactive = "video_dit_2" if expert == 0 else "video_dit"
        g_act = jax.tree.leaves(grads[active])
        g_inact = jax.tree.leaves(grads[inactive])
        assert any(float(jnp.abs(g).sum()) > 0 for g in g_act)
        assert all(float(jnp.abs(g).sum()) == 0 for g in g_inact)
        # audio + bridge always train
        assert any(float(jnp.abs(g).sum()) > 0 for g in jax.tree.leaves(grads["audio_dit"]))
        assert any(float(jnp.abs(g).sum()) > 0 for g in jax.tree.leaves(grads["bridge"]))
        # expert boundary respected
        t = float(metrics["timestep"])
        assert (t >= 900) if expert == 0 else (t < 900)


def test_trainer_loop_and_resume(tmp_path):
    cfg = tiny_test_config()
    params = init_pipeline_params(jax.random.PRNGKey(0), cfg)
    tcfg = TrainerConfig(max_steps=3, warmup_steps=1, save_interval=2,
                         log_interval=1, save_dir=str(tmp_path / "ckpt"),
                         logger="none", lora_rank=2, compute_dtype=jnp.float32,
                         attn_impl="ref")
    tr = LoRATrainer(cfg, params, tcfg)
    batches = (b for b in [_batch(cfg)] * 10)
    final = tr.train(batches)
    assert final == 3
    assert os.path.isdir(tmp_path / "ckpt" / "step-3")

    # resume picks up the latest step
    tr2 = LoRATrainer(cfg, params, tcfg)
    assert tr2.global_step == 3
