"""Worker for the two-process jax.distributed test (test_multiprocess.py).

Runs OUTSIDE pytest: forces the CPU platform itself, calls the production
initialize_distributed() (parallel/mesh.py — the counterpart of the
reference's dist.init_process_group, inference_single.py:58-60), builds a
data-axis mesh over the global (cross-process) devices, and computes LoRA
grads of the real training_loss on a deterministic global batch. Process 0
writes the grads to OUT_PATH as npz for the parent test to compare.

Env contract: PROCESS_ID, NUM_PROCESSES, OUT_PATH, and (for world>1)
COORDINATOR_ADDRESS. The same script with NUM_PROCESSES=1 is the
single-process reference run.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def infer_main(cp: bool = False):
    """Generate across processes through the PRODUCTION denoise_loop (dual
    expert phases, CFG with cache, paired Euler updates).

    cp=False — data axis (the reference's torchrun dp inference,
    inference_single.py:58-71): a global batch of two items is sharded
    one-per-process over the `data` mesh axis.

    cp=True — SEQUENCE axis (the reference's cp/Ulysses serving layout,
    inference_single.py:102-119): ONE item, the mesh's `cp` axis spans the
    two processes, inputs replicated, ring/all-to-all collectives cross the
    process boundary inside sp_forward_blocks. The parent asserts world=2
    equals the plain world=1 run bit-close."""
    import jax

    jax.config.update("jax_platforms", "cpu")

    from dualforce_tpu.parallel.mesh import create_mesh, initialize_distributed

    world = int(os.environ["NUM_PROCESSES"])
    pid = int(os.environ["PROCESS_ID"])
    initialize_distributed()
    assert jax.process_count() == world, (jax.process_count(), world)

    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    from dualforce_tpu.config import tiny_test_config
    from dualforce_tpu.diffusion.flow_match import FlowMatchPairScheduler
    from dualforce_tpu.diffusion.sampler import build_plan, denoise_loop
    from dualforce_tpu.models.factory import init_pipeline_params

    cfg = tiny_test_config()
    mesh = create_mesh(1, 1, world) if cp else create_mesh(data=world)

    params = init_pipeline_params(jax.random.PRNGKey(0), cfg,
                                  with_vaes=False, with_text=False)

    # deterministic global batch of 2 "prompts": per-item noise/context drawn
    # from item-keyed PRNGs so row i is bit-identical in either world
    b, f, hh, ww, la, tl = 2, 2, 4, 4, 8, 64
    td = cfg.video_dit.text_dim

    def item(i):
        ks = jax.random.split(jax.random.PRNGKey(100 + i), 4)
        return {
            "latents": jax.random.normal(ks[0], (16, f, hh, ww), jnp.float32),
            "condition": jax.random.normal(ks[1], (20, f, hh, ww),
                                           jnp.float32) * 0.1,
            "audio_latents": jax.random.normal(
                ks[2], (cfg.audio_vae.latent_dim, la), jnp.float32),
            "ctx_pos": jax.random.normal(ks[3], (tl, td), jnp.float32),
        }

    if cp:
        b = 1  # one prompt; parallelism is over the sequence, not the batch
    rows = [jax.tree.map(np.asarray, item(i)) for i in range(b)]
    g = {k: np.stack([r[k] for r in rows]) for k in rows[0]}
    if cp:
        # inputs replicated; sp_forward_blocks shards the sequence over `cp`
        batch = jax.tree.map(
            lambda x: multihost_utils.host_local_array_to_global_array(
                x, mesh, P()), g)
    else:
        local = {k: (v if world == 1 else v[pid:pid + 1])
                 for k, v in g.items()}
        batch = jax.tree.map(
            lambda x: multihost_utils.host_local_array_to_global_array(
                x, mesh, P("data")), local)
    params = jax.tree.map(
        lambda x: multihost_utils.host_local_array_to_global_array(
            np.asarray(x), mesh, P()), params)
    ctx_neg = jnp.zeros_like(batch["ctx_pos"])

    sched = FlowMatchPairScheduler(cfg.scheduler)
    sched.set_timesteps(4, shift=5.0)
    plan = build_plan(sched, cfg.boundary_ratio)

    lat, alat = denoise_loop(
        params["video_dit"], params["video_dit_2"], params["audio_dit"],
        params["bridge"], cfg, batch["latents"], batch["condition"],
        batch["audio_latents"], batch["ctx_pos"], ctx_neg, plan,
        cfg_scale=5.0, cfg_cache_interval=2, compute_dtype=jnp.float32,
        attn_impl="ref", sp_mesh=mesh if (cp and world > 1) else None)

    out = {"latents": np.asarray(multihost_utils.process_allgather(
               lat, tiled=True)),
           "audio_latents": np.asarray(multihost_utils.process_allgather(
               alat, tiled=True))}
    if pid == 0:
        np.savez(os.environ["OUT_PATH"], **out)
        print("WROTE", os.environ["OUT_PATH"], len(out))
    multihost_utils.sync_global_devices("done")


def main():
    if os.environ.get("MODE") == "infer":
        return infer_main()
    if os.environ.get("MODE") == "infer_cp":
        return infer_main(cp=True)
    import jax

    # axon's sitecustomize overrides the JAX_PLATFORMS env var; config.update
    # before backend init is the reliable way to stay on CPU
    jax.config.update("jax_platforms", "cpu")

    from dualforce_tpu.parallel.mesh import create_mesh, initialize_distributed

    world = int(os.environ["NUM_PROCESSES"])
    pid = int(os.environ["PROCESS_ID"])
    initialize_distributed()  # reads COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID
    assert jax.process_count() == world, (jax.process_count(), world)

    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dualforce_tpu.config import tiny_test_config
    from dualforce_tpu.diffusion.flow_match import FlowMatchPairScheduler
    from dualforce_tpu.diffusion.training import (
        build_train_tables,
        encode_batch,
        training_loss,
    )
    from dualforce_tpu.engine import lora as lora_mod
    from dualforce_tpu.models.factory import init_pipeline_params

    cfg = tiny_test_config()
    mesh = create_mesh(data=world)

    # deterministic GLOBAL batch (b=2); each process owns one row in world=2
    rng = np.random.default_rng(0)
    T = 5
    n_samples = int(48000 * T / 24)
    g = {
        "video": rng.uniform(-1, 1, (2, T, 32, 32, 3)).astype(np.float32),
        "audio": rng.uniform(-0.3, 0.3, (2, 1, n_samples)).astype(np.float32),
        "text_ids": rng.integers(2, 500, (2, 64)),
        "text_mask": np.ones((2, 64), np.int64),
    }
    local = {k: (v if world == 1 else v[pid:pid + 1]) for k, v in g.items()}

    def globalize(tree, spec):
        return jax.tree.map(
            lambda x: multihost_utils.host_local_array_to_global_array(
                np.asarray(x), mesh, spec), tree)

    batch = globalize(local, P("data"))
    params = globalize(
        jax.tree.map(np.asarray,
                     init_pipeline_params(jax.random.PRNGKey(0), cfg)), P())
    lora = globalize(
        jax.tree.map(np.asarray,
                     lora_mod.init_pipeline_lora(jax.random.PRNGKey(1),
                                                 params, rank=4)), P())
    sched = FlowMatchPairScheduler(cfg.scheduler)
    sched.set_timesteps(1000, training=True)
    tables = build_train_tables(sched, cfg.boundary_ratio)

    @jax.jit
    def grads_of(lora, params, batch, key):
        encoded = encode_batch(params, cfg, batch, compute_dtype=jnp.float32)
        (_, _), g = jax.value_and_grad(training_loss, has_aux=True)(
            lora, params, cfg, tables, encoded, key, 0,
            compute_dtype=jnp.float32)
        return g

    g = grads_of(lora, params, batch, jax.random.PRNGKey(7))
    # grads of replicated lora come out replicated -> addressable everywhere
    host = jax.tree.map(lambda x: np.asarray(jax.device_get(x)), g)
    if pid == 0:
        flat = {}
        for (path, leaf) in jax.tree_util.tree_leaves_with_path(host):
            flat[jax.tree_util.keystr(path)] = leaf
        np.savez(os.environ["OUT_PATH"], **flat)
        print("WROTE", os.environ["OUT_PATH"], len(flat))
    multihost_utils.sync_global_devices("done")


if __name__ == "__main__":
    main()
