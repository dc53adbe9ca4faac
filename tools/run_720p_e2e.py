"""Flagship-scale 720p end-to-end generation on ONE 16 GB v5e.

Drives the FULL production pipeline — UMT5 prompt encode, streaming Wan-VAE
ENCODE of the reference frame (prepare_latents), the dual-expert denoise
loop under layerwise group-streamed offload (fp8 weight storage, the
reference's `--offload group` 12 GB-VRAM mode), streaming Wan-VAE decode,
DAC decode, and the mp4+audio mux — at the reference's shipped 720p recipe
geometry (1280x720, 193 frames @ 24 fps; /root/reference/README.md:96-107).

No released MOVA checkpoint exists in this environment, so the weights are
SYNTHETIC: the exact flagship pytree (38.8B params: 2x14.3B video experts,
1.4B audio tower, 2.7B bridge, 5.7B UMT5-xxl) is materialized on host from
`jax.eval_shape` over the real initializers, filled at memcpy speed from a
random pool with init-correct per-leaf rules (ones for norm gamma/scale and
snake alpha, zeros for bias, fan-in-scaled noise for kernels), and stored
with the same fp8 storage rule the checkpoint loader applies
(nn.cast_tree_fp8: floating ndim>=2 -> e4m3, rest bf16 — see
convert/load_checkpoint.py:336-344). Everything DOWNSTREAM of weight
loading is the production code path, byte-for-byte the same programs a real
checkpoint would run; outputs are noise but every shape, transfer, compile
and kernel is the real 720p workload.

Usage:
    python tools/run_720p_e2e.py --steps 8 --output out/720p_e2e.mp4
    python tools/run_720p_e2e.py --dry        # tiny-config CPU smoke run
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np


def build_tokenizer(vocab_size: int):
    """In-process whitespace tokenizer (same construction as
    tools/make_tiny_checkpoint.py) — prompt text -> ids for UMT5."""
    from tokenizers import Tokenizer
    from tokenizers import models as tok_models
    from tokenizers import pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    vocab = {"<pad>": 0, "</s>": 1, "<unk>": 2}
    vocab.update({f"tok{i}": 3 + i for i in range(min(vocab_size, 4096) - 3)})
    wl = Tokenizer(tok_models.WordLevel(vocab, unk_token="<unk>"))
    wl.pre_tokenizer = pre_tokenizers.Whitespace()
    return PreTrainedTokenizerFast(tokenizer_object=wl, pad_token="<pad>",
                                   eos_token="</s>", unk_token="<unk>")


def synthesize_params(cfg, *, fp8: bool, log=print):
    """Materialize the flagship param pytree on HOST with init-correct
    per-leaf fill rules, at the storage dtypes the fp8 checkpoint-load path
    produces. Returns a dict of module pytrees of jax CPU arrays."""
    import jax
    import jax.numpy as jnp
    from jax.tree_util import keystr, tree_flatten_with_path, tree_unflatten

    from dualforce_tpu.models.factory import init_pipeline_params

    cpu = jax.devices("cpu")[0]
    shapes = jax.eval_shape(
        lambda k: init_pipeline_params(k, cfg, dtype=jnp.bfloat16),
        jax.random.PRNGKey(0))

    POOL = 1 << 22  # 4M-float pool; leaves tile it from distinct offsets

    def _fill(pool, shape, dtype, std, offset):
        n = math.prod(shape)
        reps = -(-(n + POOL) // POOL)
        v = jnp.tile(pool, reps)
        v = jax.lax.dynamic_slice(v, (offset,), (n,))
        return (v.reshape(shape) * std).astype(dtype)

    fill = jax.jit(_fill, static_argnums=(1, 2))
    # storage rule == nn.cast_tree_fp8 (load_checkpoint.py:336-344): in the
    # tower modules floating ndim>=2 leaves go fp8, the rest bf16; VAEs f32.
    towers = ("video_dit", "video_dit_2", "audio_dit", "bridge",
              "text_encoder")

    out = {}
    with jax.default_device(cpu):
        pool = jax.random.normal(jax.random.PRNGKey(7), (POOL,),
                                 dtype=jnp.float32)
        pool.block_until_ready()
        for mod, sub in shapes.items():
            t0 = time.time()
            leaves, treedef = tree_flatten_with_path(sub)
            vals = []
            for i, (path, leaf) in enumerate(leaves):
                kind = keystr(path).rsplit("'", 2)[-2]
                if mod in towers:
                    dtype = (jnp.float8_e4m3fn
                             if fp8 and leaf.ndim >= 2 else jnp.bfloat16)
                else:
                    dtype = jnp.float32  # VAEs: decode-precision parity
                if kind in ("gamma", "scale", "alpha"):
                    std, base = 0.0, 1.0
                elif kind == "bias":
                    std, base = 0.0, 0.0
                elif kind == "kernel" and leaf.ndim >= 2:
                    std, base = 1.0 / math.sqrt(leaf.shape[-2]), 0.0
                else:  # embed / modulation / rel_bias
                    std, base = 0.02, 0.0
                off = (i * 997 + sum(map(ord, mod))) % POOL
                v = fill(pool, tuple(leaf.shape), np.dtype(dtype),
                         jnp.float32(std), jnp.int32(off))
                if base:
                    v = jnp.full(leaf.shape, base, dtype)
                vals.append(v)
            sub_t = tree_unflatten(treedef, vals)
            # hand the pipeline HOST numpy arrays — the same contract
            # load_pipeline_params(to_device=False) produces for offload mode
            sub_t = jax.tree.map(lambda x: np.asarray(x), sub_t)
            n = sum(l.size for _, l in leaves)
            log(f"[synth] {mod}: {n/1e9:.2f}B params in {time.time()-t0:.1f}s")
            out[mod] = sub_t
    return out


def _cache_paths(cache_dir: str, mod: str):
    return (os.path.join(cache_dir, mod), os.path.join(cache_dir, mod,
                                                       "manifest.json"))


def save_params_cache(params, cache_dir: str, log=print):
    """Persist the synthesized host trees as raw per-leaf binary files so
    later runs skip the ~17-minute synthesis. Raw bytes (not .npy): numpy
    can't serialize ml_dtypes (fp8/bf16) descrs; shapes/dtypes go in a
    manifest and the tree structure is rebuilt from jax.eval_shape."""
    import jax

    for mod, sub in params.items():
        d, man_p = _cache_paths(cache_dir, mod)
        os.makedirs(d, exist_ok=True)
        leaves = jax.tree.leaves(sub)
        man = []
        for i, leaf in enumerate(leaves):
            a = np.ascontiguousarray(leaf)
            with open(os.path.join(d, f"{i}.bin"), "wb") as f:
                f.write(a.view(np.uint8).reshape(-1).data)
            man.append({"shape": list(a.shape), "dtype": a.dtype.name})
        with open(man_p, "w") as f:
            json.dump(man, f)
        log(f"[cache] saved {mod}: {len(leaves)} leaves")


def load_params_cache(cfg, cache_dir: str, log=print):
    """Rebuild the host param trees from a save_params_cache dir, memory-
    mapped (leaves page in lazily as device_put streams them)."""
    import jax
    import jax.numpy as jnp
    import ml_dtypes

    from dualforce_tpu.models.factory import init_pipeline_params

    dt = {"float8_e4m3fn": ml_dtypes.float8_e4m3fn,
          "bfloat16": ml_dtypes.bfloat16, "float32": np.float32}
    shapes = jax.eval_shape(
        lambda k: init_pipeline_params(k, cfg, dtype=jnp.bfloat16),
        jax.random.PRNGKey(0))
    out = {}
    for mod, sub in shapes.items():
        d, man_p = _cache_paths(cache_dir, mod)
        if not os.path.exists(man_p):
            return None
        with open(man_p) as f:
            man = json.load(f)
        leaves, treedef = jax.tree_util.tree_flatten(sub)
        if len(man) != len(leaves):
            return None  # stale cache (config changed)
        vals = []
        for i, (m, leaf) in enumerate(zip(man, leaves)):
            # shape must match the CURRENT config (dtype legitimately differs:
            # the cache stores fp8/bf16, eval_shape traces bf16) — a leaf-count
            # match alone would reshape stale bytes into wrong-shaped weights
            if tuple(m["shape"]) != tuple(leaf.shape):
                log(f"[cache] stale ({mod} leaf {i}: {m['shape']} != "
                    f"{list(leaf.shape)}); re-synthesizing")
                return None
            raw = np.memmap(os.path.join(d, f"{i}.bin"), dtype=np.uint8,
                            mode="r")
            vals.append(raw.view(dt[m["dtype"]]).reshape(m["shape"]))
        out[mod] = jax.tree_util.tree_unflatten(treedef, vals)
        log(f"[cache] loaded {mod} (mmap)")
    return out


_QUANT_TOWERS = ("video_dit", "video_dit_2", "audio_dit", "bridge")


def quantize_params_host(sub, log=print):
    """Numpy counterpart of nn.quantize_tree_int8 (same scopes, same
    per-out-channel symmetric scale rule) run entirely on HOST: quantizing
    on-device would stream every tower through the tunnel once per worker
    process (~28 GB at ~120 MB/s) just to throw the result away at exit.
    Bit-compatible with the device path up to np/jnp rounding of absmax."""
    from dualforce_tpu.nn import QUANT_INT8_SCOPES

    def one(w):
        w32 = np.asarray(w).astype(np.float32)
        scale = np.maximum(
            np.abs(w32).max(axis=-2, keepdims=True) / 127.0, 1e-12)
        return np.round(w32 / scale).astype(np.int8), scale.astype(np.float32)

    def walk(node, in_scope):
        if isinstance(node, dict):
            if in_scope and "kernel" in node and np.ndim(node["kernel"]) >= 2:
                w = node["kernel"]
                if np.ndim(w) >= 3:  # scan-stacked [L, in, out]: slice-wise
                    qs = [one(w[i]) for i in range(w.shape[0])]
                    q = np.stack([a for a, _ in qs])
                    s = np.stack([b for _, b in qs])
                else:
                    q, s = one(w)
                out = {"kernel_q": q, "kernel_scale": s}
                if "bias" in node:
                    out["bias"] = np.asarray(node["bias"])
                return out
            return {k: walk(v, in_scope or k in QUANT_INT8_SCOPES)
                    for k, v in node.items()}
        return node

    return walk(sub, False)


def quantize_params_host_int4(sub, group: int = 128, log=print):
    """Numpy counterpart of nn.quantize_tree_int4 (same scopes, same
    grouped-scale packing) run on HOST. int4 packs the flagship video
    tower to ~7.2 GB so it stages fully HBM-RESIDENT under
    offload='component' — no layerwise streaming, which round-5 transport
    experiments showed kills the tunneled client's d2h pool after a single
    sweep at ANY geometry (TRANSPORT_720P.md)."""
    from dualforce_tpu.nn import QUANT_INT8_SCOPES

    def one(w):
        w32 = np.asarray(w).astype(np.float32)
        din, dout = w32.shape
        g = group if din % group == 0 else (din if din % 2 == 0 else 1)
        if din % 2:
            raise ValueError(f"int4 pack needs even in_dim, got {din}")
        wg = w32.reshape(din // g, g, dout)
        scale = np.maximum(np.abs(wg).max(axis=1) / 7.0, 1e-12)
        q = np.clip(np.round(wg / scale[:, None, :]), -7, 7)
        q = (q.reshape(din // 2, 2, dout) + 8.0).astype(np.uint8)
        packed = (q[:, 0, :] << 4) | q[:, 1, :]
        return packed, scale.astype(np.float32)

    def walk(node, in_scope):
        if isinstance(node, dict):
            if in_scope and "kernel" in node and np.ndim(node["kernel"]) >= 2:
                w = node["kernel"]
                if np.ndim(w) >= 3:  # scan-stacked [L, in, out]: slice-wise
                    qs = [one(w[i]) for i in range(w.shape[0])]
                    q = np.stack([a for a, _ in qs])
                    s = np.stack([b for _, b in qs])
                else:
                    q, s = one(w)
                out = {"kernel_q4": q, "kernel_scale4": s}
                if "bias" in node:
                    out["bias"] = np.asarray(node["bias"])
                return out
            return {k: walk(v, in_scope or k in QUANT_INT8_SCOPES)
                    for k, v in node.items()}
        return node

    return walk(sub, False)


def save_tree_cache(params, cache_dir: str, log=print):
    """Path-keyed host-tree cache. Unlike save_params_cache (leaf-indexed
    against jax.eval_shape of the bf16 init), this stores the tree SHAPE
    itself, so structure-changing transforms (int8: kernel -> kernel_q +
    kernel_scale) round-trip. Dict-only trees (all param trees here are)."""
    def flat(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                assert "/" not in str(k)
                yield from flat(v, prefix + (str(k),))
        else:
            yield "/".join(prefix), np.asarray(node)

    for mod, sub in params.items():
        d = os.path.join(cache_dir, mod)
        os.makedirs(d, exist_ok=True)
        man = []
        for i, (path, a) in enumerate(flat(sub, ())):
            a = np.ascontiguousarray(a)
            with open(os.path.join(d, f"{i}.bin"), "wb") as f:
                f.write(a.view(np.uint8).reshape(-1).data)
            man.append({"path": path, "shape": list(a.shape),
                        "dtype": a.dtype.name})
        with open(os.path.join(d, "tree_manifest.json"), "w") as f:
            json.dump(man, f)
        log(f"[cache] saved {mod} (tree): {len(man)} leaves")


def load_tree_cache(cache_dir: str, mods=_QUANT_TOWERS, log=print):
    import ml_dtypes

    dt = {"float8_e4m3fn": ml_dtypes.float8_e4m3fn,
          "bfloat16": ml_dtypes.bfloat16, "float32": np.float32,
          "int8": np.int8, "uint8": np.uint8}
    out = {}
    for mod in mods:
        d = os.path.join(cache_dir, mod)
        man_p = os.path.join(d, "tree_manifest.json")
        if not os.path.exists(man_p):
            return None
        with open(man_p) as f:
            man = json.load(f)
        sub = {}
        for i, m in enumerate(man):
            raw = np.memmap(os.path.join(d, f"{i}.bin"), dtype=np.uint8,
                            mode="r")
            node = sub
            keys = m["path"].split("/")
            for k in keys[:-1]:
                node = node.setdefault(k, {})
            node[keys[-1]] = raw.view(dt[m["dtype"]]).reshape(m["shape"])
        out[mod] = sub
        log(f"[cache] loaded {mod} (tree, mmap)")
    return out


def make_reference_frame(height: int, width: int) -> np.ndarray:
    """Deterministic smooth test card in [-1, 1], [H, W, 3]."""
    y = np.linspace(-1, 1, height, dtype=np.float32)[:, None]
    x = np.linspace(-1, 1, width, dtype=np.float32)[None, :]
    r = np.sin(3.0 * x) * np.cos(2.0 * y)
    g = np.cos(4.0 * x * y)
    b = np.sin(2.0 * x + 3.0 * y)
    return np.stack([r, g, b], axis=-1)


def fetch_via_cpu_backend(v, log=print):
    """Alternative d2h: cross-backend device_put onto the client's own CPU
    backend (the axon plugin registers jax_platforms="axon,cpu" with a
    cross-client transfer shim). Exercises a different transfer path than
    jax.Array.__array__'s direct fetch, which after a full streamed pass
    fails RESOURCE_EXHAUSTED at ANY size."""
    import jax

    cpu = jax.devices("cpu")[0]
    moved = jax.device_put(v, cpu)
    moved.block_until_ready()
    return np.asarray(moved)


class WarmCopiers:
    """Pre-compiled per-shape copy programs (x + 0), warmed at worker start.

    Round-4/5 findings (out/720p/run_r4e.log, run_r4f.log, run_r5probe.log):
    after a 176k-token streamed sweep, cold post-sweep operations fail
    RESOURCE_EXHAUSTED (direct d2h at any size, cross-backend device_put,
    fresh-compiled reshape) while the sweep's own warm executables keep
    executing across steps. io_callback is NOT a workaround: on this tunnel
    a host callback blocks forever even in a FRESH session (round-5 probe —
    the callback return channel apparently doesn't exist through the relay),
    which also reinterprets round-4's "io_callback failed" as the fallback
    never having been viable. What remains controllable: (a) a warm COPY
    program as a post-sweep canary separating execution health from
    transfer health, and (b) patience — the r4 360p runs showed the first
    post-sweep fetch can block ~16 min and then flow; the 720p attempts
    never waited longer than ~10 min of retries."""

    def __init__(self, log=print):
        self._fns = {}
        self._log = log

    @staticmethod
    def _key(shape, dtype):
        return (tuple(shape), str(np.dtype(dtype)))

    def warm(self, shape, dtype):
        import jax
        import jax.numpy as jnp

        key = self._key(shape, dtype)
        if key in self._fns:
            return
        fn = jax.jit(lambda x: x + jnp.zeros((), x.dtype))
        t0 = time.time()
        fn(jnp.zeros(shape, dtype)).block_until_ready()
        self._fns[key] = fn
        self._log(f"[e2e] warm copier {key[1]}{list(shape)} ready "
                  f"({time.time() - t0:.1f}s)", flush=True)

    def copy(self, v):
        """Warm-execute a device-side copy; returns the fresh device array."""
        fn = self._fns[self._key(np.shape(v), v.dtype)]
        out = fn(v)
        out.block_until_ready()
        return out


_SLICE_ELEMS = (262144, 16384, 256)  # 1 MiB / 64 KiB / 1 KiB of f32


class WarmSlicers:
    """Pre-compiled dynamic-slice fetchers + a scalar probe, warmed at
    worker start. Post-sweep the direct whole-leaf (and 1-4 MiB sliced) d2h
    fails RESOURCE_EXHAUSTED at 720p even after 20+ min of patience, but
    warm EXECUTIONS still run (canary) — so the open question is whether a
    small-enough result of a warm execution can still cross. The slicer is
    one warm program per (shape, chunk): x -> dynamic_slice(flat(x), (i,),
    (chunk,)) with i a traced arg (no recompile per offset, start clamped
    in-bounds by dynamic_slice semantics); the scalar probe (sum) tests the
    smallest possible d2h first."""

    def __init__(self, log=print):
        self._slicers = {}
        self._sums = {}
        self._log = log

    @staticmethod
    def _key(shape, dtype):
        return (tuple(shape), str(np.dtype(dtype)))

    def warm(self, shape, dtype):
        import jax
        import jax.numpy as jnp

        key = self._key(shape, dtype)
        if key in self._slicers:
            return
        n = int(np.prod(shape)) if shape else 1
        t0 = time.time()

        @jax.jit
        def _sum(x):
            return jnp.sum(x.astype(jnp.float32))

        _sum(jnp.zeros(shape, dtype)).block_until_ready()
        self._sums[key] = _sum
        fns = {}
        for ch in _SLICE_ELEMS:
            if ch > n:
                continue

            def _slice(x, i, ch=ch):
                import jax.lax as lax
                return lax.dynamic_slice(jnp.reshape(x, (n,)), (i,), (ch,))

            fn = jax.jit(_slice)
            fn(jnp.zeros(shape, dtype), 0).block_until_ready()
            fns[ch] = fn
        self._slicers[key] = fns
        self._log(f"[e2e] warm slicers {key[1]}{list(shape)} ready "
                  f"({time.time() - t0:.1f}s)", flush=True)

    def probe_scalar(self, v):
        """Smallest possible post-sweep d2h: warm-execute sum, fetch the
        scalar. Returns seconds taken (raises on failure)."""
        t0 = time.time()
        s = self._sums[self._key(np.shape(v), v.dtype)](v)
        float(np.asarray(s))
        return time.time() - t0

    def fetch(self, v, chunk_elems: int, log=print):
        """Assemble the whole leaf from warm-sliced chunk_elems fetches."""
        key = self._key(np.shape(v), v.dtype)
        fn = self._slicers[key].get(chunk_elems)
        n = int(np.prod(np.shape(v))) if np.shape(v) else 1
        if fn is None:  # leaf smaller than the chunk: direct tiny fetch
            return np.asarray(v)
        out = np.empty((n,), v.dtype)
        t0 = time.time()
        for off in range(0, n, chunk_elems):
            i = min(off, n - chunk_elems)
            part = np.asarray(fn(v, i))
            out[i:i + chunk_elems] = part
            if off == 0:
                log(f"[e2e]   warm-slice first chunk "
                    f"({chunk_elems * out.itemsize // 1024} KiB) in "
                    f"{time.time() - t0:.1f}s", flush=True)
        return out.reshape(np.shape(v))


class WarmPinners:
    """Pre-compiled per-shape programs whose OUTPUT lives in pinned_host
    memory, warmed (compile + one channel-opening fetch) at worker start.

    Round-5 probe: this axon device exposes ['device', 'pinned_host',
    'unpinned_host'] memories; np.asarray on a pinned_host-resident array
    works and flows at ~20 MB/s after a one-time PER-SESSION channel warmup
    (44-290 s observed on a fresh session). Why this may survive where
    every other post-sweep path dies: the thing that fails after a
    streamed 176k-token sweep is the device->host DMA fetch
    (RESOURCE_EXHAUSTED even for a warm 4-byte scalar), while warm
    EXECUTIONS keep running — and with jit out_shardings carrying
    memory_kind='pinned_host', the device->host movement happens INSIDE
    the (working) execution; the subsequent np.asarray reads host memory
    through the relay without touching the device DMA path. The channel
    warmup fetch must happen BEFORE the sweep, hence warm() at worker
    start like WarmCopiers/WarmSlicers."""

    def __init__(self, log=print):
        self._fns = {}
        self._log = log
        self._channel_open = False

    @staticmethod
    def _key(shape, dtype):
        return (tuple(shape), str(np.dtype(dtype)))

    def warm(self, shape, dtype):
        import jax
        import jax.numpy as jnp
        from jax.sharding import SingleDeviceSharding

        key = self._key(shape, dtype)
        if key in self._fns:
            return
        dev = jax.devices()[0]
        kinds = {m.kind for m in dev.addressable_memories()}
        if "pinned_host" not in kinds:
            raise RuntimeError(f"no pinned_host memory (have {kinds})")
        s_host = SingleDeviceSharding(dev, memory_kind="pinned_host")
        t0 = time.time()
        extra = ""
        if not self._channel_open:
            # open the host-fetch channel with a TINY array: the first
            # pinned_host fetch of a session pays a flat ~44-290 s channel
            # setup regardless of size (round-5 probe), so don't pay it on
            # an 11 MB leaf
            t1 = time.time()
            probe = jax.jit(lambda x: x + 1, out_shardings=s_host)(
                jnp.zeros((8,), jnp.float32))
            probe.block_until_ready()
            np.asarray(probe)
            self._channel_open = True
            extra = f", channel open {time.time() - t1:.1f}s"
        fn = jax.jit(lambda x: x + jnp.zeros((), x.dtype),
                     out_shardings=s_host)
        y = fn(jnp.zeros(shape, dtype))
        y.block_until_ready()
        self._fns[key] = fn
        self._log(f"[e2e] warm pinner {key[1]}{list(shape)} ready "
                  f"({time.time() - t0:.1f}s{extra})", flush=True)

    def fetch(self, v):
        """Warm-execute the copy-to-pinned-host program, then read the
        result out of HOST memory (no device DMA on the fetch)."""
        fn = self._fns[self._key(np.shape(v), v.dtype)]
        y = fn(v)
        y.block_until_ready()
        return np.asarray(y)


def fetch_via_io_callback(v, log=print):
    """Last-resort d2h: pull the array out through a host callback inside a
    jitted program. Callback argument transport rides the EXECUTION
    machinery, which demonstrably still works after heavy streaming (the
    passes themselves complete) even when every direct-fetch path returns
    RESOURCE_EXHAUSTED."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import io_callback

    captured = []

    def sink(x):
        captured.append(np.asarray(x))
        return np.int32(0)

    @jax.jit
    def pull(x):
        return io_callback(sink, jax.ShapeDtypeStruct((), jnp.int32), x,
                           ordered=True)

    pull(v).block_until_ready()
    return captured[0]


def fetch_chunked(v, chunk_mib: int = 16, log=print, attempts: int = 5,
                  backoff_s: float = 120.0):
    """Device->host in bounded slices. One whole-array d2h needs one
    whole-array pinned host buffer in the tunneled-TPU client; after
    prepare_state's ~6 GB of h2d staging that allocation was observed to
    block FOREVER (futex wait, zero IO progress — twice, reproducibly).
    Slicing on device and fetching <=chunk_mib at a time bounds the pinned
    demand to a size the drained pool can always satisfy."""
    import jax.numpy as jnp

    n = int(np.prod(v.shape)) if v.shape else 1
    itemsize = np.dtype(v.dtype).itemsize
    elems = max(1, (chunk_mib << 20) // itemsize)
    if n <= elems:
        # patience also below the slicing threshold: the first post-sweep
        # fetch can block ~15 min on a starved transport (it recovers) or
        # error out fast (retry after a long backoff)
        return _fetch_retry(lambda: np.asarray(v), attempts=attempts,
                            backoff_s=backoff_s, log=log)
    flat = jnp.reshape(v, (n,))
    min_elems = max(1, (1 << 20) // itemsize)  # 1 MiB floor
    parts = []
    a = 0
    while a < n:
        b = min(n, a + elems)
        t0 = time.time()
        try:
            parts.append(_fetch_retry(lambda: np.asarray(flat[a:b]),
                                      attempts=attempts,
                                      backoff_s=backoff_s, log=log))
        except Exception:  # noqa: BLE001
            if elems <= min_elems:
                raise
            # RESOURCE_EXHAUSTED can be a contiguous-chunk limit in the
            # drained pool: halve the slice and re-try the same offset
            elems = max(min_elems, elems // 2)
            log(f"[e2e]   d2h shrinking slices to "
                f"{elems * itemsize / 2**20:.0f} MiB", flush=True)
            continue
        log(f"[e2e]   d2h slice [{a}:{b}) "
            f"{(b - a) * itemsize / 2**20:.0f} MiB in "
            f"{time.time() - t0:.1f}s", flush=True)
        a = b
    return np.concatenate(parts).reshape(v.shape)


def _fetch_retry(fn, attempts: int = 3, backoff_s: float = 60.0, log=print):
    """d2h with retries: the tunnel returns RESOURCE_EXHAUSTED when its
    transfer pool is saturated by earlier h2d streaming (observed live,
    twice); the condition can clear as queued transfers drain, so back off
    and retry before giving up."""
    for k in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — jax runtime errors vary
            if k + 1 == attempts:
                raise
            log(f"[e2e]   d2h failed ({type(e).__name__}: {str(e)[:120]}); "
                f"retry {k + 1}/{attempts - 1} in {backoff_s:.0f}s",
                flush=True)
            time.sleep(backoff_s)


def save_state(state, path: str):
    """Denoise state -> one .npz (arrays) + embedded settings json.

    numpy can't serialize ml_dtypes descrs (bf16/fp8 savez round-trips as
    raw void '|Vn', same issue save_params_cache works around) — custom-
    dtype leaves are stored as uint8 views with their true dtype/shape in
    an embedded manifest so load_state rebuilds them bit-exactly."""
    arrays = {"__settings__": np.frombuffer(
        json.dumps(state["settings"]).encode(), np.uint8),
        "__step__": np.int64(state["step"])}
    meta = {}
    for k, v in state.items():
        if k in ("settings", "step") or v is None:
            continue
        a = np.asarray(v)
        if a.dtype.kind == "V":  # ml_dtypes custom dtype (bf16/fp8)
            meta[k] = {"dtype": a.dtype.name, "shape": list(a.shape)}
            a = np.ascontiguousarray(a).view(np.uint8).reshape(-1)
        arrays[k] = a
    arrays["__meta__"] = np.frombuffer(json.dumps(meta).encode(), np.uint8)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:  # file object: savez won't append .npz
        np.savez(f, **arrays)
    os.replace(tmp, path)


def load_state(path: str):
    import ml_dtypes

    dt = {"bfloat16": ml_dtypes.bfloat16,
          "float8_e4m3fn": ml_dtypes.float8_e4m3fn}
    with np.load(path) as z:
        meta = (json.loads(bytes(z["__meta__"]).decode())
                if "__meta__" in z.files else {})
        state = {"settings": json.loads(bytes(z["__settings__"]).decode()),
                 "step": int(z["__step__"])}
        for k in z.files:
            if k.startswith("__"):
                continue
            a = z[k]
            if k in meta:
                m = meta[k]
                a = a.view(dt[m["dtype"]]).reshape(m["shape"])
            elif a.dtype.kind == "V":
                # state written by an older save_state: the descr was lost
                # in savez; the only 2-byte custom dtype in a state is bf16
                a = a.view(ml_dtypes.bfloat16 if a.dtype.itemsize == 2
                           else ml_dtypes.float8_e4m3fn)
            state[k] = a
    for k in ("ctx_neg", "ctx_len_pos", "ctx_len_neg",
              "neg_cache_v", "neg_cache_a"):
        state.setdefault(k, None)
    return state


def _boundary_step(args) -> int:
    """Expert-switch step for the run's geometry (same derivation as
    orchestrate(): flagship config, sigma shift 5.0)."""
    from dualforce_tpu.config import MOVAConfig
    from dualforce_tpu.diffusion.flow_match import FlowMatchPairScheduler
    from dualforce_tpu.diffusion.sampler import build_plan

    cfg = MOVAConfig()
    sched = FlowMatchPairScheduler(cfg.scheduler)
    sched.set_timesteps(args.steps, shift=5.0)
    return build_plan(sched, cfg.boundary_ratio).boundary_step


def pass_schedule(steps: int, cache_interval: int, boundary: int,
                  use_cfg: bool = True):
    """Per-step forward-pass counts under cache carry: pos pass always, neg
    pass on the cache cadence (i % k == 0) and whenever the cache is empty —
    at step 0 and at the expert switch (pipeline resets it there)."""
    counts = []
    cached = False
    for i in range(steps):
        if i == boundary:
            cached = False
        c = 1
        if use_cfg and (not cached or cache_interval <= 1
                        or i % cache_interval == 0):
            c += 1
            cached = True
        counts.append(c)
    return counts


def split_chunks(counts, max_passes: int):
    """Greedy [a, b) step ranges with at most max_passes forward passes."""
    chunks = []
    a, acc = 0, 0
    for i, c in enumerate(counts):
        if acc and acc + c > max_passes:
            chunks.append((a, i))
            a, acc = i, 0
        acc += c
    chunks.append((a, len(counts)))
    return chunks


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--num_frames", type=int, default=193)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--cfg_cache_interval", type=int, default=3)
    ap.add_argument("--group_size", type=int, default=4)
    ap.add_argument("--attn_type", type=str, default="auto")
    ap.add_argument("--quant", type=str, default="none",
                    choices=["none", "int8", "int4"],
                    help="int8 pre-quantizes DiT/bridge projections on HOST "
                         "(w8a8 serving mode, composes with --attn_type "
                         "sage); int4 packs the VIDEO TOWER projections to "
                         "0.5 byte/param (weights-only, grouped scales) so "
                         "a 14.3B expert stages fully HBM-resident under "
                         "--offload component; both cached next to "
                         "--params_cache as <params_cache>_<quant>")
    ap.add_argument("--offload", type=str, default="group",
                    choices=["group", "component", "none"],
                    help="pipeline weight residency: 'group' = layerwise "
                         "streamed (reference 12 GB-VRAM mode; chunked "
                         "workers), 'component' = whole-module bulk "
                         "staging (use with --quant int4 so the active "
                         "tower fits; single process, --chunk_passes 0), "
                         "'none' = everything resident")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--output", type=str, default="out/720p/e2e.mp4")
    ap.add_argument("--params_cache", type=str, default=None,
                    help="dir to save/load the synthesized host params "
                         "(skips the ~17 min synthesis on later runs)")
    ap.add_argument("--resident_small", action="store_true",
                    help="keep audio tower + bridge HBM-resident; stream "
                         "only the video tower (~22%% less h2d per pass)")
    ap.add_argument("--resident_groups", "--offload_resident_groups",
                    type=int, default=0,
                    help="pin the first N video layer groups in HBM across "
                         "passes (partial residency: N x group-bytes HBM "
                         "for N/num_groups less video h2d per pass)")
    ap.add_argument("--vae_encode_dtype", type=str, default="bf16",
                    help="VAE encoder compute dtype; f32 needs ~18 GB HBM "
                         "at 720p (OOM on a 16 GB v5e), bf16 fits")
    ap.add_argument("--chunk_align_refresh", action="store_true",
                    help="chunked mode: split the denoise at CFG-cache "
                         "refresh boundaries (i %% cache_interval == 0, the "
                         "expert switch, the end) so no worker ever has to "
                         "transport the negative cache — the post-pass d2h "
                         "path degrades to ~0.1 MB/s on this tunnel, so "
                         "minimizing transported bytes beats minimizing "
                         "per-process passes")
    ap.add_argument("--chunk_passes", type=int, default=3,
                    help="max streamed forward passes per PROCESS: the "
                         "tunneled-TPU client pins a host copy of every "
                         "h2d transfer (~18 GB/pass at 720p, measured), so "
                         "the denoise runs in subprocess chunks with the "
                         "state checkpointed between them (bit-identical to "
                         "one process — tested). 0 = single process")
    ap.add_argument("--state_dir", type=str, default=None,
                    help="where chunked mode keeps state.npz (default: "
                         "alongside --output)")
    ap.add_argument("--compile_cache", type=str, default=None,
                    help="jax persistent compilation cache dir (default: "
                         "<state_dir>/compile_cache) — chunk workers after "
                         "the first then skip the ~200 s 720p compile")
    ap.add_argument("--chunk_refresh_multiple", type=int, default=1,
                    help="with --chunk_align_refresh: split at every Nth "
                         "refresh boundary instead of every one (bigger "
                         "chunks, fewer post-sweep fetch gauntlets; still "
                         "never carries the negative cache)")
    ap.add_argument("--fetch_quiet_s", type=float, default=0.0,
                    help="sleep this long after the sweep before the first "
                         "post-sweep d2h (the relay's transfer quota "
                         "recovers over ~10-20 min after bulk staging)")
    ap.add_argument("--fetch_attempts", type=int, default=5,
                    help="retries per post-sweep d2h slice")
    ap.add_argument("--fetch_backoff_s", type=float, default=120.0,
                    help="backoff between post-sweep d2h retries")
    ap.add_argument("--resume", action="store_true",
                    help="chunked mode: reuse an existing e2e_state.npz for "
                         "the same recipe (skips prepare and finished steps) "
                         "instead of starting over")
    ap.add_argument("--fetch_every_step", action="store_true",
                    help="workers fetch+save the mutated state after EVERY "
                         "scheduler step instead of once per chunk: the "
                         "post-sweep d2h pool dies as staged volume "
                         "accumulates (round-5: hard-dead after 4 passes "
                         "at 360p, while the ~6 GiB prepare fetch works), "
                         "so fetching after each step's 1-2 passes keeps "
                         "progress monotonic — a dead pool costs ONE step, "
                         "and the CFG cache is carried so resume stays "
                         "bit-identical")
    ap.add_argument("--worker_range", type=str, default=None,
                    help=argparse.SUPPRESS)  # internal: chunk worker "a:b"
    ap.add_argument("--worker_finalize", action="store_true",
                    help=argparse.SUPPRESS)  # internal: decode+mux worker
    ap.add_argument("--dry", action="store_true",
                    help="tiny config on CPU — code-path smoke test")
    args = ap.parse_args()

    if args.chunk_passes > 0 and not (args.worker_range
                                      or args.worker_finalize or args.dry):
        return orchestrate(args)

    if args.dry:
        # force, not setdefault: the axon image pre-sets JAX_PLATFORMS=axon,
        # and a "dry" smoke run must never grab the real chip
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    if args.dry:
        # the axon sitecustomize re-asserts its platform in-process after
        # jax import, so the env var alone is not enough (same workaround
        # as __graft_entry__._force_virtual_cpu)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    if not args.dry:
        from dualforce_tpu.utils.misc import setup_compile_cache

        cache_dir = args.compile_cache or os.path.join(
            args.state_dir or (os.path.dirname(args.output) or "."),
            "compile_cache")
        setup_compile_cache(cache_dir)

    from dualforce_tpu.config import MOVAConfig
    from dualforce_tpu.diffusion.pipeline import MOVAPipeline
    from dualforce_tpu.utils.av_io import save_video_with_audio
    from dualforce_tpu.utils.misc import hbm_in_use_gb

    if args.dry:
        from dualforce_tpu.config import tiny_test_config

        cfg = tiny_test_config()
        args.height, args.width = 64, 64
        args.num_frames, args.steps = 9, 2
        args.group_size = 1
        if args.output == "out/720p/e2e.mp4":  # don't shadow a real clip
            args.output = "out/dry_e2e.avi"
    else:
        cfg = MOVAConfig()  # constructor defaults = flagship geometry

    timings = {}
    t0 = time.time()
    params = None
    if args.params_cache:
        params = load_params_cache(cfg, args.params_cache)
    if params is None:
        params = synthesize_params(cfg, fp8=not args.dry)
        if args.params_cache:
            save_params_cache(params, args.params_cache)
    timings["synthesize_params_s"] = round(time.time() - t0, 1)
    if args.quant != "none":
        t0 = time.time()
        # int8: all four towers (w8a8 compute win). int4: the two video
        # experts only — the point is fitting a 14.3B tower in HBM; audio +
        # bridge (~4 GB fp8) stay resident at full fidelity
        mods = (_QUANT_TOWERS if args.quant == "int8"
                else ("video_dit", "video_dit_2"))
        qfn = (quantize_params_host if args.quant == "int8"
               else quantize_params_host_int4)
        qdir = (f"{args.params_cache}_{args.quant}"
                if args.params_cache else None)
        qp = load_tree_cache(qdir, mods=mods) if qdir else None
        if qp is None:
            qp = {m: qfn(params[m]) for m in mods}
            if qdir:
                save_tree_cache(qp, qdir)
                qp = load_tree_cache(qdir, mods=mods)  # mmap-backed leaves
        params.update(qp)
        timings[f"quantize_{args.quant}_s"] = round(time.time() - t0, 1)
        print(f"[e2e] {args.quant} tower kernels ready "
              f"({timings[f'quantize_{args.quant}_s']}s)")
    host_gb = sum(l.size * l.dtype.itemsize
                  for l in jax.tree.leaves(params)) / 2**30
    print(f"[e2e] host-resident params: {host_gb:.1f} GiB "
          f"({timings['synthesize_params_s']}s)")

    tok = build_tokenizer(cfg.text_encoder.vocab_size)
    pipe = MOVAPipeline(cfg, params, tokenizer=tok,
                        attn_impl=args.attn_type, offload=args.offload,
                        offload_group_size=args.group_size,
                        offload_resident_small=args.resident_small,
                        offload_resident_video_groups=args.resident_groups,
                        vae_encode_dtype=args.vae_encode_dtype)

    state_dir = args.state_dir or (os.path.dirname(args.output) or ".")
    os.makedirs(state_dir, exist_ok=True)
    state_path = os.path.join(state_dir, "e2e_state.npz")
    steps_log = os.path.join(state_dir, "e2e_steps.jsonl")

    step_times = []
    # run-id disambiguates interleaved attempts in a shared steps log
    # (abandoned runs' lines were indistinguishable before — VERDICT r4
    # weak #5); wall-clock id, stable within this process
    run_id = f"{int(time.time())}-{os.getpid()}"

    def _progress(step, total):
        now = time.time()
        # dt unknown until a reference point exists (workers set .last just
        # before denoise so their first step is real wall incl. compile)
        dt = round(now - _progress.last, 2) if _progress.last else None
        _progress.last = now
        if dt is not None:
            step_times.append(dt)
        print(f"[e2e] step {step}/{total} ({dt or 0:.1f}s)", flush=True)
        with open(steps_log, "a") as f:
            f.write(json.dumps({"step": step, "dt_s": dt,
                                "run": run_id}) + "\n")

    _progress.last = None
    pipe.progress_cb = _progress

    frame = make_reference_frame(args.height, args.width)
    prompt = ("tok1 tok2 tok3 a calm ocean at sunset, gentle waves, "
              "seagulls calling")
    gen_kw = dict(height=args.height, width=args.width,
                  num_frames=args.num_frames,
                  num_inference_steps=args.steps,
                  cfg_cache_interval=args.cfg_cache_interval)

    def summarize(result, out, extra_timings):
        return {
            "metric": f"mova{'720p' if args.height >= 700 else '360p'}_e2e",
            "geometry": f"{args.width}x{args.height}x{args.num_frames}",
            "steps": args.steps,
            "cfg_cache_interval": args.cfg_cache_interval,
            "offload": (f"group:{args.group_size}"
                        + (":resident_small" if args.resident_small else "")
                        + (f":resident_groups={args.resident_groups}"
                           if args.resident_groups else "")
                        if args.offload == "group" else args.offload),
            "attn": args.attn_type,
            "quant": args.quant,
            "weight_storage": (
                "bf16" if args.dry else
                "int4(g128) video-tower projections + fp8(e4m3)/bf16 rest"
                if args.quant == "int4"
                else "fp8(e4m3) kernels + bf16 rest"),
            "host_params_gib": round(host_gb, 1),
            "video_shape": list(np.asarray(result.video).shape),
            "audio_samples": int(np.asarray(result.audio).shape[-1]),
            "output": out,
            "backend": jax.devices()[0].platform,
            "timings": dict(timings, **extra_timings),
            "step_times_s": step_times,
        }

    if args.worker_range:
        a, b = (int(x) for x in args.worker_range.split(":"))
        fresh = a == 0 and not os.path.exists(state_path)
        if fresh:
            t0 = time.time()
            state = pipe.prepare_state([prompt], [frame], seeds=[args.seed],
                                       **gen_kw)
            print(f"[e2e] prepare_state: {time.time() - t0:.1f}s", flush=True)
        else:
            state = load_state(state_path)
        print(f"[e2e] worker steps [{a}, {b}) of {args.steps} "
              f"backend={jax.devices()[0].platform}", flush=True)
        mutated = {"latents", "audio_latents", "neg_cache_v", "neg_cache_a"}
        k_int = args.cfg_cache_interval
        per_step = (args.fetch_every_step
                    or os.environ.get("DF_E2E_FETCH_EVERY_STEP") == "1")
        cache_dead = (b >= args.steps or b == _boundary_step(args)
                      or k_int <= 1 or b % k_int == 0)
        copiers = slicers = pinners = None
        if b > a and not fresh:
            # warm per-shape copy/slice/pin programs NOW, while the session
            # is fresh: post-sweep they are pure warm executions
            # (WarmCopiers / WarmSlicers / WarmPinners docstrings)
            copiers, slicers = WarmCopiers(), WarmSlicers()
            try:
                for leaf in ("latents", "audio_latents"):
                    v = state[leaf]
                    copiers.warm(np.shape(v), v.dtype)
                    slicers.warm(np.shape(v), v.dtype)
                    if per_step or not cache_dead:  # carried caches are f32
                        copiers.warm(np.shape(v), np.float32)
                        slicers.warm(np.shape(v), np.float32)
            except Exception as e:  # noqa: BLE001
                print(f"[e2e] warm-fetch setup failed ({type(e).__name__}); "
                      f"cold transports only", flush=True)
                copiers = slicers = None
            if os.environ.get("DF_E2E_PINNED_FETCH", "0") == "1":
                # opt-in: standalone round-5 probes showed pinned_host
                # fetches flow at ~20 MB/s after a one-time channel open of
                # 44-290 s, but INSIDE a worker (post-staging) even a
                # 32-byte channel-open fetch blocked >12 min — so the
                # pinned path only runs when explicitly requested (the
                # 720p transport experiments), never on the 360p critical
                # path where warm-slice is proven
                try:
                    pinners = WarmPinners()
                    for leaf in ("latents", "audio_latents"):
                        v = state[leaf]
                        pinners.warm(np.shape(v), v.dtype)
                        if not cache_dead:
                            pinners.warm(np.shape(v), np.float32)
                except Exception as e:  # noqa: BLE001
                    print(f"[e2e] warm-pinner setup failed "
                          f"({type(e).__name__}: {str(e)[:120]})", flush=True)
                    pinners = None
        t0 = time.time()
        _progress.last = t0  # first step's dt = real wall incl. compile
        start = int(state.get("step", a))  # may be mid-chunk (per-step saves)
        if per_step and not fresh:
            # per-step fetch+save (see --fetch_every_step help): the state
            # after each step is pulled through the warm machinery while
            # the d2h pool is still young and persisted immediately; the
            # CFG cache is carried (except where the next step refreshes
            # it) so a resume from ANY step is bit-identical
            boundary = _boundary_step(args)
            base_keep = dict(load_state(state_path))

            def _save_step(st, cur):
                drop = (cur >= args.steps or cur == boundary
                        or k_int <= 1 or cur % k_int == 0)
                keys = ["latents", "audio_latents"]
                if not drop and st.get("neg_cache_v") is not None:
                    keys += ["neg_cache_v", "neg_cache_a"]
                outd = dict(base_keep)
                t1 = time.time()
                for kk in sorted(keys, key=lambda kk: int(
                        np.prod(np.shape(st[kk])))):
                    got = None
                    if slicers is not None:
                        for ch in _SLICE_ELEMS:
                            try:
                                got = slicers.fetch(st[kk], ch)
                                break
                            except Exception:  # noqa: BLE001
                                continue
                    if got is None:
                        got = fetch_chunked(st[kk], chunk_mib=4,
                                            attempts=2, backoff_s=45.0)
                    outd[kk] = got
                if drop:
                    outd["neg_cache_v"] = outd["neg_cache_a"] = None
                for kk, vv in st.items():
                    if kk in ("settings", "step") or vv is None:
                        outd[kk] = vv
                save_state(outd, state_path)
                print(f"[e2e] step {cur} state saved "
                      f"({time.time() - t1:.1f}s fetch"
                      f"{', cache dropped' if drop else ''})", flush=True)

            cur = start
            while cur < b:
                state = pipe.denoise_state(state, max_steps=1)
                cur = int(state["step"])
                try:
                    _save_step(state, cur)
                except Exception as e:  # noqa: BLE001
                    print(f"[e2e] per-step fetch died at step {cur} "
                          f"({type(e).__name__}: {str(e)[:120]}); progress "
                          f"saved through step {cur - 1}", flush=True)
                    sys.exit(3)
            print(f"[e2e] worker [{a}, {b}): {time.time() - t0:.1f}s  "
                  f"HBM in use {hbm_in_use_gb():.1f} GB (per-step saves)",
                  flush=True)
            return
        state = pipe.denoise_state(state, max_steps=b - start)
        print(f"[e2e] worker [{a}, {b}): {time.time() - t0:.1f}s  "
              f"HBM in use {hbm_in_use_gb():.1f} GB", flush=True)
        # Post-worker d2h is the fragile operation on the tunneled client
        # (after tens of GB of h2d weight streaming, even small fetches were
        # observed to wedge), so fetch the MINIMUM: constant leaves
        # (condition, ctx_*) are already on disk from prepare — only the
        # keys the denoise mutates come back, and the CFG negative cache is
        # dropped entirely when the next chunk's first step refreshes it
        # anyway (i % cache_interval == 0, the boundary reset, or the end).
        if cache_dead:
            mutated -= {"neg_cache_v", "neg_cache_a"}
            state["neg_cache_v"] = state["neg_cache_a"] = None
            print("[e2e] negative cache not carried (next step refreshes)",
                  flush=True)
        if copiers is not None:
            # canary BEFORE any teardown (clear_caches would evict the warm
            # executables): does a warm execution still run post-sweep?
            try:
                t1 = time.time()
                fresh_copy = copiers.copy(state["audio_latents"])
                print(f"[e2e] post-sweep warm-exec canary OK "
                      f"({time.time() - t1:.1f}s)", flush=True)
                state["audio_latents"] = fresh_copy  # fetch a FRESH buffer
            except Exception as e:  # noqa: BLE001
                print(f"[e2e] post-sweep warm-exec canary FAILED "
                      f"({type(e).__name__}: {str(e)[:160]})", flush=True)
        if pinners is not None:
            # FIRST CHOICE: move state device->pinned_host inside a warm
            # execution, fetch from host memory (WarmPinners docstring) —
            # the only path that does not touch the post-sweep device DMA
            try:
                out = dict(load_state(state_path))
                for k in sorted(
                        (k for k in mutated if state.get(k) is not None),
                        key=lambda k: int(np.prod(np.shape(state[k])))):
                    t1 = time.time()
                    got = pinners.fetch(state[k])
                    out[k] = got
                    print(f"[e2e] pinned-host fetch {k}: "
                          f"{got.nbytes / 2**20:.1f} MiB in "
                          f"{time.time() - t1:.1f}s", flush=True)
                for k, v in state.items():
                    if k in ("settings", "step") or v is None:
                        out[k] = v
                save_state(out, state_path)
                print(f"[e2e] state saved (pinned-host) -> {state_path}",
                      flush=True)
                return
            except Exception as e:  # noqa: BLE001
                print(f"[e2e] pinned-host fetch failed "
                      f"({type(e).__name__}: {str(e)[:160]}); falling back "
                      f"to warm-slice", flush=True)
        if slicers is not None:
            # smallest possible d2h first: if even a warm scalar can't
            # cross, no slice size will
            try:
                dt = slicers.probe_scalar(state["latents"])
                print(f"[e2e] post-sweep scalar d2h OK ({dt:.1f}s)",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"[e2e] post-sweep scalar d2h FAILED "
                      f"({type(e).__name__}: {str(e)[:160]})", flush=True)
                slicers = None
        if slicers is not None:
            try:
                out = dict(load_state(state_path))
                for k in sorted(
                        (k for k in mutated if state.get(k) is not None),
                        key=lambda k: int(np.prod(np.shape(state[k])))):
                    t1 = time.time()
                    got = None
                    for ch in _SLICE_ELEMS:
                        try:
                            got = slicers.fetch(state[k], ch)
                            break
                        except Exception as e:  # noqa: BLE001
                            print(f"[e2e] warm-slice {k} at {ch} elems "
                                  f"failed ({type(e).__name__})", flush=True)
                    if got is None:
                        raise RuntimeError(f"all warm-slice sizes failed "
                                           f"for {k}")
                    out[k] = got
                    print(f"[e2e] warm-slice {k}: "
                          f"{got.nbytes / 2**20:.1f} MiB in "
                          f"{time.time() - t1:.1f}s", flush=True)
                for k, v in state.items():
                    if k in ("settings", "step") or v is None:
                        out[k] = v
                save_state(out, state_path)
                print(f"[e2e] state saved (warm-slice) -> {state_path}",
                      flush=True)
                return
            except Exception as e:  # noqa: BLE001
                print(f"[e2e] warm-slice fetch failed "
                      f"({type(e).__name__}: {str(e)[:160]}); falling back "
                      f"to cold transports", flush=True)
        if args.fetch_quiet_s > 0:
            # let the relay's transfer quota replenish before the first d2h
            # (measured: the uplink throttles after bulk staging volume and
            # recovers over ~10-20 min; immediate retries keep failing)
            print(f"[e2e] quiet period {args.fetch_quiet_s:.0f}s before "
                  f"state fetch", flush=True)
            time.sleep(args.fetch_quiet_s)
        # Settle the device before fetching. Drop EVERYTHING the fetch does
        # not need: the pipeline (host trees + jitted callables), then the
        # executable caches — at 176k tokens the streamed-pass programs are
        # enormous, and unloading them releases device program space and
        # whatever the remote proxy holds per loaded executable. Without
        # this, every post-pass transfer mechanism tried (whole-leaf,
        # 4/2/1 MiB slices, cross-backend device_put) failed
        # RESOURCE_EXHAUSTED.
        import gc

        del pipe
        gc.collect()
        jax.clear_caches()
        gc.collect()
        time.sleep(10.0)
        try:
            stats = jax.devices()[0].memory_stats() or {}
            print(f"[e2e] pre-fetch memory_stats: "
                  f"{ {k: v for k, v in stats.items() if 'bytes' in k} }",
                  flush=True)
        except Exception:  # noqa: BLE001
            pass
        # d2h leaf-by-leaf, in bounded slices, with progress: a hung tunnel
        # transfer must name the array (and slice) it hung on (observed:
        # >10 min futex-wait saving a ~100 MB state with zero IO progress)
        out = dict(load_state(state_path)) if not fresh else {}
        # smallest leaves first: the first post-pass fetch "pushes through"
        # the degraded transfer path (observed: first fetch ~0.1 MB/s,
        # repro'd), so pathfind with the 0.2 MiB audio latents, not the
        # 45 MiB video latents
        order = sorted(
            state.keys(),
            key=lambda k: (0 if k in ("settings", "step")
                           or state[k] is None
                           else int(np.prod(np.shape(state[k])))))
        for k in order:
            v = state[k]
            if k in ("settings", "step") or v is None:
                out[k] = v
                continue
            if not fresh and k not in mutated:
                continue  # constant leaf: keep the on-disk copy
            t1 = time.time()
            # Small slices with PATIENCE: the post-pass d2h path degrades to
            # ~0.1 MB/s on this tunnel (measured: 40 MiB in 357 s) and can
            # also throw RESOURCE_EXHAUSTED; fetch_chunked retries each
            # slice and shrinks on error. Cross-backend and io_callback
            # transports remain as whole-leaf fallbacks.
            try:
                out[k] = fetch_chunked(v, chunk_mib=4,
                                       attempts=args.fetch_attempts,
                                       backoff_s=args.fetch_backoff_s)
            except Exception as e:  # noqa: BLE001
                # NOT io_callback: host callbacks block forever on this
                # tunnel (round-5 probe), turning a failed worker into a
                # timed-out one
                print(f"[e2e] sliced fetch of {k} failed "
                      f"({type(e).__name__}); trying cpu-backend",
                      flush=True)
                out[k] = fetch_via_cpu_backend(v)
            state[k] = v = None  # release the device buffer before the next
            print(f"[e2e] d2h {k}: {out[k].nbytes / 2**20:.1f} MiB "
                  f"in {time.time() - t1:.1f}s", flush=True)
        save_state(out, state_path)
        print(f"[e2e] state saved -> {state_path}", flush=True)
        return

    if args.worker_finalize:
        state = load_state(state_path)
        t0 = time.time()
        result = pipe.finalize_state(state)[0]
        timings["decode_s"] = round(time.time() - t0, 1)
        t0 = time.time()
        out = save_video_with_audio(args.output, result.video, result.audio,
                                    fps=result.fps,
                                    sample_rate=result.sample_rate)
        timings["mux_s"] = round(time.time() - t0, 1)
        if os.path.exists(steps_log):
            with open(steps_log) as f:
                step_times[:] = [d for ln in f if ln.strip()
                                 for d in [json.loads(ln)["dt_s"]]
                                 if d is not None]
        summary = summarize(result, out, {})
        with open(os.path.join(state_dir, "e2e_summary.json"), "w") as f:
            json.dump(summary, f)
        print(json.dumps(summary))
        return

    print(f"[e2e] generating {args.width}x{args.height} x{args.num_frames}f "
          f"steps={args.steps} cfg_cache={args.cfg_cache_interval} "
          f"group={args.group_size} backend={jax.devices()[0].platform}")
    t0 = time.time()
    result = pipe(prompt=prompt, image=frame, negative_prompt="",
                  seed=args.seed, **gen_kw)
    timings["generate_s"] = round(time.time() - t0, 1)
    print(f"[e2e] generate: {timings['generate_s']}s  "
          f"HBM in use {hbm_in_use_gb():.1f} GB")

    t0 = time.time()
    out = save_video_with_audio(args.output, result.video, result.audio,
                                fps=result.fps,
                                sample_rate=result.sample_rate)
    timings["mux_s"] = round(time.time() - t0, 1)
    summary = summarize(result, out, {})
    with open(os.path.join(state_dir, "e2e_summary.json"), "w") as f:
        json.dump(summary, f)
    print(json.dumps(summary))


def orchestrate(args):
    """Parent: split the denoise into <=chunk_passes-pass subprocesses (the
    tunnel client's per-transfer host pinning dies with each process), then
    a finalize subprocess for decode+mux. Bit-identical to one process: the
    CFG negative cache rides in the checkpointed state."""
    import subprocess

    from dualforce_tpu.config import MOVAConfig
    from dualforce_tpu.diffusion.flow_match import FlowMatchPairScheduler
    from dualforce_tpu.diffusion.sampler import build_plan

    cfg = MOVAConfig()
    sched = FlowMatchPairScheduler(cfg.scheduler)
    sched.set_timesteps(args.steps, shift=5.0)
    boundary = build_plan(sched, cfg.boundary_ratio).boundary_step
    counts = pass_schedule(args.steps, args.cfg_cache_interval, boundary)
    if args.chunk_align_refresh:
        k_int = max(1, args.cfg_cache_interval) * max(
            1, args.chunk_refresh_multiple)
        bounds = sorted({s for s in range(1, args.steps)
                         if s % k_int == 0 or s == boundary}
                        | {args.steps})
        chunks, a = [], 0
        for b in bounds:
            chunks.append((a, b))
            a = b
    else:
        chunks = split_chunks(counts, args.chunk_passes)

    state_dir = args.state_dir or (os.path.dirname(args.output) or ".")
    os.makedirs(state_dir, exist_ok=True)
    done_steps, have_state = 0, False
    if args.resume and os.path.exists(os.path.join(state_dir,
                                                   "e2e_state.npz")):
        st = load_state(os.path.join(state_dir, "e2e_state.npz"))
        if st["settings"]["num_inference_steps"] == args.steps:
            done_steps, have_state = int(st["step"]), True
            print(f"[e2e] resuming from saved state at step {done_steps}",
                  flush=True)
        else:
            print("[e2e] saved state is for a different recipe; restarting",
                  flush=True)
    if have_state:
        # drop per-step timings from abandoned attempts at steps being redone
        sl = os.path.join(state_dir, "e2e_steps.jsonl")
        if os.path.exists(sl):
            with open(sl) as f:
                keep = [ln for ln in f if ln.strip()
                        and json.loads(ln)["step"] <= done_steps]
            with open(sl, "w") as f:
                f.writelines(keep)
    if not have_state:
        for p in ("e2e_state.npz", "e2e_steps.jsonl", "e2e_summary.json"):
            if os.path.exists(os.path.join(state_dir, p)):
                os.remove(os.path.join(state_dir, p))

    if not args.params_cache:
        # each worker is a fresh process; without a cache every one would
        # re-synthesize the 38.8B-param tree (~17 min) — worker 1 fills
        # this dir, the rest mmap it
        args.params_cache = os.path.join(state_dir, "params_cache")

    base = [sys.executable, os.path.abspath(__file__),
            "--state_dir", state_dir] + [
        f for pair in (
            ("--height", args.height), ("--width", args.width),
            ("--num_frames", args.num_frames), ("--steps", args.steps),
            ("--cfg_cache_interval", args.cfg_cache_interval),
            ("--group_size", args.group_size),
            ("--attn_type", args.attn_type), ("--quant", args.quant),
            ("--offload", args.offload),
            ("--seed", args.seed),
            ("--output", args.output),
            ("--vae_encode_dtype", args.vae_encode_dtype),
            ("--fetch_quiet_s", args.fetch_quiet_s),
            ("--fetch_attempts", args.fetch_attempts),
            ("--fetch_backoff_s", args.fetch_backoff_s))
        for f in (pair[0], str(pair[1]))]
    if args.params_cache:
        base += ["--params_cache", args.params_cache]
    if args.resident_small:
        base += ["--resident_small"]
    if args.resident_groups:
        base += ["--resident_groups", str(args.resident_groups)]
    if args.fetch_every_step:
        base += ["--fetch_every_step"]

    # prepare_state runs in its OWN worker: prompt/VAE-encode staging pins
    # host copies of every module it stages, and adding denoise passes on
    # top of that overflowed the tunnel client's pinned-buffer pool
    # (observed: RESOURCE_EXHAUSTED on the state d2h after 3 streamed
    # passes + prepare in one process)
    if have_state:
        # prepare already on disk; keep only the not-yet-done step ranges
        chunks = [(max(a, done_steps), b) for a, b in chunks
                  if b > done_steps]
    else:
        chunks = [(0, 0)] + chunks

    total_passes = sum(counts)
    n_workers = sum(1 for a, b in chunks if b > a)
    print(f"[e2e] chunked run: {'resume' if have_state else 'prepare'} + "
          f"{n_workers} denoise workers + finalize ({total_passes} passes, "
          f"boundary step {boundary}, chunks {chunks})", flush=True)
    t0 = time.time()

    def _disk_step():
        p = os.path.join(state_dir, "e2e_state.npz")
        try:
            return int(load_state(p)["step"])
        except Exception:  # noqa: BLE001
            return -1

    def run_retry(argv, what, timeout_s=5400.0):
        # a worker that dies on a saturated tunnel (RESOURCE_EXHAUSTED on
        # the state d2h) is safely re-runnable: the on-disk state is only
        # replaced at the end (or advances monotonically per step under
        # --fetch_every_step, where a relaunch resumes mid-chunk). The
        # timeout guards against the other observed failure mode: a d2h
        # that wedges forever with no progress. An attempt that ADVANCED
        # the on-disk step does not consume the retry budget.
        k, last = 0, _disk_step()
        while k < 4:
            try:
                rc = subprocess.run(argv, timeout=timeout_s).returncode
            except subprocess.TimeoutExpired:
                rc = "timeout"
            if rc == 0:
                return
            now = _disk_step()
            if now > last:
                print(f"[e2e] {what} rc={rc} but advanced to step {now}; "
                      f"retry budget reset", flush=True)
                last, k = now, 0
            else:
                k += 1
                print(f"[e2e] {what} failed rc={rc} "
                      f"(attempt {k}/4)", flush=True)
            # a transport-failed worker leaves the relay's d2h pool
            # drained; observed recovery time is minutes, not seconds
            time.sleep(240.0)
        raise SystemExit(f"{what} failed after 4 attempts")

    # patient-fetch settings extend the per-worker kill timeout
    worker_tmo = (5400.0 + args.fetch_quiet_s
                  + 2 * args.fetch_attempts * args.fetch_backoff_s)
    worker_walls, breather_s = [], 0.0
    for ci, (a, b) in enumerate(chunks):
        if ci:
            # transport-breather: the session tunnel throttles after bulk
            # volume (measured: relay drains at ~1 KB/s when drained);
            # give the quota a moment to replenish between workers
            time.sleep(120.0)
            breather_s += 120.0
        t1 = time.time()
        run_retry(base + ["--worker_range", f"{a}:{b}"],
                  f"worker [{a}, {b})", timeout_s=worker_tmo)
        worker_walls.append(round(time.time() - t1, 1))
    t1 = time.time()
    run_retry(base + ["--worker_finalize"], "finalize worker")
    finalize_wall = round(time.time() - t1, 1)
    with open(os.path.join(state_dir, "e2e_summary.json")) as f:
        summary = json.load(f)
    tm = summary["timings"]
    tm["wall_total_s"] = round(time.time() - t0, 1)
    # transport-stall attribution (VERDICT r4 weak #1): worker wall beyond
    # the measured step times is tunnel transport (weight restreaming
    # quota stalls + post-sweep state-fetch patience), not compute
    tm["worker_walls_s"] = worker_walls
    tm["finalize_wall_s"] = finalize_wall
    tm["breather_s"] = round(breather_s, 1)
    steps_sum = sum(d for d in summary.get("step_times_s", []) if d)
    tm["transport_stall_s"] = round(
        max(0.0, sum(worker_walls[1:]) - steps_sum), 1)
    summary["chunked"] = {"chunk_passes": args.chunk_passes,
                          "workers": len(chunks)}
    with open(os.path.join(state_dir, "e2e_summary.json"), "w") as f:
        json.dump(summary, f)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
