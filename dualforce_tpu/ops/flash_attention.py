"""Pallas TPU flash attention (forward + backward).

TPU-native replacement for the reference's flash-attn 2/3 CUDA kernels
(wan_video_dit.py:18-91). Non-causal, head_dim a multiple of 128 (MXU lane
width), bf16 inputs with fp32 accumulation, optional per-batch kv-length
masking (batched serving with padded text contexts).

Covers all MOVA attention shapes:
  - video self-attn:   Sq = Sk ≈ 43k (360p) / 170k (720p), D=128
  - text cross-attn:   Sq ≈ 43k, Sk = 512
  - bridge cross-attn: asymmetric 43k↔403 (the 403-token side falls back to
    XLA attention in the dispatcher — too small to tile)

Design: grid (B*N, num_q_blocks, num_k_blocks), sequential minor-most k axis;
online-softmax state (m, l, acc) lives in VMEM scratch across k iterations.
Backward splits into a dq kernel (k minor) and a dkv kernel (q minor), with
per-row logsumexp saved by the forward and delta = rowsum(dO*O) computed in
XLA (cheap elementwise).

VPU economy (the kernel is VPU-bound at ~1.3 transcendental + compare ops per
score element, not MXU-bound): the softmax scale is folded into q together
with log2(e) so the inner loop runs in exp2 units with zero per-element
multiplies, and the kv mask is a precomputed additive bias ROW (one VPU add
per score element instead of iota+compare+select, and no in-kernel branching,
which Mosaic serializes).

Measured dead end (do not retry): a "layout-native" variant taking the
projections' [B, S, N*D] layout directly with a 4D (batch, head, q, k) grid
— to kill the [B,S,N,D] -> [B*N,S,D] transposes (~69 ms/step of copy at 360p)
— made the full step SLOWER (MFU .781 -> .756 on v5e). The custom call itself
was unchanged (profiled 649 ms both ways), but collapsing (N,D) into N*D is a
physical relayout under XLA's tiled layouts (tiles move from (N,D) to
(S,N*D)), which resurfaced as ~130 ms of reshape/bitcast ops that XLA had
previously fused into the transpose chain.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LOG2E = 1.4426950408889634
LN2 = 0.6931471805599453


def _interpret() -> bool:
    """Run kernels in interpreter mode off-TPU (CPU tests)."""
    return jax.default_backend() != "tpu"

DEFAULT_BQ = 1024
DEFAULT_BK = 1024
# Mosaic's default scoped-VMEM limit is 16 MiB of the v5e's 128 MiB; raising
# it unlocks far larger blocks. Measured at 43k tokens (40 heads): fwd
# (bq 3080, bk 3920) 236 ms vs 247 ms at the old 16 MiB-constrained blocks,
# bwd (512, 3920) 756 ms vs 789 ms — and the TRAINING forward (save_lse=True)
# did not fit the 16 MiB limit at all at bq>=1232.
VMEM_LIMIT_BYTES = 110 * 1024 * 1024
_BWD_BQ_CAP = 512
# static shift for the fast-softmax mode (log2 units): exact while
# max_score ∈ (cap-126, cap+127); QK-RMS-normed logits sit well inside
FAST_SOFTMAX_CAP = 30.0


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _exact_bk(sk: int, bk_max: int, hi_cap: int = 3920) -> Optional[int]:
    """Largest k-block that divides sk exactly (multiple of 8, in
    [512, hi_cap]). An exact divisor removes kv padding — and with it the
    additive mask bias, one VPU op per score element (43120 has no
    multiple-of-128 divisor, but Mosaic only needs the SECOND-to-last block
    dim divisible by 8, so 1960/3920 are legal). The search may EXCEED the
    requested bk_max — e.g. 43120's largest divisor under 1024 is 880, which
    is slower than padded 1024. With VMEM_LIMIT_BYTES raised, bk=3920 is the
    measured optimum (fwd and bwd); sage keeps hi_cap=2048 (int8 balance
    differs — larger blocks measured SLOWER there)."""
    hi = min(max(bk_max, hi_cap), sk)
    for cand in range(hi // 8 * 8, 511, -8):
        if sk % cand == 0:
            return cand
    return None


def _exact_bq(sq: int, bq: int, hi: int = 3080) -> int:
    """Prefer a q-block that divides sq exactly (multiple of 8, in
    [1024, hi]) over the requested one: removes q padding and amortizes k/v
    streaming over more rows per block. With VMEM_LIMIT_BYTES raised, 3080
    (43120 tokens) / 2800 (176400) are the measured fwd optima; blocks past
    ~4312 regress (bq 4312 x bk 3920 measured 273 ms vs 236). The sage path
    passes hi=1264 — its int8 optimum stayed at the small blocks."""
    for cand in range(hi // 8 * 8, 1023, -8):
        if sq % cand == 0:
            return cand
    return bq


def _out_struct(shape, dtype, *operands):
    """ShapeDtypeStruct with vma propagated from the operands — required when
    the kernel runs inside shard_map (check_vma=True): outputs vary over the
    union of the mesh axes the inputs vary over."""
    try:
        vma = frozenset().union(*(jax.typeof(x).vma for x in operands
                                  if x is not None))
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    except (AttributeError, TypeError):
        return jax.ShapeDtypeStruct(shape, dtype)


def _mask_bias(kv_valid_len, sk_p: int):
    """[rows, 1, sk_p] additive bias: 0 for valid kv positions, NEG_INF
    beyond. One row when the mask is uniform (pure block padding), B*N rows
    when per-batch (serving with padded contexts). The middle singleton keeps
    the (1, bk) block TPU-tileable for any row count."""
    pos = jnp.arange(sk_p, dtype=jnp.int32)
    bias = jnp.where(pos[None, :] < kv_valid_len.reshape(-1, 1), 0.0, NEG_INF)
    return bias.astype(jnp.float32)[:, None, :]


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(*refs, bq: int, bk: int, masked: bool,
                cap: Optional[float] = None):
    """q arrives PRE-SCALED by (d**-0.5 * log2e); softmax runs in exp2 units.

    cap (the FAST mode): softmax is shift-invariant, so a STATIC shift `cap`
    replaces the running max entirely — no per-block row max, no m
    bookkeeping, no alpha rescale of l/acc (~13% kernel time at 43k tokens).
    Exact (not approximate) whenever scores stay within fp32's exp2 range:
    max_score ∈ (cap - 126, cap + 127) in log2 units — guaranteed by the
    QK RMS-norm every MOVA attention applies. Opt-in: out-of-range scores
    would over/underflow where the exact path renormalizes."""
    if masked:
        bias_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, acc_ref, m_ref, l_ref = refs
    else:
        q_ref, k_ref, v_ref, o_ref, lse_ref, acc_ref, m_ref, l_ref = refs
        bias_ref = None
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        if cap is None:
            m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # [bq, d]
    k = k_ref[0]  # [bk, d]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, bk], log2 units
    if masked:
        s = s + bias_ref[0, 0]  # [bk] broadcast over rows

    if cap is not None:
        p = jnp.exp2(s - cap)  # [bq, bk]
        l_ref[:] += jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[:] += pv
    else:
        m_prev = m_ref[:]  # [bq, 1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        # floor the running max: a fully-masked row would otherwise put m at
        # NEG_INF, which cancels the mask bias inside exp2(s - m) and resurrects
        # the masked scores. Real logits never reach -1e4, and exp2(x < -1e4)
        # underflows to 0 anyway, so the floor only affects degenerate rows
        # (these now produce exact zeros via the l==0 guard, not garbage).
        m_new = jnp.maximum(jnp.maximum(m_prev, m_cur), -1e4)
        alpha = jnp.exp2(m_prev - m_new)
        p = jnp.exp2(s - m_new)  # [bq, bk]
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        m_ref[:] = m_new
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[:] = acc_ref[:] * alpha + pv

    @pl.when(ki == nk - 1)
    def _finalize():
        l = l_ref[:]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_ref[:] / l_safe).astype(o_ref.dtype)
        if lse_ref is not None:
            # natural-log LSE for the backward; TPU-legal 128-lane layout
            m_fin = jnp.full_like(l, cap) if cap is not None else m_ref[:]
            lse = (m_fin + jnp.log2(l_safe)) * LN2
            lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])


def _fwd(q, k, v, kv_valid_len, bq: int, bk: int, save_lse: bool = True,
         softmax_cap: Optional[float] = None):
    """q: [BN, Sq, D]; k/v: [BN, Sk, D]; kv_valid_len: [BN, 1] int32 or None.
    Returns (out, lse) with lse [BN, Sq] fp32 (or None if save_lse=False)."""
    bn, sq, d = q.shape
    sk = k.shape[1]
    if bq == DEFAULT_BQ and sq > bq:
        bq = _exact_bq(sq, bq)
    bq = min(bq, _ceil_to(sq, 128))
    if kv_valid_len is None:
        bk = _exact_bk(sk, bk) or min(bk, _ceil_to(sk, 128))
    else:
        bk = min(bk, _ceil_to(sk, 128))
    sq_p, sk_p = _ceil_to(sq, bq), _ceil_to(sk, bk)

    # fold softmax scale + exp2 conversion into q (saves 1 VPU op/score elt)
    q = (q.astype(jnp.float32) * (d ** -0.5 * LOG2E)).astype(q.dtype)

    masked = kv_valid_len is not None or sk_p != sk
    per_batch = kv_valid_len is not None
    bias = _mask_bias(
        kv_valid_len if per_batch else jnp.full((1,), sk, jnp.int32),
        sk_p) if masked else None
    if sq_p != sq:
        q = jnp.pad(q, ((0, 0), (0, sq_p - sq), (0, 0)))
    if sk_p != sk:
        k = jnp.pad(k, ((0, 0), (0, sk_p - sk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, sk_p - sk), (0, 0)))

    grid = (bn, sq_p // bq, sk_p // bk)

    bias_specs = [pl.BlockSpec(
        (1, 1, bk),
        (lambda b, qi, ki: (b, 0, ki)) if per_batch else (lambda b, qi, ki: (0, 0, ki)),
    )] if masked else []
    bias_args = (bias,) if masked else ()

    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, bq=bq, bk=bk, masked=masked,
                          cap=softmax_cap),
        grid=grid,
        in_specs=bias_specs + [
            pl.BlockSpec((1, bq, d), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, bk, d), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, bk, d), lambda b, qi, ki: (b, ki, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, d), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, bq, 128), lambda b, qi, ki: (b, qi, 0))
            if save_lse else None,
        ],
        out_shape=[
            _out_struct((bn, sq_p, d), q.dtype, q, k, v),
            _out_struct((bn, sq_p, 128), jnp.float32, q, k, v)
            if save_lse else None,
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, d), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT_BYTES,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bn * sq_p * sk_p * d,
            bytes_accessed=2 * bn * (sq_p + 2 * sk_p) * d,
            transcendentals=bn * sq_p * sk_p,
        ),
        interpret=_interpret(),
    )(*bias_args, q, k, v)
    return out[:, :sq], (lse[:, :sq, 0] if save_lse else None)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_dq_kernel(*refs, scale: float, bq: int, bk: int, masked: bool):
    """q pre-scaled by scale*log2e; lse pre-scaled by log2e (exp2 units)."""
    if masked:
        (bias_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
         dq_ref, dq_acc) = refs
    else:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
         dq_ref, dq_acc) = refs
        bias_ref = None
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if masked:
        s = s + bias_ref[0, 0]
    p = jnp.exp2(s - lse_ref[0, :, :1])  # [bq, bk] natural softmax probs
    dp = jax.lax.dot_general(
        do_ref[0], v_ref[0], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, bk]
    ds = p * (dp - delta_ref[0, :, :1])  # [bq, bk] f32
    dq_acc[:] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(ki == nk - 1)
    def _fin():
        dq_ref[0] = (dq_acc[:] * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(*refs, bq: int, bk: int, masked: bool):
    """q pre-scaled by scale*log2e; dk finalized with *ln2 to undo it."""
    if masked:
        (bias_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
         dk_ref, dv_ref, dk_acc, dv_acc) = refs
    else:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
         dk_ref, dv_ref, dk_acc, dv_acc) = refs
        bias_ref = None
    qi = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(qi == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0]  # [bq, d]
    k = k_ref[0]  # [bk, d]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, bk]
    if masked:
        s = s + bias_ref[0, 0]
    p = jnp.exp2(s - lse_ref[0, :, :1])  # [bq, bk]
    do = do_ref[0]  # [bq, d]
    dv_acc[:] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bk, d]
    dp = jax.lax.dot_general(
        do, v_ref[0], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, bk]
    ds = p * (dp - delta_ref[0, :, :1])
    dk_acc[:] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(qi == nq - 1)
    def _fin():
        # q carried scale*log2e; dk wants plain scale — multiply by ln2
        dk_ref[0] = (dk_acc[:] * LN2).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _bwd_fused_kernel(*refs, scale: float, bq: int, bk: int, masked: bool):
    """One-pass backward: dk, dv AND dq from a single s/p/dp computation.

    The split design re-derives s and dp in BOTH kernels — 14*d matmul
    FLOPs per score element against 10*d useful (ceiling 71% of the forward's
    efficiency; the measured 64% bwd MFU is exactly 0.82 fwd-efficiency x
    10/14). Here dq accumulates across the sequential k dimension in a
    WHOLE-ROW fp32 VMEM scratch [sq_p, d] (22 MB at 43k tokens), so the five
    matmuls run once: s, dp, dv, dk, dq.

    Grid (bn, nk, nq), qi minor; ki must be sequential ('arbitrary') for the
    dq accumulation. The dq output block (b, qi) is revisited once per ki —
    intermediate visits write back garbage that the final (ki == nk-1) visit
    overwrites (grid order guarantees it is the last writeback); that wastes
    nk-1 junk block writes of HBM bandwidth, ~1% of the kernel's traffic.

    q pre-scaled by scale*log2e, lse by log2e (exp2 units), as in the split
    kernels; dq finalizes with *scale, dk with *ln2."""
    if masked:
        (bias_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
         dk_ref, dv_ref, dq_ref, dk_acc, dv_acc, dq_sc) = refs
    else:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
         dk_ref, dv_ref, dq_ref, dk_acc, dv_acc, dq_sc) = refs
        bias_ref = None
    ki = pl.program_id(1)
    nk = pl.num_programs(1)
    qi = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(qi == 0)
    def _init_kv():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0]  # [bq, d] (pre-scaled)
    k = k_ref[0]  # [bk, d]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, bk]
    if masked:
        s = s + bias_ref[0, 0]
    p = jnp.exp2(s - lse_ref[0, :, :1])  # [bq, bk]
    do = do_ref[0]  # [bq, d]
    dv_acc[:] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [bk, d]
    dp = jax.lax.dot_general(
        do, v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [bq, bk]
    ds = p * (dp - delta_ref[0, :, :1])  # [bq, bk] f32
    dk_acc[:] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dq_tile = jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [bq, d]
    rows = pl.ds(qi * bq, bq)

    @pl.when(ki == 0)
    def _dq_first():
        dq_sc[rows, :] = dq_tile

    @pl.when(ki > 0)
    def _dq_acc():
        dq_sc[rows, :] += dq_tile

    @pl.when(qi == nq - 1)
    def _fin_kv():
        dk_ref[0] = (dk_acc[:] * LN2).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)

    @pl.when(ki == nk - 1)
    def _fin_q():
        dq_ref[0] = (dq_sc[rows, :] * scale).astype(dq_ref.dtype)


# dq whole-row scratch budget for the fused backward: sq_p*d*4 bytes must
# leave room for the [bq,bk] fp32 intermediates and the kv accumulators
# inside VMEM_LIMIT_BYTES. 48 MiB covers 43k-token 360p self-attention
# (22 MB); 720p (176k tokens, 90 MB) falls back to the split kernels.
_FUSED_DQ_SCRATCH_CAP = 48 * 1024 * 1024
# "auto" routes scratch-fitting shapes to the fused kernel; "split" keeps the
# two-kernel path; "fused" forces it. Default auto: the fused kernel is
# numerics-validated on a real v5e across all MOVA shapes
# (tools/check_attn_tpu.py) and 1.23x faster at the 360p self-attn geometry
# (149.7 vs 121.7 TF/s value-and-grad, tools/bench_attn_bwd.py); shapes
# whose dq scratch exceeds _FUSED_DQ_SCRATCH_CAP (720p 176k tokens) still
# take the split path under auto.
_BWD_MODE = os.environ.get("DUALFORCE_FLASH_BWD", "auto")


def _bwd(q, k, v, o, lse, do, kv_valid_len, bq: int, bk: int, dlse=None):
    bn, sq, d = q.shape
    bq_eff = min(bq, _BWD_BQ_CAP, _ceil_to(sq, 128))
    sq_p = _ceil_to(sq, bq_eff)
    fused_ok = sq_p * d * 4 <= _FUSED_DQ_SCRATCH_CAP
    mode = _BWD_MODE
    if mode == "fused" or (mode == "auto" and fused_ok):
        return _bwd_fused(q, k, v, o, lse, do, kv_valid_len, bq, bk,
                          dlse=dlse)
    return _bwd_split(q, k, v, o, lse, do, kv_valid_len, bq, bk, dlse=dlse)


def _bwd_prepare(q, k, v, o, lse, do, kv_valid_len, bq, bk, dlse):
    """Shared bwd preprocessing: block sizing, delta, q/lse rescaling to exp2
    units, padding, mask bias, lane-broadcast scalars."""
    bn, sq, d = q.shape
    sk = k.shape[1]
    # the bwd kernels hold more live tiles (do, lse, delta, two fp32 [bq,bk]
    # intermediates) than the fwd; larger q-blocks measured slower (775-782 ms
    # at bq 616-784 vs 753 at 512, bk 3920)
    bq = min(bq, _BWD_BQ_CAP, _ceil_to(sq, 128))
    if kv_valid_len is None:
        bk = _exact_bk(sk, bk) or min(bk, _ceil_to(sk, 128))
    else:
        bk = min(bk, _ceil_to(sk, 128))
    sq_p, sk_p = _ceil_to(sq, bq), _ceil_to(sk, bk)

    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)  # [bn, sq]
    if dlse is not None:
        # LSE cotangent: d(lse_i)/d(s_ij) = p_ij, which folds into the same
        # p*(dp - delta) expression as delta_eff = delta - dlse
        delta = delta - dlse.astype(jnp.float32)

    scale = d ** -0.5
    q = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
    lse = lse * LOG2E  # exp2 units to pair with pre-scaled q

    masked = kv_valid_len is not None or sk_p != sk
    per_batch = kv_valid_len is not None
    bias = _mask_bias(
        kv_valid_len if per_batch else jnp.full((1,), sk, jnp.int32),
        sk_p) if masked else None
    if sq_p != sq:
        pad = ((0, 0), (0, sq_p - sq), (0, 0))
        q, do = jnp.pad(q, pad), jnp.pad(do, pad)
        # padded q rows: lse=0, delta=0, p=exp2(-0)=1 — harmless for dq (rows
        # sliced off) but poisons dk/dv; force p≈0 by setting lse very high.
        lse = jnp.pad(lse, ((0, 0), (0, sq_p - sq)), constant_values=-NEG_INF)
        delta = jnp.pad(delta, ((0, 0), (0, sq_p - sq)))
    if sk_p != sk:
        pad = ((0, 0), (0, sk_p - sk), (0, 0))
        k, v = jnp.pad(k, pad), jnp.pad(v, pad)

    # TPU-legal lane layout for the per-row scalars
    lse = jnp.broadcast_to(lse[:, :, None], (bn, sq_p, 128))
    delta = jnp.broadcast_to(delta[:, :, None], (bn, sq_p, 128))
    return (q, k, v, do, lse, delta, bias, scale, bq, bk, sq_p, sk_p,
            masked, per_batch)


def _bwd_fused(q, k, v, o, lse, do, kv_valid_len, bq: int, bk: int, dlse=None):
    bn, sq, d = q.shape
    sk = k.shape[1]
    (q, k, v, do, lse, delta, bias, scale, bq, bk, sq_p, sk_p,
     masked, per_batch) = _bwd_prepare(q, k, v, o, lse, do, kv_valid_len,
                                       bq, bk, dlse)
    bias_row = (lambda b: b) if per_batch else (lambda b: 0)
    bias_specs = [pl.BlockSpec((1, 1, bk), lambda b, ki, qi, _r=bias_row: (_r(b), 0, ki))] if masked else []
    bias_args = (bias,) if masked else ()

    dk, dv, dq = pl.pallas_call(
        functools.partial(_bwd_fused_kernel, scale=scale, bq=bq, bk=bk,
                          masked=masked),
        grid=(bn, sk_p // bk, sq_p // bq),
        in_specs=bias_specs + [
            pl.BlockSpec((1, bq, d), lambda b, ki, qi: (b, qi, 0)),   # q
            pl.BlockSpec((1, bk, d), lambda b, ki, qi: (b, ki, 0)),   # k
            pl.BlockSpec((1, bk, d), lambda b, ki, qi: (b, ki, 0)),   # v
            pl.BlockSpec((1, bq, d), lambda b, ki, qi: (b, qi, 0)),   # do
            pl.BlockSpec((1, bq, 128), lambda b, ki, qi: (b, qi, 0)),  # lse
            pl.BlockSpec((1, bq, 128), lambda b, ki, qi: (b, qi, 0)),  # delta
        ],
        out_specs=[
            pl.BlockSpec((1, bk, d), lambda b, ki, qi: (b, ki, 0)),   # dk
            pl.BlockSpec((1, bk, d), lambda b, ki, qi: (b, ki, 0)),   # dv
            pl.BlockSpec((1, bq, d), lambda b, ki, qi: (b, qi, 0)),   # dq
        ],
        out_shape=[
            _out_struct((bn, sk_p, d), k.dtype, q, k, v, do),
            _out_struct((bn, sk_p, d), v.dtype, q, k, v, do),
            _out_struct((bn, sq_p, d), q.dtype, q, k, v, do),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, d), jnp.float32),
            pltpu.VMEM((bk, d), jnp.float32),
            pltpu.VMEM((sq_p, d), jnp.float32),   # whole-row dq accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            # ki carries the dq accumulation -> sequential
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT_BYTES,
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * bn * sq_p * sk_p * d,
            bytes_accessed=2 * bn * (3 * sq_p + 4 * sk_p) * d,
            transcendentals=bn * sq_p * sk_p,
        ),
        interpret=_interpret(),
    )(*bias_args, q, k, v, do, lse, delta)
    return dq[:, :sq], dk[:, :sk], dv[:, :sk]


def _bwd_split(q, k, v, o, lse, do, kv_valid_len, bq: int, bk: int, dlse=None):
    bn, sq, d = q.shape
    sk = k.shape[1]
    (q, k, v, do, lse, delta, bias, scale, bq, bk, sq_p, sk_p,
     masked, per_batch) = _bwd_prepare(q, k, v, o, lse, do, kv_valid_len,
                                       bq, bk, dlse)
    bias_row = (lambda b: b) if per_batch else (lambda b: 0)
    dq_bias_specs = [pl.BlockSpec((1, 1, bk), lambda b, qi, ki, _r=bias_row: (_r(b), 0, ki))] if masked else []
    dkv_bias_specs = [pl.BlockSpec((1, 1, bk), lambda b, ki, qi, _r=bias_row: (_r(b), 0, ki))] if masked else []
    bias_args = (bias,) if masked else ()

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, bq=bq, bk=bk, masked=masked),
        grid=(bn, sq_p // bq, sk_p // bk),
        in_specs=dq_bias_specs + [
            pl.BlockSpec((1, bq, d), lambda b, qi, ki: (b, qi, 0)),   # q
            pl.BlockSpec((1, bk, d), lambda b, qi, ki: (b, ki, 0)),   # k
            pl.BlockSpec((1, bk, d), lambda b, qi, ki: (b, ki, 0)),   # v
            pl.BlockSpec((1, bq, d), lambda b, qi, ki: (b, qi, 0)),   # do
            pl.BlockSpec((1, bq, 128), lambda b, qi, ki: (b, qi, 0)),  # lse
            pl.BlockSpec((1, bq, 128), lambda b, qi, ki: (b, qi, 0)),  # delta
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda b, qi, ki: (b, qi, 0)),
        out_shape=_out_struct((bn, sq_p, d), q.dtype, q, k, v, do),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT_BYTES,
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * bn * sq_p * sk_p * d,
            bytes_accessed=2 * bn * (2 * sq_p + 2 * sk_p) * d,
            transcendentals=bn * sq_p * sk_p,
        ),
        interpret=_interpret(),
    )(*bias_args, q, k, v, do, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, bq=bq, bk=bk, masked=masked),
        grid=(bn, sk_p // bk, sq_p // bq),
        in_specs=dkv_bias_specs + [
            pl.BlockSpec((1, bq, d), lambda b, ki, qi: (b, qi, 0)),   # q
            pl.BlockSpec((1, bk, d), lambda b, ki, qi: (b, ki, 0)),   # k
            pl.BlockSpec((1, bk, d), lambda b, ki, qi: (b, ki, 0)),   # v
            pl.BlockSpec((1, bq, d), lambda b, ki, qi: (b, qi, 0)),   # do
            pl.BlockSpec((1, bq, 128), lambda b, ki, qi: (b, qi, 0)),  # lse
            pl.BlockSpec((1, bq, 128), lambda b, ki, qi: (b, qi, 0)),  # delta
        ],
        out_specs=[
            pl.BlockSpec((1, bk, d), lambda b, ki, qi: (b, ki, 0)),
            pl.BlockSpec((1, bk, d), lambda b, ki, qi: (b, ki, 0)),
        ],
        out_shape=[
            _out_struct((bn, sk_p, d), k.dtype, q, k, v, do),
            _out_struct((bn, sk_p, d), v.dtype, q, k, v, do),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, d), jnp.float32),
            pltpu.VMEM((bk, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT_BYTES,
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * bn * sq_p * sk_p * d,
            bytes_accessed=2 * bn * (2 * sq_p + 2 * sk_p) * d,
            transcendentals=bn * sq_p * sk_p,
        ),
        interpret=_interpret(),
    )(*bias_args, q, k, v, do, lse, delta)

    return dq[:, :sq], dk[:, :sk], dv[:, :sk]


# ---------------------------------------------------------------------------
# public API with custom VJP, [B, S, N, D] layout
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash(q, k, v, kv_valid_len, bq, bk, softmax_cap=None):
    o, _ = _fwd(q, k, v, kv_valid_len, bq, bk, save_lse=False,
                softmax_cap=softmax_cap)
    return o


def _flash_fwd(q, k, v, kv_valid_len, bq, bk, softmax_cap=None):
    o, lse = _fwd(q, k, v, kv_valid_len, bq, bk, softmax_cap=softmax_cap)
    return o, (q, k, v, o, lse, kv_valid_len)


def _flash_bwd(bq, bk, softmax_cap, res, do):
    q, k, v, o, lse, kv_valid_len = res
    dq, dk, dv = _bwd(q, k, v, o, lse, do, kv_valid_len, bq, bk)
    dvlen = (
        None if kv_valid_len is None
        else np.zeros(kv_valid_len.shape, jax.dtypes.float0)
    )
    return dq, dk, dv, dvlen


_flash.defvjp(_flash_fwd, _flash_bwd)


# Same kernel, but under jax.checkpoint the fwd is NOT re-executed in the
# backward: defvjp(optimize_remat=True) saves the residuals (q, k, v, o, lse)
# across the remat boundary instead of recomputing the O(L^2) fwd kernel.
# Opt-in (remat_save_attention): the saved residuals cost ~4*S*D bf16 per
# layer, so the default stays full-remat (memory parity with the reference's
# per-block gradient checkpointing, mova_train.py:1108-1214).
@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash_opt(q, k, v, kv_valid_len, bq, bk, softmax_cap=None):
    o, _ = _fwd(q, k, v, kv_valid_len, bq, bk, save_lse=False,
                softmax_cap=softmax_cap)
    return o


_flash_opt.defvjp(_flash_fwd, _flash_bwd, optimize_remat=True)

_REMAT_SAVE_ATTENTION = False


def remat_save_attention(on: bool) -> bool:
    """Trace-time switch: route flash_attention through the
    optimize_remat custom_vjp so jax.checkpoint'd layers skip the attention
    fwd recompute in their backward (the VERDICT r3 #7 recompute-reduction).
    Returns the previous value. Set BEFORE tracing the train step; it is
    baked into the traced program."""
    global _REMAT_SAVE_ATTENTION
    prev = _REMAT_SAVE_ATTENTION
    _REMAT_SAVE_ATTENTION = bool(on)
    return prev


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_valid_len: Optional[jnp.ndarray] = None,
    block_q: int = DEFAULT_BQ,
    block_k: int = DEFAULT_BK,
    softmax_cap: Optional[float] = None,
) -> jnp.ndarray:
    """Flash attention over [B, S, N, D] tensors (batched over B*N).

    softmax_cap: enable the FAST softmax (static shift instead of a running
    max — see _fwd_kernel); exact for QK-normed attention, ~13% faster."""
    b, sq, n, d = q.shape
    sk = k.shape[1]
    qf = q.transpose(0, 2, 1, 3).reshape(b * n, sq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * n, sk, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * n, sk, d)
    vlen = None
    if kv_valid_len is not None:
        vlen = jnp.repeat(kv_valid_len.astype(jnp.int32).reshape(b, 1), n, axis=0)
    fn = _flash_opt if _REMAT_SAVE_ATTENTION else _flash
    o = fn(qf, kf, vf, vlen, block_q, block_k, softmax_cap)
    return o.reshape(b, n, sq, d).transpose(0, 2, 1, 3)


# --- int8-QK ("sage") inference variant --------------------------------------

def _sage_fwd_kernel(*refs, masked: bool, cap: float):
    """Int8 Q·K^T on the MXU (2x bf16 MXU throughput on v5e), fp32 softmax,
    bf16 P·V. Per-block dequant scales arrive via SMEM; the softmax scale and
    log2(e) are folded into the q scales. Fast-softmax (static cap) only —
    sage is for QK-RMS-normed attention, whose logits are bounded.

    Measured at 360p self-attn geometry (40 heads x 43120 tokens): 1.16x the
    bf16 fast kernel (211 ms vs 245 ms), rel err 1.5e-2 vs fp32 (the int8
    resolution floor; the bf16 kernel sits at 4e-3). int8 P·V (SageAttention2
    style) measured SLOWER on v5e: the per-score-element f32->int8 round
    costs more VPU than the halved P·V MXU time saves."""
    if masked:
        bias_ref, sq_ref, sk_ref, q_ref, k_ref, v_ref, o_ref, acc_ref, l_ref = refs
    else:
        sq_ref, sk_ref, q_ref, k_ref, v_ref, o_ref, acc_ref, l_ref = refs
        bias_ref = None
    b = pl.program_id(0)
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    s_i32 = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [bq, bk]
    s = s_i32.astype(jnp.float32) * (sq_ref[b, qi] * sk_ref[b, ki])
    if masked:
        s = s + bias_ref[0, 0]
    p = jnp.exp2(s - cap)
    l_ref[:] += jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] += jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ki == nk - 1)
    def _fin():
        l = l_ref[:]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_ref[:] / l_safe).astype(o_ref.dtype)


def _block_quant_int8(x, blk: int):
    """[BN, S, D] fp -> (int8 [BN, S, D], fp32 scales [BN, S//blk])."""
    bn, s, d = x.shape
    xb = x.reshape(bn, s // blk, blk, d)
    sc = jnp.maximum(jnp.max(jnp.abs(xb), axis=(2, 3)), 1e-8) / 127.0
    xi = jnp.round(xb / sc[:, :, None, None]).astype(jnp.int8)
    return xi.reshape(bn, s, d), sc.astype(jnp.float32)


def _sage_fwd(q, k, v, kv_valid_len, bq: int, bk: int,
              softmax_cap: float = FAST_SOFTMAX_CAP):
    """q/k/v: [BN, S, D]. Inference-only (no VJP — differentiating raises)."""
    bn, sq, d = q.shape
    sk = k.shape[1]
    if bq == DEFAULT_BQ and sq > bq:
        bq = _exact_bq(sq, bq, hi=1264)   # int8 optimum: small blocks
    bq = min(bq, _ceil_to(sq, 128))
    if kv_valid_len is None:
        bk = _exact_bk(sk, bk, hi_cap=2048) or min(bk, _ceil_to(sk, 128))
    else:
        bk = min(bk, _ceil_to(sk, 128))
    sq_p, sk_p = _ceil_to(sq, bq), _ceil_to(sk, bk)

    kf = k.astype(jnp.float32)
    # per-channel mean-centering of K: shifts every row's logits by the same
    # q_i . mean constant -> softmax-invariant, halves the int8 range K needs
    kf = kf - jnp.mean(kf, axis=1, keepdims=True)
    qf = q.astype(jnp.float32)
    if sq_p != sq:
        qf = jnp.pad(qf, ((0, 0), (0, sq_p - sq), (0, 0)))
    if sk_p != sk:
        kf = jnp.pad(kf, ((0, 0), (0, sk_p - sk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, sk_p - sk), (0, 0)))
    qi8, q_sc = _block_quant_int8(qf, bq)
    ki8, k_sc = _block_quant_int8(kf, bk)
    q_sc = q_sc * (d ** -0.5 * LOG2E)  # fold softmax scale + exp2 conversion

    masked = kv_valid_len is not None or sk_p != sk
    per_batch = kv_valid_len is not None
    bias = _mask_bias(
        kv_valid_len if per_batch else jnp.full((1,), sk, jnp.int32),
        sk_p) if masked else None

    bias_specs = [pl.BlockSpec(
        (1, 1, bk),
        (lambda b, qi, ki: (b, 0, ki)) if per_batch else (lambda b, qi, ki: (0, 0, ki)),
    )] if masked else []
    bias_args = (bias,) if masked else ()

    out = pl.pallas_call(
        functools.partial(_sage_fwd_kernel, masked=masked, cap=softmax_cap),
        grid=(bn, sq_p // bq, sk_p // bk),
        in_specs=bias_specs + [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bq, d), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, bk, d), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, bk, d), lambda b, qi, ki: (b, ki, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda b, qi, ki: (b, qi, 0)),
        out_shape=_out_struct((bn, sq_p, d), v.dtype, q, k, v),
        scratch_shapes=[
            pltpu.VMEM((bq, d), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT_BYTES,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bn * sq_p * sk_p * d,
            bytes_accessed=bn * (sq_p + sk_p) * d + 2 * bn * sk_p * d,
            transcendentals=bn * sq_p * sk_p,
        ),
        interpret=_interpret(),
    )(*bias_args, q_sc, k_sc, qi8, ki8, v)
    return out[:, :sq]


def sage_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_valid_len: Optional[jnp.ndarray] = None,
    block_q: int = DEFAULT_BQ,
    block_k: int = DEFAULT_BK,
) -> jnp.ndarray:
    """Int8-QK flash attention over [B, S, N, D] (SageAttention-equivalent —
    the reference's third fallback, wan_video_dit.py:40-43,79-84). Inference
    only; ~1.16x the bf16 fast kernel at 360p geometry, rel err ~1.5e-2."""
    b, sq, n, d = q.shape
    sk = k.shape[1]
    qf = q.transpose(0, 2, 1, 3).reshape(b * n, sq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * n, sk, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * n, sk, d)
    vlen = None
    if kv_valid_len is not None:
        vlen = jnp.repeat(kv_valid_len.astype(jnp.int32).reshape(b, 1), n, axis=0)
    o = _sage_fwd(qf, kf, vf, vlen, block_q, block_k)
    return o.reshape(b, n, sq, d).transpose(0, 2, 1, 3)


# --- (out, lse) variant for sequence-parallel combines -----------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash_lse(q, k, v, kv_valid_len, bq, bk):
    return _fwd(q, k, v, kv_valid_len, bq, bk, save_lse=True)


def _flash_lse_fwd(q, k, v, kv_valid_len, bq, bk):
    o, lse = _fwd(q, k, v, kv_valid_len, bq, bk, save_lse=True)
    return (o, lse), (q, k, v, o, lse, kv_valid_len)


def _flash_lse_bwd(bq, bk, res, cotangents):
    q, k, v, o, lse, kv_valid_len = res
    do, dlse = cotangents
    dq, dk, dv = _bwd(q, k, v, o, lse, do.astype(q.dtype), kv_valid_len,
                      bq, bk, dlse=dlse)
    dvlen = (
        None if kv_valid_len is None
        else np.zeros(kv_valid_len.shape, jax.dtypes.float0)
    )
    return dq, dk, dv, dvlen


_flash_lse.defvjp(_flash_lse_fwd, _flash_lse_bwd)


def flash_attention_with_lse(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int = DEFAULT_BQ,
    block_k: int = DEFAULT_BK,
    kv_valid_len: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Flash attention returning (out [B,Sq,N,D], lse [B,N,Sq]) with natural-
    log LSE — the inner kernel for ring attention and LSE-combined
    cross-attention (parallel/ring_attention.py). Differentiable in both
    outputs (the lse cotangent folds into the backward's delta term).

    kv_valid_len: optional [B] int mask — keys at positions >= the per-batch
    valid length are excluded from the softmax (sequence-parallel padding).
    Rows with kv_valid_len == 0 are undefined here; the ring/LSE combiners
    zero them out by their own kv_valid bookkeeping before use."""
    b, sq, n, d = q.shape
    sk = k.shape[1]
    qf = q.transpose(0, 2, 1, 3).reshape(b * n, sq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * n, sk, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * n, sk, d)
    vlen = None
    if kv_valid_len is not None:
        vlen = jnp.repeat(kv_valid_len.astype(jnp.int32).reshape(b, 1), n, axis=0)
    o, lse = _flash_lse(qf, kf, vf, vlen, block_q, block_k)
    return (o.reshape(b, n, sq, d).transpose(0, 2, 1, 3),
            lse.reshape(b, n, sq))
