"""Analytic multi-chip serving projection (roofline over mesh configs).

Multi-chip hardware is not reachable from this environment (one v5e via a
tunnel), so this models the deployment the `fsdp`/`cp` mesh axes exist for:
MOVA-360p/720p serving on a v5e slice. Grounded in MEASURED single-chip
numbers (bench.py: 79.3% step MFU at 360p, 91.3% at 720p) plus nominal
public v5e specs — override any spec via flags if your slice differs.

Model per denoise pass on mesh (fsdp=F, cp=C), N = F*C chips:
  compute_s   = pass_flops / (N * peak * mfu_geom)
  fsdp_comm_s = weight bytes all-gathered per pass / ICI egress
                (each chip gathers the other (F-1)/F of every layer's params)
  cp_comm_s   = ring-attention KV rotation: each chip sends its KV shard
                (C-1) times per self-attention layer
  step_s      = 2 * max(compute_s, fsdp_comm_s + cp_comm_s)   [2 CFG passes;
                comms overlap compute in the ring/prefetch design, so the
                roofline takes the max]
  HBM check   = weights/F + activations/C + workspace  vs  16 GB

Usage: python tools/scaling_model.py [--geom 360p|720p] [--ici_gbs 180]
       [--peak_tfs 197] [--hbm_gb 16]
"""

from __future__ import annotations

import argparse

GEOMS = {
    # tokens, measured full-step MFU (bench.py on one v5e)
    "360p": dict(lv=49 * 22 * 40, mfu=0.793),
    "720p": dict(lv=49 * 45 * 80, mfu=0.913),
}
LA, LT = 403, 512
DV, DA, FFN_V, FFN_A = 5120, 1536, 13824, 8960
V_LAYERS, A_LAYERS, B_LAYERS = 40, 30, 30


def dit_flops(L, d, ffn, layers, Lt=LT):
    proj_self = 4 * 2 * L * d * d
    attn_self = 4 * L * L * d
    proj_cross = 2 * 2 * L * d * d + 2 * 2 * Lt * d * d
    attn_cross = 4 * L * Lt * d
    ffn_f = 2 * 2 * L * d * ffn
    return layers * (proj_self + attn_self + proj_cross + attn_cross + ffn_f)


def bridge_flops(Lv, La, layers=B_LAYERS):
    per = (4 * Lv * DV * DV + 4 * La * DA * DV + 4 * Lv * La * DV
           + 4 * La * DA * DA + 4 * Lv * DV * DA + 4 * La * Lv * DA)
    return layers * per


def model(geom: str, fsdp: int, cp: int, peak_tfs: float, ici_gbs: float,
          hbm_gb: float):
    g = GEOMS[geom]
    lv = g["lv"]
    n = fsdp * cp
    flops = (dit_flops(lv, DV, FFN_V, V_LAYERS)
             + dit_flops(LA, DA, FFN_A, A_LAYERS)
             + bridge_flops(lv, LA))
    compute_s = flops / (n * peak_tfs * 1e12 * g["mfu"])

    # params of the ACTIVE tower + audio + bridge (the second video expert is
    # resident but idle; it costs HBM, not comms)
    text_dim = 4096
    p_video = V_LAYERS * (4 * DV * DV          # self qkv,o
                          + 2 * DV * DV        # cross q,o
                          + 2 * text_dim * DV  # cross k,v from text
                          + 2 * DV * FFN_V)
    p_audio = A_LAYERS * (6 * DA * DA + 2 * text_dim * DA + 2 * DA * FFN_A)
    p_bridge = B_LAYERS * 2 * (DV * DV + 2 * DA * DV)
    params_active = p_video + p_audio + p_bridge
    fsdp_comm_s = (params_active * 2 * (fsdp - 1) / fsdp) / (ici_gbs * 1e9)

    # ring attention: KV shard (2 * lv/cp * DV bf16) sent (cp-1) times per
    # video self-attn layer (audio KV is negligible)
    kv_shard = 2 * (lv / cp) * DV * 2
    cp_comm_s = V_LAYERS * kv_shard * (cp - 1) / (ici_gbs * 1e9)

    step_s = 2.0 * max(compute_s, fsdp_comm_s + cp_comm_s)

    # HBM: two 14B towers + audio + bridge + UMT5 + VAEs ~ 35e9 params bf16,
    # sharded over fsdp; activations ~ 20 live [lv, DV] bf16 tensors over cp
    weights_gb = 35e9 * 2 / fsdp / 1e9
    acts_gb = 20 * lv * DV * 2 / cp / 1e9
    hbm_used = weights_gb + acts_gb + 1.5  # +workspace
    fits = hbm_used <= hbm_gb
    return dict(chips=n, step_s=step_s, compute_s=2 * compute_s,
                comm_s=2 * (fsdp_comm_s + cp_comm_s), hbm_gb=hbm_used,
                fits=fits)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--geom", choices=list(GEOMS), default="360p")
    ap.add_argument("--peak_tfs", type=float, default=197.0)
    ap.add_argument("--ici_gbs", type=float, default=180.0,
                    help="per-chip ICI egress GB/s (v5e 2D torus nominal; "
                         "override for your slice)")
    ap.add_argument("--hbm_gb", type=float, default=16.0)
    args = ap.parse_args()

    print(f"# {args.geom} serving projection (50 steps, 2 CFG passes/step; "
          f"measured single-chip MFU {GEOMS[args.geom]['mfu']:.3f})")
    print(f"{'mesh':>12} {'chips':>5} {'step_s':>8} {'compute':>8} "
          f"{'comm':>7} {'HBM_GB':>7} {'fits':>5} {'clip_min':>8}")
    for fsdp, cp in [(1, 1), (2, 1), (4, 1), (4, 2), (2, 4), (4, 4), (8, 4),
                     (4, 8), (8, 8)]:
        r = model(args.geom, fsdp, cp, args.peak_tfs, args.ici_gbs,
                  args.hbm_gb)
        clip_min = 50 * r["step_s"] / 60
        print(f"  f{fsdp:<2d} x c{cp:<4d} {r['chips']:>5} {r['step_s']:>8.2f} "
              f"{r['compute_s']:>8.2f} {r['comm_s']:>7.2f} "
              f"{r['hbm_gb']:>7.1f} {str(r['fits']):>5} {clip_min:>8.1f}")
    print("\nnotes: comm overlaps compute (roofline max); HBM includes both "
          "video experts resident.\nWith component staging (one expert "
          "HBM-resident at a time) subtract ~14/fsdp GB.")


if __name__ == "__main__":
    main()
