"""Reconcile every 720p per-step number into ONE labeled table.

Round 3 left three mutually contradictory 720p step times on record
(73.8 s probe / 226.5 s serving estimate / 339.7 s resident
extrapolation) with no note saying which modes produced which. This tool
builds the single source of truth the README quotes: each row is one
MODE with its config, what the number includes, and where it was
measured, assembled from

  - the driven end-to-end run's summary (out/720p/e2e_summary.json):
    MEASURED wall-clock per scheduler step under group-streamed fp8
    offload — includes the host->HBM restaging of the ~14 GB active
    expert every pass, which in this environment rides a tunnel whose
    bandwidth is far below a real host's PCIe/DMA;
  - the resident-proxy bench (bench.py --geom 720p output): EXTRAPOLATED
    per-step from flagship-width layers held HBM-resident — pure on-chip
    compute, no offload traffic, deep-validated + int8 variants.

Usage:
    python tools/reconcile_720p.py --e2e out/720p/e2e_summary.json \
        --bench BENCH_r04_720p.json --out BENCH_r04_720p_modes.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np


def build_rows(e2e: dict | None, bench: dict | None):
    rows = []
    if e2e is not None:
        st = [s for s in e2e.get("step_times_s", []) if s is not None]
        # chunked runs restart the process between ranges: each worker's
        # first step pays weight-cache mmap + h2d staging warmup; steady
        # rows are the non-first steps of multi-step workers. With one
        # pass per worker every step pays it — report both views.
        rows.append({
            "mode": "measured: driven e2e run (this environment)",
            "config": f"offload {e2e['offload']}, attn {e2e['attn']}, "
                      f"quant {e2e['quant']}, {e2e['weight_storage']}, "
                      f"cfg_cache_interval {e2e['cfg_cache_interval']}, "
                      f"chunked x{e2e.get('chunked', {}).get('workers', 1)}"
                      " processes",
            "step_s_median": round(float(np.median(st)), 1) if st else None,
            "step_s_all": [round(float(s), 1) for s in st],
            "steps": e2e["steps"],
            "includes": "EVERYTHING: host->HBM restaging of the active "
                        "expert each pass over the tunneled-TPU transport "
                        "(~14 GiB/pass at tunnel bandwidth, 50-100x slower "
                        "than a real host's DMA), per-worker process "
                        "restart, compile-cache hits, real 193-frame "
                        "latents",
            "source": "out/720p/e2e_summary.json (driven run)",
        })
        t = e2e.get("timings", {})
        rows.append({
            "mode": "measured: e2e non-denoise phases",
            "prepare_s": t.get("prepare_s"),
            "decode_s": t.get("decode_s"),
            "mux_s": t.get("mux_s"),
            "wall_total_s": t.get("wall_total_s"),
            "source": "out/720p/e2e_summary.json (driven run)",
        })
    if bench is not None:
        d = bench["detail"]
        rows.append({
            "mode": "extrapolated: HBM-resident, 2 CFG passes",
            "config": f"flagship-width proxy x{d['proxy_layers']} layers "
                      f"(deep-validated x{d['deep_proxy_layers']}), "
                      f"attn {d['attn'].split(' ')[0]}, bf16 compute",
            "step_s": bench["value"],
            "includes": "pure on-chip compute at measured "
                        f"{d['achieved_tflops_s']} TF/s "
                        f"(MFU {d['mfu']}); NO offload traffic — the "
                        "number a resident multi-chip serving deployment "
                        "would see per chip-equivalent",
            "source": "bench.py --geom 720p",
        })
        rows.append({
            "mode": "extrapolated: HBM-resident serving, cfg-cache-3",
            "step_s": d["serving_step_s_cfg_cache3"],
            "includes": "as above with the CFG negative pass amortized to "
                        "every 3rd step (1.33 passes/step)",
            "source": "bench.py --geom 720p",
        })
        if d.get("int8_serving_pass_s") is not None:
            base = d["single_pass_s"]
            sp = d["int8_serving_speedup"]
            rows.append({
                "mode": "extrapolated: int8 w8a8 + sage attention serving",
                "step_s_cfg_cache3": round(
                    (1 + 1 / 3) * base / sp, 1),
                "speedup_vs_bf16": sp,
                "rel_err_vs_bf16": d["int8_serving_rel_err"],
                "includes": "resident serving row with int8 projections + "
                            "int8-QK attention (opt-in lossy mode)",
                "source": "bench.py --geom 720p",
            })
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--e2e", default="out/720p/e2e_summary.json")
    ap.add_argument("--bench", default="BENCH_r04_720p.json")
    ap.add_argument("--out", default="BENCH_r04_720p_modes.json")
    args = ap.parse_args()

    e2e = bench = None
    if os.path.exists(args.e2e):
        with open(args.e2e) as f:
            e2e = json.load(f)
    if os.path.exists(args.bench):
        with open(args.bench) as f:
            bench = json.load(f)
            if "detail" not in bench:  # driver wrapper {tail: ...}
                for line in reversed(bench.get("tail", "").splitlines()):
                    if line.startswith('{"metric"'):
                        bench = json.loads(line)
                        break

    out = {
        "metric": "mova720p_step_time_reconciliation",
        "rows": build_rows(e2e, bench),
        "why_the_round3_numbers_differed": (
            "73.8 s was a 2-step probe's post-compile step under "
            "group-streamed offload when the tunnel happened to be fast; "
            "226.5 s was serving_step_s_cfg_cache3 extrapolated from the "
            "resident 2-layer proxy; 339.7 s was the same proxy "
            "extrapolated to 2 full CFG passes. They answer different "
            "questions (streamed wall-clock at ambient tunnel bandwidth "
            "vs resident on-chip compute), which the rows above now "
            "label explicitly."),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
