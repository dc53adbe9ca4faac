"""Merge per-phase bench.py artifacts into one.

bench.py --phases isolates risky remote compiles into separate processes
(a crashed 176k-token compile poisons its whole session); this tool folds
the phase runs back into a single artifact: the first input is the base,
later inputs fill any detail field the base left null, and nulls_explained
keeps only the fields that are STILL null everywhere.

    python tools/merge_bench.py BENCH_r05_720p.json \
        out/queue/bench_720p_vae.out out/queue/bench_720p_deep.out
"""

from __future__ import annotations

import json
import sys


def last_json_line(path: str):
    with open(path) as f:
        lines = [ln for ln in f if ln.strip()]
    for ln in reversed(lines):
        try:
            d = json.loads(ln)
            if isinstance(d, dict) and "detail" in d:
                return d
        except json.JSONDecodeError:
            continue
    raise SystemExit(f"{path}: no bench JSON line found")


def main():
    out_path, *inputs = sys.argv[1:]
    runs = [last_json_line(p) for p in inputs]
    base = runs[0]
    for extra in runs[1:]:
        for k, v in extra["detail"].items():
            if k == "nulls_explained":
                continue
            if base["detail"].get(k) is None and v is not None:
                base["detail"][k] = v
        # a deeper-validated run may carry a better headline
        if extra["detail"].get("extrapolation_rel_err") is not None and \
                base["detail"].get("deep_proxy_layers") == \
                extra["detail"].get("deep_proxy_layers"):
            pass
    ne = {}
    for run in runs:
        for k, v in (run["detail"].get("nulls_explained") or {}).items():
            if base["detail"].get(k) is None and "skipped" not in v:
                ne[k] = v
    base["detail"]["nulls_explained"] = ne or None
    if not ne:
        base["detail"].pop("nulls_explained")
    base["detail"]["merged_from"] = inputs
    with open(out_path, "w") as f:
        json.dump(base, f, indent=1)
    print(json.dumps(base))


if __name__ == "__main__":
    main()
