"""Build a TRAIN_RUN artifact from a (possibly interrupted) trainer
metrics.jsonl.

Companion to tools/run_train_onchip.py: that driver writes the artifact only
after both phases finish, so a wall-clock-killed run loses its evidence even
though the trainer logged every step. This tool recovers the record — loss
curve, lead/trail means, step times, checkpoints on disk — from the logs the
trainer (dualforce_tpu/engine/trainer.py, logger=jsonl) already wrote.

Counterpart of the reference's training run records
(/root/reference/README.md:269-273).

Usage:
    python tools/train_metrics_artifact.py out/train_r5/lora_ckpt \
        --artifact TRAIN_RUN_r05.json --note "wall-clock-bounded run"
"""

from __future__ import annotations

import argparse
import json
import os


def load_metrics(save_dir: str):
    rows = []
    with open(os.path.join(save_dir, "metrics.jsonl")) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def summarize(rows, k: int = 10):
    losses = [r["loss"] for r in rows if "loss" in r]
    steps = [r["step"] for r in rows if "loss" in r]
    k = min(k, max(1, len(losses) // 3))
    lead = sum(losses[:k]) / k
    trail = sum(losses[-k:]) / k
    st = [r["step_time"] for r in rows[1:] if "step_time" in r]
    return {
        "steps_logged": len(losses),
        "first_step": steps[0] if steps else None,
        "last_step": steps[-1] if steps else None,
        "loss_first": losses[0] if losses else None,
        "loss_last": losses[-1] if losses else None,
        f"lead{k}_mean": round(lead, 4),
        f"trail{k}_mean": round(trail, 4),
        "trail_over_lead": round(trail / lead, 4) if lead else None,
        "median_step_s": round(sorted(st)[len(st) // 2], 3) if st else None,
        "curve": [{"step": s, "loss": round(l, 4)}
                  for s, l in zip(steps, losses)],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("save_dir")
    ap.add_argument("--artifact", required=True)
    ap.add_argument("--config", default="configs/training/lora_tiny.py")
    ap.add_argument("--note", default="")
    ap.add_argument("--extra_dirs", nargs="*", default=[],
                    help="other save_dirs (e.g. an earlier partial phase) "
                         "recorded alongside for completeness")
    args = ap.parse_args()

    rows = load_metrics(args.save_dir)
    ckpts = sorted(d for d in os.listdir(args.save_dir)
                   if d.startswith("step-"))
    artifact = {
        "metric": "train_run_onchip",
        "backend": "tpu",
        "config": args.config,
        "save_dir": args.save_dir,
        "learning": summarize(rows),
        "checkpoints": ckpts,
        "note": args.note,
    }
    for d in args.extra_dirs:
        try:
            artifact.setdefault("partial_runs", []).append(
                {"save_dir": d, "learning": summarize(load_metrics(d))})
        except OSError:
            pass
    with open(args.artifact, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({"artifact": args.artifact,
                      "learning": {k: v for k, v in
                                   artifact["learning"].items()
                                   if k != "curve"}}))


if __name__ == "__main__":
    main()
