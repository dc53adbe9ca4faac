"""tools/train_metrics_artifact.py: run-record recovery from metrics.jsonl.

The on-chip train driver (tools/run_train_onchip.py) writes its artifact
only after both phases complete; this tool rebuilds the record from the
trainer's incremental JSONL log so a wall-clock-killed run keeps its
learning-curve evidence."""

import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_metrics(d, losses, start_step=1):
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "metrics.jsonl"), "w") as f:
        for i, loss in enumerate(losses):
            f.write(json.dumps({"step": start_step + i, "loss": loss,
                                "step_time": 1.5 + 0.01 * i}) + "\n")


def test_recovers_curve_and_checkpoints(tmp_path):
    save = tmp_path / "ckpt"
    losses = [3.0 - 0.05 * i for i in range(20)]
    _write_metrics(str(save), losses)
    (save / "step-10").mkdir()
    (save / "step-20").mkdir()
    art = tmp_path / "TRAIN_TEST.json"

    out = subprocess.run(
        [sys.executable, os.path.join(_REPO, "tools",
                                      "train_metrics_artifact.py"),
         str(save), "--artifact", str(art), "--note", "unit"],
        capture_output=True, text=True, cwd=_REPO)
    assert out.returncode == 0, out.stderr

    rec = json.loads(art.read_text())
    learn = rec["learning"]
    assert learn["steps_logged"] == 20
    assert learn["first_step"] == 1 and learn["last_step"] == 20
    # monotone-decreasing synthetic curve => trail mean below lead mean
    assert learn["trail_over_lead"] < 1.0
    assert len(learn["curve"]) == 20
    assert rec["checkpoints"] == ["step-10", "step-20"]
    assert rec["note"] == "unit"
    # stdout is a one-line JSON summary without the full curve
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert "curve" not in summary["learning"]


def test_partial_runs_recorded(tmp_path):
    main = tmp_path / "main"
    partial = tmp_path / "partial"
    _write_metrics(str(main), [2.0, 1.9, 1.8])
    _write_metrics(str(partial), [3.0, 2.9])
    art = tmp_path / "A.json"
    out = subprocess.run(
        [sys.executable, os.path.join(_REPO, "tools",
                                      "train_metrics_artifact.py"),
         str(main), "--artifact", str(art),
         "--extra_dirs", str(partial), str(tmp_path / "missing")],
        capture_output=True, text=True, cwd=_REPO)
    assert out.returncode == 0, out.stderr
    rec = json.loads(art.read_text())
    assert len(rec["partial_runs"]) == 1  # missing dir skipped, not fatal
    assert rec["partial_runs"][0]["learning"]["steps_logged"] == 2
