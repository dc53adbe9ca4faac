"""Orbax checkpointing with auto-resume.

Replaces the reference's `step-N/` checkpoint dirs + `trainer_state.pt` +
accelerator state (accelerate_trainer.py:473-513, auto-resume :110-134).
Layout: <save_dir>/step-<N>/{state, meta.json}; sharded arrays save with their
GSPMD layouts (OCDBT).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import orbax.checkpoint as ocp


def _ckpt(path: str) -> ocp.StandardCheckpointer:
    return ocp.StandardCheckpointer()


def save_checkpoint(save_dir: str, step: int, state: Any,
                    meta: Optional[Dict] = None) -> str:
    path = os.path.join(os.path.abspath(save_dir), f"step-{step}")
    ckptr = _ckpt(path)
    ckptr.save(os.path.join(path, "state"), state, force=True)
    ckptr.wait_until_finished()
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({"global_step": step, **(meta or {})}, f)
    return path


def latest_step(save_dir: str) -> Optional[int]:
    """Scan save_dir for step-N dirs (accelerate_trainer.py:110-134)."""
    if not os.path.isdir(save_dir):
        return None
    steps = [int(m.group(1)) for d in os.listdir(save_dir)
             if (m := re.fullmatch(r"step-(\d+)", d))
             and os.path.exists(os.path.join(save_dir, d, "meta.json"))]
    return max(steps) if steps else None


def restore_checkpoint(save_dir: str, abstract_state: Any,
                       step: Optional[int] = None) -> Tuple[Any, Dict]:
    if step is None:
        step = latest_step(save_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {save_dir}")
    path = os.path.join(os.path.abspath(save_dir), f"step-{step}")
    ckptr = _ckpt(path)
    state = ckptr.restore(os.path.join(path, "state"), abstract_state)
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    return state, meta
