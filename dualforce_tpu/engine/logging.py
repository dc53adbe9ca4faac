"""Metric loggers (behavioural reference: mova/engine/utils/logger.py:172-201 —
wandb | tensorboard | composite | dummy, non-main ranks get Dummy).

Available sinks: JSONL (always), TensorBoard via tf.summary, and a wandb sink
behind an import guard (wandb is absent in this image). `build_logger` mirrors
the reference factory semantics.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional


class BaseLogger:
    def log_scalars(self, metrics: Dict[str, float], step: int) -> None:
        raise NotImplementedError

    def close(self) -> None:
        pass


class DummyLogger(BaseLogger):
    def log_scalars(self, metrics, step):
        pass


class JsonlLogger(BaseLogger):
    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._f = open(path, "a")

    def log_scalars(self, metrics, step):
        rec = {"step": step, "time": time.time(),
               **{k: float(v) for k, v in metrics.items()}}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self):
        self._f.close()


class TensorBoardLogger(BaseLogger):
    def __init__(self, log_dir: str):
        import tensorflow as tf  # baked into the image

        self._tf = tf
        self._writer = tf.summary.create_file_writer(log_dir)

    def log_scalars(self, metrics, step):
        with self._writer.as_default():
            for k, v in metrics.items():
                self._tf.summary.scalar(k, float(v), step=step)
        self._writer.flush()

    def close(self):
        self._writer.close()


class WandbLogger(BaseLogger):
    """W&B sink (reference logger.py:40-77). The image lacks wandb, so the
    import is guarded; when wandb exists this mirrors the reference's
    init(project, name, config)/log/finish lifecycle."""

    def __init__(self, log_dir: str, project: str = "dualforce-tpu",
                 run_name: Optional[str] = None, config: Optional[Dict] = None):
        import wandb  # guarded: absent in this image

        self._wandb = wandb
        self._run = wandb.init(project=project, name=run_name, dir=log_dir,
                               config=config or {}, resume="allow")

    def log_scalars(self, metrics, step):
        self._wandb.log({k: float(v) for k, v in metrics.items()}, step=step)

    def close(self):
        self._run.finish()


class CompositeLogger(BaseLogger):
    def __init__(self, loggers: List[BaseLogger]):
        self.loggers = loggers

    def log_scalars(self, metrics, step):
        for lg in self.loggers:
            lg.log_scalars(metrics, step)

    def close(self):
        for lg in self.loggers:
            lg.close()


def build_logger(kind: Optional[str], log_dir: str, is_main: bool = True) -> BaseLogger:
    if not is_main or kind in (None, "none"):
        return DummyLogger()
    loggers: List[BaseLogger] = [JsonlLogger(os.path.join(log_dir, "metrics.jsonl"))]
    if kind in ("tensorboard", "both"):
        try:
            loggers.append(TensorBoardLogger(log_dir))
        except Exception as e:  # noqa: BLE001
            print(f"[logger] tensorboard requested but unavailable ({e!r}); "
                  "continuing with JSONL only")
    if kind in ("wandb", "both"):
        try:
            loggers.append(WandbLogger(log_dir))
        except Exception as e:  # noqa: BLE001
            print(f"[logger] wandb requested but unavailable ({e!r}); "
                  "continuing without it")
    return CompositeLogger(loggers)
