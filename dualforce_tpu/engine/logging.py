"""Metric loggers (behavioural reference: mova/engine/utils/logger.py:172-201 —
wandb | tensorboard | composite | dummy, non-main ranks get Dummy).

This image has no wandb; available sinks: JSONL (always), TensorBoard via
tf.summary (tensorflow is present). `build_logger` mirrors the reference
factory semantics.
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
    return CompositeLogger(loggers)
