"""Activation-sharding hints.

A context-scoped way to inject `with_sharding_constraint`s into the model
without threading mesh objects through every function: the pipeline/trainer
opens `sharding_hints(video_tokens=P("data", "cp"), ...)` and the dual-tower
driver calls `constrain(x, "video_tokens")` at the few load-bearing points
(token activations entering/leaving the block scans). Outside the context the
calls are no-ops, so single-chip paths compile unchanged.
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Optional

import jax

_HINTS: contextvars.ContextVar[Optional[dict]] = contextvars.ContextVar(
    "sharding_hints", default=None)


@contextlib.contextmanager
def sharding_hints(**specs):
    token = _HINTS.set(specs)
    try:
        yield
    finally:
        _HINTS.reset(token)


def constrain(x, name: str):
    hints = _HINTS.get()
    if hints and name in hints and hints[name] is not None:
        return jax.lax.with_sharding_constraint(x, hints[name])
    return x
