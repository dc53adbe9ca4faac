"""Lightweight registry system.

Replaces the reference's mmengine registries (/root/reference/mova/registry.py:3-31)
with a dependency-free equivalent: named registries mapping `type` strings to
callables, plus `build()` for config-dict dispatch (the mmengine `Config` +
`type=` convention used throughout the reference's training configs).
"""

from __future__ import annotations

import importlib
from typing import Any, Callable, Dict, Optional, Sequence


class Registry:
    def __init__(self, name: str, locations: Sequence[str] = ()):
        self.name = name
        self._items: Dict[str, Callable] = {}
        # Modules that register into this registry, imported lazily on first
        # miss (the reference's mmengine `locations` behavior,
        # mova/registry.py:3-31) — lookups work regardless of import order.
        self._locations = list(locations)

    def register_module(self, name: Optional[str] = None, module: Optional[Callable] = None):
        """Register a callable. Usable as decorator (with or without args) or direct call."""
        if module is not None:
            key = name or module.__name__
            if key in self._items and self._items[key] is not module:
                raise KeyError(f"{key!r} already registered in {self.name}")
            self._items[key] = module
            return module

        def _decorator(mod):
            self.register_module(name=name, module=mod)
            return mod

        return _decorator

    def _import_locations(self) -> None:
        while self._locations:
            importlib.import_module(self._locations.pop())

    def get(self, key: str) -> Callable:
        if key not in self._items:
            self._import_locations()
        if key not in self._items:
            raise KeyError(
                f"{key!r} not found in registry {self.name!r}; available: {sorted(self._items)}"
            )
        return self._items[key]

    def __contains__(self, key: str) -> bool:
        if key not in self._items:
            self._import_locations()
        return key in self._items

    def build(self, cfg: Dict[str, Any], **extra):
        """Instantiate from a config dict: {'type': <name>, **kwargs}."""
        if not isinstance(cfg, dict) or "type" not in cfg:
            raise TypeError(f"build() needs a dict with a 'type' key, got {cfg!r}")
        cfg = dict(cfg)
        cls = self.get(cfg.pop("type"))
        return cls(**cfg, **extra)

    def keys(self):
        return self._items.keys()


# Mirror of the six reference registries (mova/registry.py:3-31), with the
# same lazy `locations` so a bare registry import still resolves names.
DATASETS = Registry("datasets", locations=["dualforce_tpu.data.dataset"])
TRANSFORMS = Registry("transforms", locations=["dualforce_tpu.data.transforms"])
DIFFUSION_PIPELINES = Registry(
    "diffusion_pipelines", locations=["dualforce_tpu.diffusion.pipeline"])
MODELS = Registry("models", locations=[
    "dualforce_tpu.models.factory", "dualforce_tpu.models.dac_vae"])
DIFFUSION_SCHEDULERS = Registry(
    "diffusion_schedulers", locations=["dualforce_tpu.diffusion.flow_match"])
OPTIMIZERS = Registry("optimizers", locations=["dualforce_tpu.engine.optim"])
