"""Load reference (torch) modules from /root/reference as numerical oracles.

The reference depends on diffusers/mmengine/audiotools, none of which are in
this image. We inject minimal local stubs (our own code — only enough surface
for the reference modules to import), then import the reference read-only and
compare its CPU outputs against our JAX implementations on tiny configs.
"""

from __future__ import annotations

import functools
import importlib
import sys
import types

REF_PATH = "/root/reference"


def _mk(name: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    sys.modules[name] = mod
    return mod


def install_stubs() -> None:
    if "diffusers" in sys.modules:
        return
    import torch.nn as nn

    # --- diffusers ------------------------------------------------------
    diffusers = _mk("diffusers")
    cfg_utils = _mk("diffusers.configuration_utils")

    class ConfigMixin:
        pass

    def register_to_config(fn):
        @functools.wraps(fn)
        def wrapper(self, *args, **kwargs):
            return fn(self, *args, **kwargs)

        return wrapper

    cfg_utils.ConfigMixin = ConfigMixin
    cfg_utils.register_to_config = register_to_config

    models = _mk("diffusers.models")
    modeling_utils = _mk("diffusers.models.modeling_utils")

    class ModelMixin(nn.Module):
        pass

    modeling_utils.ModelMixin = ModelMixin
    models.modeling_utils = modeling_utils

    schedulers = _mk("diffusers.schedulers")
    sched_utils = _mk("diffusers.schedulers.scheduling_utils")

    class SchedulerMixin:
        pass

    sched_utils.SchedulerMixin = SchedulerMixin
    schedulers.scheduling_utils = sched_utils

    class FlowMatchEulerDiscreteScheduler:  # only registered, never exercised
        pass

    schedulers.FlowMatchEulerDiscreteScheduler = FlowMatchEulerDiscreteScheduler

    utils = _mk("diffusers.utils")
    acc_utils = _mk("diffusers.utils.accelerate_utils")

    def apply_forward_hook(fn):
        return fn

    acc_utils.apply_forward_hook = apply_forward_hook
    utils.accelerate_utils = acc_utils

    diffusers.configuration_utils = cfg_utils
    diffusers.models = models
    diffusers.schedulers = schedulers
    diffusers.utils = utils

    # --- yunchang (reference's own fallback stub lacks AttnType.FA) -----
    yunchang = _mk("yunchang")

    class LongContextAttention:
        def __init__(self, *a, **k):
            raise NotImplementedError("stub")

    yunchang.LongContextAttention = LongContextAttention

    def set_seq_parallel_pg(*a, **k):
        raise NotImplementedError("stub")

    yunchang.set_seq_parallel_pg = set_seq_parallel_pg
    yc_kernels = _mk("yunchang.kernels")

    class AttnType:
        FA = "fa"
        FA3 = "fa3"
        TORCH = "torch"

    yc_kernels.AttnType = AttnType
    yunchang.kernels = yc_kernels

    # --- mmengine -------------------------------------------------------
    mmengine = _mk("mmengine")
    mm_registry = _mk("mmengine.registry")

    class Registry:
        def __init__(self, name, locations=None):
            self.name = name
            self._items = {}

        def register_module(self, name=None, module=None):
            if module is not None:
                self._items[name or module.__name__] = module
                return module

            def deco(mod):
                self._items[name or mod.__name__] = mod
                return mod

            return deco

        def get(self, key):
            return self._items[key]

    mm_registry.Registry = Registry
    mmengine.registry = mm_registry

    # --- audiotools (only needed so dac_vae.py imports) -----------------
    audiotools = _mk("audiotools")

    class AudioSignal:
        def __init__(self, *a, **k):
            raise NotImplementedError("stub")

    audiotools.AudioSignal = AudioSignal
    at_ml = _mk("audiotools.ml")

    class BaseModel(nn.Module):
        pass

    at_ml.BaseModel = BaseModel
    audiotools.ml = at_ml


def _install_ftfy_stub():
    if "ftfy" in sys.modules:
        return
    import importlib.machinery

    ftfy = _mk("ftfy")
    # a None __spec__ breaks transformers' importlib.util.find_spec probing
    ftfy.__spec__ = importlib.machinery.ModuleSpec("ftfy", loader=None)
    ftfy.fix_text = lambda t: t


def load(module: str):
    """Import a reference module, e.g. load('mova.diffusion.models.wan_video_dit')."""
    install_stubs()
    _install_ftfy_stub()
    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    return importlib.import_module(module)
