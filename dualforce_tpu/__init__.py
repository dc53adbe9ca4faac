"""DualForce-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework for synchronized
text/image -> video+audio (TI2VA) generation, with the capability surface of the
MOVA reference (asymmetric dual-tower DiT + bidirectional cross-attention bridge,
flow-matching samplers, Wan video VAE, DAC audio VAE, UMT5 text encoder, LoRA
training, sequence-parallel inference, serving).

Everything here is a ground-up TPU-first design: one `jax.sharding.Mesh`
(data/fsdp/cp axes) with GSPMD-sharded HBM-resident weights replaces the
reference's FSDP/DeepSpeed/CPU-offload stack; Pallas flash/ring attention
replaces flash-attn+yunchang; the denoise loop compiles to a single XLA program.
"""

__version__ = "0.1.0"

from dualforce_tpu import registry  # noqa: F401
