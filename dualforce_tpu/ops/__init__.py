from dualforce_tpu.ops.attention import attention, attention_ref  # noqa: F401
from dualforce_tpu.ops.rope import (  # noqa: F401
    apply_rope_half,
    apply_rope_interleaved,
    build_aligned_cross_rope,
    build_audio_freqs,
    build_video_freqs,
    precompute_freqs_1d,
    precompute_freqs_3d,
)
