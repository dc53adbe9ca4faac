from dualforce_tpu.convert.torch_import import (  # noqa: F401
    convert_audio_dit,
    convert_bridge,
    convert_video_dit,
)
