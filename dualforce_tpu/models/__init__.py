from dualforce_tpu.models import audio_dit, bridge, video_dit  # noqa: F401
from dualforce_tpu.models.dual_tower import forward_dual_tower  # noqa: F401
