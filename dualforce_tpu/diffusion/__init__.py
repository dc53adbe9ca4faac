from dualforce_tpu.diffusion.flow_match import (  # noqa: F401
    FlowMatchPairScheduler,
    FlowMatchScheduler,
)
