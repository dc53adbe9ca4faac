from dualforce_tpu.parallel.mesh import create_mesh  # noqa: F401
from dualforce_tpu.parallel.sharding import (  # noqa: F401
    param_shardings,
    shard_params,
)
