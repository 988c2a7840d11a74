from .mesh import DATA_AXIS, make_mesh, ray_sharded, replicated  # noqa: F401
from .shard import (  # noqa: F401
    make_sharded_train_step,
    shard_batch,
    shard_state,
    sharded_density_grid_step,
    sharded_train_step,
)
from .swr_shard import (  # noqa: F401
    make_swr_sharded_step,
    shard_swr_batch,
    shard_swr_state,
)
