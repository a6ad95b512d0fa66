from recur_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_map_train_chunk,
    shard_train_args,
    sharded_distill_chunk,
    sharded_train_chunk,
)
from recur_tpu.parallel import distributed  # noqa: F401  (multi-host/DCN)
