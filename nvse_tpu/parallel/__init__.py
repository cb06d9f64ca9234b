from .mesh import (
    DATA_AXIS,
    SEQ_AXIS,
    batch_sharding,
    get_mesh,
    replicated_sharding,
    shard_batch,
)
