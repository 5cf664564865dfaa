from .mesh import (
    DATA_AXIS,
    SEQ_AXIS,
    batch_sharding,
    constrain_targets_seq,
    has_seq_axis,
    make_mesh,
    replicated_sharding,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "SEQ_AXIS",
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "constrain_targets_seq",
    "has_seq_axis",
]
