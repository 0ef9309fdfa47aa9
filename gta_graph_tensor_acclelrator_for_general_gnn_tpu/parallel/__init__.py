from .partition import PartitionedGraph, partition_graph, pad_nodes
from .dist import (
    AXIS,
    remote_table,
    lower_shard,
    make_dist_apply,
    make_sharded_train_step,
    shard_part,
    shard_tiles,
)
