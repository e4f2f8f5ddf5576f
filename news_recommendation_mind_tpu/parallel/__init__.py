from .mesh import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
]

from .sharded_embedding import (
    ShardedWordEmbedding,
    pad_vocab,
    partition_rules,
    shard_train_state,
    sharded_lookup,
    state_shardings,
)

__all__ += [
    "ShardedWordEmbedding",
    "pad_vocab",
    "partition_rules",
    "shard_train_state",
    "sharded_lookup",
    "state_shardings",
]
