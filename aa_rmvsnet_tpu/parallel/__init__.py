"""Mesh construction and sharding rules for multi-chip / multi-host runs."""

from .mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    shard_train_batch,
    form_global_batch,
    initialize_distributed,
)
