"""Device mesh & sharding utilities (ICI data-parallel + spatial)."""

from s1s2.parallel.mesh import (
    make_mesh,
    make_mesh_for_batch,
    replicated,
    shard_batch,
    shard_predict_batch,
    shard_train_step,
    tp_sharding_tree,
    initialize_distributed,
)

__all__ = [
    "make_mesh",
    "make_mesh_for_batch",
    "replicated",
    "shard_batch",
    "shard_predict_batch",
    "shard_train_step",
    "tp_sharding_tree",
    "initialize_distributed",
]
