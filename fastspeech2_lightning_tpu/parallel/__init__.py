from .mesh import (
    make_mesh,
    shard_batch,
    shard_state,
    batch_pspec,
    param_pspec_tree,
    opt_pspec_tree,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "shard_state",
    "batch_pspec",
    "param_pspec_tree",
    "opt_pspec_tree",
]
