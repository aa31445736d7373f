"""Mesh + sharding rules (DP/TP via pjit; corpus axis in retrieval/)."""

from .mesh import (DP_AXIS, TP_AXIS, batch_sharding, local_batch_size,
                   make_mesh, replicated)
from .multihost import gather_score_dict, initialize_distributed, is_primary
from .sharding import param_shardings, param_spec, shard_params

__all__ = ["DP_AXIS", "TP_AXIS", "batch_sharding", "local_batch_size",
           "make_mesh", "replicated", "param_shardings", "param_spec",
           "shard_params", "gather_score_dict", "initialize_distributed",
           "is_primary"]
