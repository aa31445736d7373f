"""Parameter partitioning rules (Megatron-style tensor parallelism).

Instead of NCCL modules, parallelism is expressed as PartitionSpecs on the
param pytree; XLA SPMD inserts the all-reduces. Rules, keyed on param path:

- attention query/key/value kernels:     (hidden, H*D)   -> P(None, 'tp')
- attention output kernel:               (H*D, hidden)   -> P('tp', None)
- FFN intermediate kernel:               (hidden, ffn)   -> P(None, 'tp')
- FFN output kernel:                     (ffn, hidden)   -> P('tp', None)
- matching bias vectors of column-split layers -> P('tp')
- embeddings / norms / heads: replicated.

With tp_size == 1 everything degenerates to replication (the reference's
pure-DP regime).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import TP_AXIS

COLUMN_SPLIT = ("query", "key", "value", "intermediate")   # shard out-features
ROW_SPLIT_HINT = ("output",)                                # shard in-features


def param_spec(path: Tuple[str, ...], value: Any) -> P:
    names = [p.key if hasattr(p, "key") else str(p) for p in path]
    leaf = names[-1]
    parents = set(names[:-1])
    if leaf == "kernel" and value.ndim == 2:
        if parents & set(COLUMN_SPLIT):
            return P(None, TP_AXIS)
        if parents & set(ROW_SPLIT_HINT):
            return P(TP_AXIS, None)
    if leaf == "bias" and value.ndim == 1 and (parents & set(COLUMN_SPLIT)):
        return P(TP_AXIS)
    return P()


def param_shardings(mesh: Mesh, params: Any) -> Any:
    """PyTree of NamedShardings matching `params`."""
    return jax.tree_util.tree_map_with_path(
        lambda path, v: NamedSharding(mesh, param_spec(path, v)), params)


def shard_params(mesh: Mesh, params: Any) -> Any:
    return jax.device_put(params, param_shardings(mesh, params))


def zero1_opt_state(mesh: Mesh, opt_state: Any) -> Any:
    """ZeRO-1: shard large optimizer moments over the dp axis.

    The reference's regime replicates optimizer state per GPU (DDP); at
    larger scales the Adam moments dominate HBM, so leaves that match a
    parameter's shape get their first >=dp-divisible axis sharded over
    'dp'. XLA inserts the gathers around the (cheap) optimizer update.
    """
    from .mesh import DP_AXIS
    dp = mesh.shape[DP_AXIS]

    def spec(x):
        if not hasattr(x, "ndim") or x.ndim == 0:
            return NamedSharding(mesh, P())
        for axis in range(x.ndim):
            if x.shape[axis] % dp == 0 and x.shape[axis] >= dp:
                parts = [None] * x.ndim
                parts[axis] = DP_AXIS
                return NamedSharding(mesh, P(*parts))
        return NamedSharding(mesh, P())

    return jax.tree.map(lambda x: jax.device_put(x, spec(x)), opt_state)


def ensure_mesh_placement(mesh: Mesh, tree: Any) -> Any:
    """Replicate every leaf that doesn't already carry a NamedSharding on
    `mesh` (freshly-created optimizer scalars, checkpoint-restored arrays) so
    jitted steps never see mixed device commitments."""
    rep = NamedSharding(mesh, P())

    def place(x):
        if hasattr(x, "sharding") and isinstance(x.sharding, NamedSharding) \
                and x.sharding.mesh == mesh:
            return x
        return jax.device_put(x, rep)

    return jax.tree.map(place, tree)
