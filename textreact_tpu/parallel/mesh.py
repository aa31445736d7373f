"""Device mesh construction.

Replaces the reference's DDP/NCCL process topology (reference main.py:372,
scripts NCCL_P2P_DISABLE=1) with a jax.sharding.Mesh over ICI: axes
('dp', 'tp') — data parallelism is the workhorse (the reference's only
strategy, SURVEY.md §2.3); the tensor axis is available for larger models.
The retrieval engine builds its own 1-D corpus mesh (retrieval/engine.py).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"
TP_AXIS = "tp"


def make_mesh(dp_size: int = -1, tp_size: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp_size == -1:
        assert n % tp_size == 0, (n, tp_size)
        dp_size = n // tp_size
    assert dp_size * tp_size <= n, (dp_size, tp_size, n)
    grid = np.array(devices[: dp_size * tp_size]).reshape(dp_size, tp_size)
    return Mesh(grid, (DP_AXIS, TP_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over dp; replicate over tp."""
    return NamedSharding(mesh, P(DP_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    dp = mesh.shape[DP_AXIS]
    assert global_batch % dp == 0, (global_batch, dp)
    return global_batch // dp
