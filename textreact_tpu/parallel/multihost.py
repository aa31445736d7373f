"""Multi-host (multi-process) support.

Role of the reference's NCCL process topology + dist.all_gather_object for
eval outputs (reference main.py:259-268). TPU-native design: processes are
initialized through jax.distributed; per-example eval scores are gathered
as fixed-shape (index, score) arrays via multihost_utils instead of pickled
python objects, then merged id-keyed (duplicate indices from padding
collapse in the dict union, mirroring the reference's dict-merge trick,
SURVEY.md §4).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize wrapper (no-op when single-process)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def is_primary() -> bool:
    return jax.process_index() == 0


def device_put_global(batch: Dict[str, np.ndarray], sharding) -> Dict[str, "jax.Array"]:
    """Place a host batch onto a (possibly multi-host) mesh.

    Single-process: plain device_put. Multi-process: each host holds its own
    slice of the global batch (process-sharded loader) and the slices are
    assembled into global arrays over DCN via multihost_utils — the
    replacement for DDP's per-rank DataLoader+allreduce topology."""
    if jax.process_count() == 1:
        return {k: jax.device_put(v, sharding) for k, v in batch.items()}
    from jax.experimental import multihost_utils
    return {
        k: multihost_utils.host_local_array_to_global_array(
            v, sharding.mesh, sharding.spec)
        for k, v in batch.items()
    }


def device_put_global_spanning(batch: Dict[str, np.ndarray],
                               sharding) -> Dict[str, "jax.Array"]:
    """Place a host batch onto a mesh whose batch shards SPAN processes.

    host_local_array_to_global_array (device_put_global) requires every
    shard's data to live on the process that feeds it — impossible when tp
    pairs straddle the process boundary, because each dp shard is then
    replicated onto devices of BOTH processes while each host only loaded
    its own rows. Here the host-local rows are all-gathered over DCN first
    (process order = global row order, same contract as device_put_global),
    then every process materializes its addressable shards from the full
    global batch. Single-process: plain device_put."""
    if jax.process_count() == 1:
        return {k: jax.device_put(v, sharding) for k, v in batch.items()}
    from jax.experimental import multihost_utils

    out: Dict[str, "jax.Array"] = {}
    for k, v in batch.items():
        parts = np.asarray(multihost_utils.process_allgather(v))  # (P, n, ...)
        glob = parts.reshape((-1,) + v.shape[1:])
        out[k] = jax.make_array_from_callback(
            glob.shape, sharding, lambda idx, g=glob: g[idx])
    return out


def read_replicated_rows(arr) -> np.ndarray:
    """Assemble the FULL value of a global array from this process's
    addressable shards. Valid only when the addressable shards cover every
    row — e.g. a batch sharded over dp and replicated over a tp axis that
    spans processes (each host holds one member of every tp pair)."""
    out = None
    covered = np.zeros(arr.shape[0] if arr.ndim else 1, dtype=bool)
    for s in arr.addressable_shards:
        if out is None:
            out = np.zeros(arr.shape, np.asarray(s.data).dtype)
        out[s.index] = np.asarray(s.data)
        covered[s.index[0] if s.index else slice(None)] = True
    assert out is not None and covered.all(), (
        "addressable shards do not cover the array; use "
        "global_array_to_host_local_array instead")
    return out


def _pickle_allgather(obj):
    """All-gather an arbitrary picklable object across processes as padded
    uint8 arrays over DCN (the role of dist.all_gather_object,
    reference main.py:259-268). Returns the list of every process's object."""
    import pickle

    from jax.experimental import multihost_utils

    buf = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    sizes = np.asarray(
        multihost_utils.process_allgather(np.array([buf.size], np.int64)))
    max_n = int(sizes.max())
    padded = np.zeros((max_n,), np.uint8)
    padded[: buf.size] = buf
    datas = np.asarray(multihost_utils.process_allgather(padded))
    return [pickle.loads(bytes(d[: int(s)]))
            for d, s in zip(datas, sizes.ravel())]


def gather_prediction_dict(local: Dict[int, Dict]) -> Dict[int, Dict]:
    """Union id-keyed test-prediction dicts across processes (reference
    gather_outputs, main.py:259-268): duplicate ids from shard padding
    collapse in the dict merge. Single-process: identity."""
    if jax.process_count() == 1:
        return local
    merged: Dict[int, Dict] = {}
    for d in _pickle_allgather(local):
        merged.update(d)
    return merged


def gather_score_dict(local: Dict[int, float]) -> Dict[int, float]:
    """Union per-example {index: score} dicts across processes.

    Single-process: identity. Multi-process: pad to the max local count,
    all-gather fixed-shape (index, score) arrays over DCN, drop padding
    (index < 0), merge.
    """
    if jax.process_count() == 1:
        return local
    from jax.experimental import multihost_utils

    n_local = len(local)
    max_n = int(multihost_utils.process_allgather(np.array([n_local])).max())
    idx = np.full((max_n,), -1, dtype=np.int64)
    val = np.zeros((max_n,), dtype=np.float64)
    for i, (k, v) in enumerate(local.items()):
        idx[i] = k
        val[i] = v
    all_idx = multihost_utils.process_allgather(idx)   # (P, max_n)
    all_val = multihost_utils.process_allgather(val)
    merged: Dict[int, float] = {}
    for row_i, row_v in zip(np.asarray(all_idx), np.asarray(all_val)):
        for k, v in zip(row_i, row_v):
            if k >= 0:
                merged[int(k)] = float(v)
    return merged
