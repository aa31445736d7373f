"""Sharded exact nearest-neighbor engine (the TPU FAISS-flat replacement).

Role of reference retrieve/retrieve_faiss.py: build an exact L2 index over
fingerprint vectors and query top-20 neighbors. TPU-native design
(BASELINE.json north star):

- the corpus matrix is SHARDED row-wise across the device mesh's HBM
  ('corpus' axis); each device runs the fused Pallas matmul+top-k kernel
  (ops/topk.py) over its shard;
- per-shard top-k results are all-gathered over ICI and merged with a
  two-key lexicographic sort (distance, then corpus index) that preserves
  faiss tie order end-to-end;
- masked retrieval (self/gold removal, reference dataset.py:74-76) is a
  per-query banned-id list applied on-chip, not a host-side filter.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.topk import (BIG, corpus_norms_padded, exact_topk_l2,
                        numpy_reference_topk, pad_matrix)

CORPUS_AXIS = "corpus"

# Layout-switch rule, calibrated by benchmarks/retrieval_scaling.py
# (BASELINE.md round-5 qps-vs-N curve): the query-outer layout (corpus
# re-streamed from HBM per 128-query tile) wins at moderate corpus sizes;
# past this many corpus rows the corpus-resident grid layout (corpus
# streamed once, running top-k in VMEM scratch) takes over per
# measurement. Pass corpus_resident=True/False to override.
CORPUS_RESIDENT_MIN_N = 2_000_000


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


class FlatIndex:
    """Exact (flat) L2 index over int8 fingerprint vectors."""

    def __init__(self, corpus_fps: np.ndarray, mesh: Optional[Mesh] = None,
                 tile_q: int = 128, tile_c: int = 2048,
                 interpret: Optional[bool] = None,
                 corpus_resident: Optional[bool] = None):
        assert corpus_fps.dtype == np.int8, corpus_fps.dtype
        self.n_real = corpus_fps.shape[0]
        self.tile_q = tile_q
        self.mesh = mesh
        self.n_shards = mesh.shape[CORPUS_AXIS] if mesh is not None else 1
        if interpret is None:
            interpret = jax.default_backend() == "cpu"
        self.interpret = interpret
        # corpus-resident grid layout: None selects by corpus size via the
        # measured CORPUS_RESIDENT_MIN_N crossover (query-outer measured
        # faster below it, see NOTES.md + BASELINE.md scaling curve); the
        # per-call guards in search() still require a large enough query set
        self.corpus_resident = (self.n_real >= CORPUS_RESIDENT_MIN_N
                                if corpus_resident is None
                                else corpus_resident)
        # binary fingerprints enable the packed-key kernel fast path
        self.corpus_binary = (corpus_fps.size == 0 or
                              (corpus_fps.min() >= 0 and corpus_fps.max() <= 1))

        # pad rows so every shard is a whole number of corpus tiles
        tile_c = min(tile_c, _cdiv(max(self.n_real, 1), self.n_shards))
        tile_c = max(8, tile_c)
        self.tile_c = tile_c
        row_mult = tile_c * self.n_shards
        padded = pad_matrix(corpus_fps, row_mult)
        norms = corpus_norms_padded(padded, self.n_real)
        self.n_padded = padded.shape[0]
        self.dim = padded.shape[1]
        self.shard_rows = self.n_padded // self.n_shards

        if mesh is not None:
            self.corpus = jax.device_put(
                jnp.asarray(padded), NamedSharding(mesh, P(CORPUS_AXIS, None)))
            self.norms = jax.device_put(
                jnp.asarray(norms), NamedSharding(mesh, P(CORPUS_AXIS)))
        else:
            self.corpus = jnp.asarray(padded)
            self.norms = jnp.asarray(norms)
        self._search_fn = None

    # ------------------------------------------------------------------
    def _build_search(self, k: int, nb: int, packed: bool,
                      corpus_resident: bool = False):
        tile_q, tile_c, interpret = self.tile_q, self.tile_c, self.interpret
        shard_rows = self.shard_rows

        if self.mesh is None:
            def search(queries, corpus, norms, banned):
                return exact_topk_l2(queries, corpus, norms, banned, k=k,
                                     tile_q=tile_q, tile_c=tile_c,
                                     interpret=interpret, packed=packed,
                                     corpus_resident=corpus_resident)
            return jax.jit(search)

        mesh = self.mesh

        def local_search(queries, corpus, norms, banned):
            shard = jax.lax.axis_index(CORPUS_AXIS)
            offset = shard * shard_rows
            vals, idx = exact_topk_l2(
                queries, corpus, norms, banned - offset, k=k,
                tile_q=tile_q, tile_c=tile_c, interpret=interpret,
                packed=packed, corpus_resident=corpus_resident)
            idx = jnp.where(idx >= BIG, idx, idx + offset)
            return vals[None], idx[None]

        sharded = shard_map(
            local_search, mesh=mesh,
            in_specs=(P(), P(CORPUS_AXIS, None), P(CORPUS_AXIS), P()),
            out_specs=(P(CORPUS_AXIS), P(CORPUS_AXIS)),
            check_vma=False,  # pallas_call outputs carry no vma metadata
        )

        @jax.jit
        def search(queries, corpus, norms, banned):
            vals_s, idx_s = sharded(queries, corpus, norms, banned)
            # (S, M, k) -> (M, S*k); merge with (distance, index) lex order
            M = vals_s.shape[1]
            vals = jnp.moveaxis(vals_s, 0, 1).reshape(M, -1)
            idx = jnp.moveaxis(idx_s, 0, 1).reshape(M, -1)
            vals, idx = jax.lax.sort((vals, idx), dimension=1, num_keys=2)
            return vals[:, :k], idx[:, :k]

        return search

    # ------------------------------------------------------------------
    def search(self, queries: np.ndarray, k: int = 20,
               banned: Optional[np.ndarray] = None
               ) -> Tuple[np.ndarray, np.ndarray]:
        """Top-k (distances, indices), faiss-flat semantics. `banned` is
        (M, NB) int32 global corpus ids to exclude per query (-1 = none)."""
        assert queries.dtype == np.int8, queries.dtype
        M = queries.shape[0]
        q = pad_matrix(queries, self.tile_q, 128)
        assert q.shape[1] == self.dim, (q.shape, self.dim)
        if banned is None:
            banned_arr = np.full((q.shape[0], 1), -1, dtype=np.int32)
        else:
            banned_arr = np.full((q.shape[0], banned.shape[1]), -1, dtype=np.int32)
            banned_arr[:M] = banned
        packed = (self.corpus_binary and queries.min() >= 0
                  and queries.max() <= 1
                  and (3 * self.dim + 2) << self.tile_c.bit_length() < BIG)
        # corpus-resident layout: stream the corpus once per chunk of
        # queries instead of once per 128-query tile (index-build workloads);
        # large query sets are processed in fixed-size chunks so the running
        # top-k fits VMEM scratch and one compilation serves every chunk
        from ..ops.topk import max_resident_queries
        chunk = max_resident_queries(k, self.tile_q)
        resident = (self.corpus_resident and q.shape[0] // self.tile_q >= 8
                    and chunk >= 8 * self.tile_q)
        if resident and q.shape[0] > chunk:
            out_v = np.empty((M, k), np.int32)
            out_i = np.empty((M, k), np.int32)
            for start in range(0, M, chunk):
                stop = min(start + chunk, M)
                v, i = self.search(queries[start:stop], k=k,
                                   banned=None if banned is None
                                   else banned[start:stop])
                out_v[start:stop] = v
                out_i[start:stop] = i
            return out_v, out_i
        key = (k, banned_arr.shape[1], packed, resident, q.shape[0])
        if self._search_fn is None or self._search_key != key:
            self._search_fn = self._build_search(k, banned_arr.shape[1], packed,
                                                 resident)
            self._search_key = key
        vals, idx = self._search_fn(jnp.asarray(q), self.corpus, self.norms,
                                    jnp.asarray(banned_arr))
        return np.asarray(vals)[:M], np.asarray(idx)[:M]

    def reference_search(self, queries: np.ndarray, k: int = 20,
                         banned: Optional[np.ndarray] = None):
        """Brute-force numpy oracle over the same (unpadded) data."""
        corpus = np.asarray(jax.device_get(self.corpus))[: self.n_real]
        return numpy_reference_topk(queries, corpus, k, banned)


def build_neighbor_file(ids: Sequence[str], train_ids: Sequence[str],
                        index: FlatIndex, query_fps: np.ndarray,
                        k: int = 20) -> List[Dict]:
    """{id, nn} records like retrieve_faiss.py:116-130 writes."""
    _, idx = index.search(query_fps, k=k)
    return [{"id": qid, "nn": [train_ids[j] for j in row if j < len(train_ids)]}
            for qid, row in zip(ids, idx.tolist())]
