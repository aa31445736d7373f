"""Pallas TPU kernel: exact L2 nearest-neighbor search (FAISS-flat parity).

The TPU-native replacement for the reference's faiss.IndexFlatL2 build+query
(reference retrieve/retrieve_faiss.py:62-74). Design:

- fingerprints are int8 matrices; `q . c` runs on the MXU with int32
  accumulation, so L2^2 = |q|^2 - 2 q.c + |c|^2 is EXACT integer math and
  rank order is bit-faithful to a float64 brute-force scan;
- the corpus streams through VMEM in (TILE_C, d) blocks along the inner grid
  dimension while a running per-query top-k (values + global indices) lives
  in VMEM scratch — no HBM round-trips for intermediates;
- top-k selection is a dynamic-count insertion loop: per iteration, extract
  the per-row tile minimum and insert it (sorted, lexicographic by
  (distance, index)) into the running top-k, looping only while some row can
  still improve — so selection costs O(new top-k entries) sweeps per tile,
  not O(k). Ties reproduce faiss behavior (lowest corpus index wins);
- per-query banned ids (for masked retrieval, e.g. self/gold removal) are
  applied on-chip by pushing banned columns to +inf before selection.

The kernel runs `interpret=True` on CPU (tests) and compiled on TPU.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 2**30  # int sentinel (python int so kernels do not capture a traced const)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _merge_tile(scores, col_idx, rv, ri, k):
    """Merge one tile of scores into a sorted running top-k.

    Dynamic-count insertion loop: per iteration, extract the per-row tile
    minimum and, for rows where it beats the current k-th distance, insert
    it into the sorted running (values, indices) — lexicographic
    (value, index) order, so ties keep the lowest corpus index exactly like
    faiss. Runs only while some row can still improve: a tile costs one
    min-sweep plus one sweep per element that actually enters the top-k.
    """
    tq = scores.shape[0]
    slot = jax.lax.broadcasted_iota(jnp.int32, (tq, k), 1)

    def cond(state):
        rv, _, sc = state
        return jnp.any(jnp.min(sc, axis=1) < rv[:, k - 1])

    def body(state):
        rv, ri, sc = state
        m = jnp.min(sc, axis=1)
        improved = m < rv[:, k - 1]
        at_min = sc == m[:, None]
        cidx = jnp.min(jnp.where(at_min, col_idx, BIG), axis=1)
        sel = at_min & (col_idx == cidx[:, None]) & improved[:, None]
        sc = jnp.where(sel, BIG, sc)
        pos = jnp.sum((rv < m[:, None]) |
                      ((rv == m[:, None]) & (ri < cidx[:, None])), axis=1)
        prev_v = pltpu.roll(rv, 1, 1)
        prev_i = pltpu.roll(ri, 1, 1)
        new_v = jnp.where(slot < pos[:, None], rv,
                          jnp.where(slot == pos[:, None], m[:, None], prev_v))
        new_i = jnp.where(slot < pos[:, None], ri,
                          jnp.where(slot == pos[:, None], cidx[:, None], prev_i))
        rv = jnp.where(improved[:, None], new_v, rv)
        ri = jnp.where(improved[:, None], new_i, ri)
        return rv, ri, sc

    rv, ri, _ = jax.lax.while_loop(cond, body, (rv, ri, scores))
    return rv, ri


def _tile_scores(q_ref, c_ref, cnorm_ref, banned_ref, ci, tile_c):
    """MXU matmul + masking for one (query-tile, corpus-tile) pair."""
    dots = jax.lax.dot_general(
        q_ref[:], c_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    scores = cnorm_ref[0, :][None, :] - 2 * dots
    col_idx = ci * tile_c + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(cnorm_ref[0, :][None, :] >= BIG, BIG, scores)
    for b in range(banned_ref.shape[1]):
        scores = jnp.where(col_idx == banned_ref[:, b][:, None], BIG, scores)
    return scores, col_idx


def _topk_kernel(q_ref, c_ref, cnorm_ref, banned_ref, vals_ref, idx_ref,
                 run_vals, run_idx, *, k: int, tile_c: int, num_c_tiles: int,
                 packed: bool = False):
    """Query-outer layout: grid (num_q, num_c), per-query-tile scratch; good
    when the corpus dominates HBM traffic per query batch."""
    del packed  # unified algorithm
    ci = pl.program_id(1)

    @pl.when(ci == 0)
    def _():
        run_vals[:] = jnp.full_like(run_vals, BIG)
        run_idx[:] = jnp.full_like(run_idx, BIG)

    scores, col_idx = _tile_scores(q_ref, c_ref, cnorm_ref, banned_ref, ci,
                                   tile_c)
    rv, ri = _merge_tile(scores, col_idx, run_vals[:], run_idx[:], k)
    run_vals[:] = rv
    run_idx[:] = ri

    @pl.when(ci == num_c_tiles - 1)
    def _():
        vals_ref[:] = run_vals[:]
        idx_ref[:] = run_idx[:]


def _topk_kernel_corpus_resident(q_ref, c_ref, cnorm_ref, banned_ref,
                                 vals_ref, idx_ref, run_vals, run_idx, *,
                                 k: int, tile_q: int, tile_c: int,
                                 num_c_tiles: int):
    """Corpus-resident layout: grid (num_c, num_q) with the query dimension
    innermost, so each corpus tile stays in VMEM while every query tile
    visits it — the corpus streams from HBM ONCE per search instead of once
    per query tile. The running top-k for ALL query tiles lives in a
    (M, k) VMEM scratch (the engine bounds M so it fits). This is the
    index-build mode (train self-retrieval has M ~ N)."""
    ci = pl.program_id(0)
    qi = pl.program_id(1)
    rows = pl.ds(qi * tile_q, tile_q)

    @pl.when(ci == 0)
    def _():
        run_vals[rows, :] = jnp.full((tile_q, k), BIG, jnp.int32)
        run_idx[rows, :] = jnp.full((tile_q, k), BIG, jnp.int32)

    scores, col_idx = _tile_scores(q_ref, c_ref, cnorm_ref, banned_ref, ci,
                                   tile_c)
    rv, ri = _merge_tile(scores, col_idx, run_vals[rows, :], run_idx[rows, :], k)
    run_vals[rows, :] = rv
    run_idx[rows, :] = ri

    @pl.when(ci == num_c_tiles - 1)
    def _():
        vals_ref[:] = rv
        idx_ref[:] = ri


# largest running-top-k scratch the corpus-resident layout may allocate in
# VMEM. The (M, k) int32 scratch is lane-padded to (M, 128), so budget
# 2 * M * 128 * 4 bytes.
_RESIDENT_SCRATCH_BYTES = 6 * 1024 * 1024


def resident_scratch_bytes(m: int, k: int) -> int:
    lanes = max(k, 128)
    return 2 * m * lanes * 4


def max_resident_queries(k: int, tile_q: int = 128) -> int:
    m = _RESIDENT_SCRATCH_BYTES // (2 * max(k, 128) * 4)
    return (m // tile_q) * tile_q


@functools.partial(jax.jit, static_argnames=("k", "tile_q", "tile_c",
                                             "interpret", "packed",
                                             "corpus_resident"))
def exact_topk_l2(queries: jax.Array, corpus: jax.Array,
                  corpus_norms: jax.Array,
                  banned: Optional[jax.Array] = None, *, k: int = 20,
                  tile_q: int = 128, tile_c: int = 1024,
                  interpret: bool = False,
                  packed: bool = False,
                  corpus_resident: bool = False) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k smallest L2^2 distances.

    queries: (M, d) int8, corpus: (N, d) int8 — d a multiple of 128, M/N
    multiples of the tile sizes (pad with `pad_matrix`); corpus_norms: (N,)
    int32 with >= BIG marking padding rows; banned: (M, NB) int32 global
    corpus indices excluded per query (use -1 for none).

    corpus_resident=True selects the (num_c, num_q) grid layout where each
    corpus tile is visited by every query tile before moving on — the
    corpus streams from HBM once per search instead of once per query tile
    (use for index-build workloads with many query tiles; requires the
    (M, k) running top-k to fit VMEM).

    Returns (distances (M, k) int32 INCLUDING |q|^2, indices (M, k) int32).
    """
    M, d = queries.shape
    N, d2 = corpus.shape
    assert d == d2 and d % 128 == 0, (d, d2)
    assert M % tile_q == 0 and N % tile_c == 0, (M, N)
    if banned is None:
        banned = jnp.full((M, 1), -1, dtype=jnp.int32)
    num_q, num_c = M // tile_q, N // tile_c

    if corpus_resident:
        assert resident_scratch_bytes(M, k) <= _RESIDENT_SCRATCH_BYTES, (M, k)
        kernel = functools.partial(_topk_kernel_corpus_resident, k=k,
                                   tile_q=tile_q, tile_c=tile_c,
                                   num_c_tiles=num_c)
        vals, idx = pl.pallas_call(
            kernel,
            grid=(num_c, num_q),
            in_specs=[
                pl.BlockSpec((tile_q, d), lambda ci, qi: (qi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_c, d), lambda ci, qi: (ci, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_c), lambda ci, qi: (0, ci),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_q, banned.shape[1]), lambda ci, qi: (qi, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((tile_q, k), lambda ci, qi: (qi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_q, k), lambda ci, qi: (qi, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((M, k), jnp.int32),
                jax.ShapeDtypeStruct((M, k), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((M, k), jnp.int32),
                pltpu.VMEM((M, k), jnp.int32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * M * N * d,
                bytes_accessed=M * d * num_c + N * d + M * k * 8,
                transcendentals=0),
            interpret=interpret,
        )(queries, corpus, corpus_norms[None, :], banned)
        qnorm = jnp.sum(queries.astype(jnp.int32) ** 2, axis=1, keepdims=True)
        return vals + qnorm, idx

    if packed:
        # packed keys must fit below the BIG sentinel
        assert (3 * d + 2) << tile_c.bit_length() < BIG, (d, tile_c)
    kernel = functools.partial(_topk_kernel, k=k, tile_c=tile_c,
                               num_c_tiles=num_c, packed=packed)
    vals, idx = pl.pallas_call(
        kernel,
        grid=(num_q, num_c),
        in_specs=[
            pl.BlockSpec((tile_q, d), lambda qi, ci: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_c, d), lambda qi, ci: (ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_c), lambda qi, ci: (0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, banned.shape[1]), lambda qi, ci: (qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_q, k), lambda qi, ci: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, k), lambda qi, ci: (qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, k), jnp.int32),
            jax.ShapeDtypeStruct((M, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_q, k), jnp.int32),
            pltpu.VMEM((tile_q, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * d, bytes_accessed=M * d + N * d * num_q + M * k * 8,
            transcendentals=0),
        interpret=interpret,
    )(queries, corpus, corpus_norms[None, :], banned)

    qnorm = jnp.sum(queries.astype(jnp.int32) ** 2, axis=1, keepdims=True)
    return vals + qnorm, idx


def pad_matrix(x: np.ndarray, row_multiple: int, col_multiple: int = 128
               ) -> np.ndarray:
    """Zero-pad rows/cols up to tile multiples."""
    r = _cdiv(x.shape[0], row_multiple) * row_multiple
    c = _cdiv(x.shape[1], col_multiple) * col_multiple
    if (r, c) == x.shape:
        return x
    out = np.zeros((r, c), dtype=x.dtype)
    out[: x.shape[0], : x.shape[1]] = x
    return out


def corpus_norms_padded(corpus: np.ndarray, n_real: int) -> np.ndarray:
    """int32 squared norms with BIG sentinel on padding rows."""
    norms = (corpus.astype(np.int64) ** 2).sum(axis=1).astype(np.int32)
    norms[n_real:] = np.int32(2**30)
    return norms


def numpy_reference_topk(queries: np.ndarray, corpus: np.ndarray, k: int,
                         banned: Optional[np.ndarray] = None
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """Brute-force faiss-flat semantics: ascending distance, ties by lower
    index (the parity oracle for the kernel).

    The GEMM runs in float64 BLAS rather than numpy's loop-based integer
    matmul (30+ min at N=700k): every product of int8 entries summed over
    d<=2^13 stays below 127*127*2^13 < 2^27 << 2^53, so float64
    accumulation is bit-exact and the int64 cast below is lossless.
    The corpus is processed in slabs so the float64/int64 temporaries stay
    bounded (a whole-corpus float64 copy is 82 GB at N=10M — the r5
    retrieval-scaling sweep OOMed the host on exactly that)."""
    q64 = queries.astype(np.float64)
    qq = (queries.astype(np.int64) ** 2).sum(1)
    n = corpus.shape[0]
    d2 = np.empty((queries.shape[0], n), np.int64)
    slab = 500_000
    for i in range(0, n, slab):
        j = min(i + slab, n)
        c = corpus[i:j]
        dot = (q64 @ c.astype(np.float64).T).astype(np.int64)
        cc = (c.astype(np.int64) ** 2).sum(1)
        d2[:, i:j] = qq[:, None] - 2 * dot + cc[None, :]
    if banned is not None:
        for i in range(queries.shape[0]):
            for b in banned[i]:
                if 0 <= b < n:
                    d2[i, b] = np.iinfo(np.int32).max
    idx = np.argsort(d2, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(d2, idx, axis=1).astype(np.int32), idx.astype(np.int32)
