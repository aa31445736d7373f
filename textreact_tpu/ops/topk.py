"""Pallas TPU kernel: exact L2 nearest-neighbor search (FAISS-flat parity).

The TPU-native replacement for the reference's faiss.IndexFlatL2 build+query
(reference retrieve/retrieve_faiss.py:62-74). Design:

- fingerprints are int8 matrices; `q . c` runs on the MXU with int32
  accumulation, so L2^2 = |q|^2 - 2 q.c + |c|^2 is EXACT integer math and
  rank order is bit-faithful to a float64 brute-force scan;
- the corpus streams through VMEM in (TILE_C, d) blocks along the inner grid
  dimension while a running per-query top-k (values + global indices) lives
  in VMEM scratch — no HBM round-trips for intermediates;
- top-k selection is k passes of vectorized argmin over
  [running-topk ++ tile-scores]; the argmin's first-occurrence tie rule plus
  ascending tile order reproduces faiss's tie behavior (lowest corpus index
  wins equal distances);
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


def _topk_kernel(q_ref, c_ref, cnorm_ref, banned_ref, vals_ref, idx_ref,
                 run_vals, run_idx, *, k: int, tile_c: int, num_c_tiles: int):
    ci = pl.program_id(1)

    @pl.when(ci == 0)
    def _():
        run_vals[:] = jnp.full_like(run_vals, BIG)
        run_idx[:] = jnp.full_like(run_idx, BIG)

    q = q_ref[:]                        # (TQ, d) int8
    c = c_ref[:]                        # (TC, d) int8
    dots = jax.lax.dot_general(
        q, c, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)          # (TQ, TC)
    scores = cnorm_ref[0, :][None, :] - 2 * dots    # |c|^2 - 2 q.c

    tq = scores.shape[0]
    col_idx = ci * tile_c + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)

    # mask corpus padding (norm sentinel) and banned ids
    scores = jnp.where(cnorm_ref[0, :][None, :] >= BIG, BIG, scores)
    nb = banned_ref.shape[1]
    for b in range(nb):
        scores = jnp.where(col_idx == banned_ref[:, b][:, None], BIG, scores)

    combined_vals = jnp.concatenate([run_vals[:], scores], axis=1)
    combined_idx = jnp.concatenate([run_idx[:], col_idx], axis=1)
    # k extraction passes built from min-reductions only (integer argmin has
    # no Mosaic lowering). Tie rule: among equal distances pick the smallest
    # global index — exactly faiss's behavior — via a min over indices
    # restricted to the min-valued columns.
    new_vals, new_idx = [], []
    for _ in range(k):
        m = jnp.min(combined_vals, axis=1)                     # (TQ,)
        at_min = combined_vals == m[:, None]
        idx_j = jnp.min(jnp.where(at_min, combined_idx, BIG), axis=1)
        new_vals.append(m)
        new_idx.append(idx_j)
        # retire exactly the selected column (same value AND same index)
        sel = at_min & (combined_idx == idx_j[:, None])
        combined_vals = jnp.where(sel, BIG, combined_vals)
    run_vals[:] = jnp.stack(new_vals, axis=1)
    run_idx[:] = jnp.stack(new_idx, axis=1)

    @pl.when(ci == num_c_tiles - 1)
    def _():
        vals_ref[:] = run_vals[:]
        idx_ref[:] = run_idx[:]


@functools.partial(jax.jit, static_argnames=("k", "tile_q", "tile_c", "interpret"))
def exact_topk_l2(queries: jax.Array, corpus: jax.Array,
                  corpus_norms: jax.Array,
                  banned: Optional[jax.Array] = None, *, k: int = 20,
                  tile_q: int = 128, tile_c: int = 1024,
                  interpret: bool = False) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k smallest L2^2 distances.

    queries: (M, d) int8, corpus: (N, d) int8 — d a multiple of 128, M/N
    multiples of the tile sizes (pad with `pad_matrix`); corpus_norms: (N,)
    int32 with >= BIG marking padding rows; banned: (M, NB) int32 global
    corpus indices excluded per query (use -1 for none).

    Returns (distances (M, k) int32 INCLUDING |q|^2, indices (M, k) int32).
    """
    M, d = queries.shape
    N, d2 = corpus.shape
    assert d == d2 and d % 128 == 0, (d, d2)
    assert M % tile_q == 0 and N % tile_c == 0, (M, N)
    if banned is None:
        banned = jnp.full((M, 1), -1, dtype=jnp.int32)
    num_q, num_c = M // tile_q, N // tile_c

    kernel = functools.partial(_topk_kernel, k=k, tile_c=tile_c,
                               num_c_tiles=num_c)
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
    index (the parity oracle for the kernel)."""
    q = queries.astype(np.int64)
    c = corpus.astype(np.int64)
    d2 = (q * q).sum(1)[:, None] - 2 * q @ c.T + (c * c).sum(1)[None, :]
    if banned is not None:
        for i in range(q.shape[0]):
            for b in banned[i]:
                if 0 <= b < c.shape[0]:
                    d2[i, b] = np.iinfo(np.int32).max
    idx = np.argsort(d2, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(d2, idx, axis=1).astype(np.int32), idx.astype(np.int32)
