"""Fused grouped beam decode attention (Pallas TPU).

Why this kernel exists: after the row-stable beam redesign
(inference/beam.py — the KV cache is never permuted; each beam attends over
all G*T cache slots of its example under an ancestry bias), the decode step
is dominated by the XLA grouped-attention score chain: the (B, H, G, T*G)
f32 score tensor is materialized to HBM, read back by the softmax, and read
again by the context matmul (~400 MB/layer/step at retro scale), plus the
full K/V caches are read even for positions beyond the current decode
length. This kernel streams the softmax on-chip (scores never leave VMEM)
and skips position-blocks at t >= cur_len entirely: the grid's inner
dimension walks (BT-position) K/V chunks and the BlockSpec index_map clamps
the chunk index at the last valid block — Pallas re-uses the resident block
instead of fetching (no DMA), and the kernel body predicates the compute —
so per-step HBM traffic is proportional to the decoded prefix, not the
cache capacity.

Head-batched matmuls (round 3): the first kernel looped over heads with
(G, D) @ (D, BT*G) matmuls — 2H skinny MXU ops per block, latency-bound at
G<=20 beams (measured slower than the XLA einsum path at retro scale).
This version issues TWO MXU-sized matmuls per block regardless of H:

  scores   S  = Q_bd @ K            (H*G, H*D) x (H*D, BT*G)
  context  O  = P  @nt V            (H*G, BT*G) x (H*D, BT*G) -> (H*G, H*D)

Q_bd is the block-diagonal arrangement of the queries (built once per
example in VMEM scratch); the context product computes ALL (head, head')
pairs and only the diagonal (G, D) blocks are accumulated — H^2/H more
FLOPs than strictly needed, but both products are single large MXU ops
(~0.5 GFLOP/block, microseconds) instead of 2H latency-bound slivers. The
ancestry bias (shared by every head) is tiled across heads with one more
tiny MXU product against a constant selection matrix instead of a
sublane-unaligned concatenate.

Layout contract (matches models/layers.py grouped beam cache):
  q        (B, G, H, D)            — current-token queries, beams grouped
  k_cache  (B, H, D, T, G)         — head-major, position-major: D as
  v_cache  (B, H, D, T, G)           sublanes, (T, G) merged as lanes
  bias     (B, G, T*G)      f32    — ancestry mask from beam.py (0 at the
                                     ancestor slot, -1e9 elsewhere/beyond
                                     cur_len), merged (t, g) column order
  cur_len  ()               int32  — decoded prefix length (t < cur_len)
Returns ctx (B, G, H, D) in q.dtype.

Streaming-softmax state (running max / normalizer / accumulator) lives in
VMEM scratch, reset at the first block of each example and normalized into
the output at the last VALID block. Numerics: f32 accumulation,
probabilities in the cache dtype through the context matmul — within one
bf16 ulp of the XLA grouped path (verified on-chip for the per-head
variant; equivalence tests pin this one to the same reference).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _pick_bt(T: int) -> int:
    for bt in (32, 16, 8, 4, 2, 1):
        if T % bt == 0:
            return bt
    return 1


def _kernel(cur_ref, q_ref, bias_ref, k_ref, v_ref, out_ref,
            qbd_ref, sel_ref, acc_ref, m_ref, l_ref, *, H, D, G, BT, scale):
    i = pl.program_id(1)
    cur = cur_ref[0]
    nblk = pl.cdiv(cur, BT)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        # block-diagonal queries: row (h*G + g) carries q[g, h*D:(h+1)*D]
        qbd_ref[:] = jnp.zeros_like(qbd_ref)
        for h in range(H):
            qbd_ref[h * G:(h + 1) * G, h * D:(h + 1) * D] = \
                q_ref[0, :, h * D:(h + 1) * D]
        # head-tiling selector: sel[(h*G + g), g'] = 1 iff g == g'
        rows = jax.lax.broadcasted_iota(jnp.int32, (H * G, G), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (H * G, G), 1)
        sel_ref[:] = (jax.lax.rem(rows, G) == cols).astype(sel_ref.dtype)

    @pl.when(i < nblk)
    def _():
        last = i == nblk - 1
        k = k_ref[0]                                         # (H*D, BT*G)
        v = v_ref[0]
        s = jax.lax.dot_general(
            qbd_ref[:], k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # (H*G, BT*G)
        # tile the shared ancestry bias across heads on the MXU
        bias_t = jax.lax.dot_general(
            sel_ref[:], bias_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # (H*G, BT*G)
        s = s * scale + bias_t
        m = m_ref[:]
        l = l_ref[:]
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)                           # (H*G, 1)
        e = jnp.exp(s - m_new)
        l_new = l * alpha + jnp.sum(e, axis=-1, keepdims=True)
        # all (head, head') context pairs in one NT matmul; only the
        # diagonal blocks are real
        pairs = jax.lax.dot_general(
            e.astype(v.dtype), v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # (H*G, H*D)
        m_ref[:] = m_new
        l_ref[:] = l_new
        for h in range(H):
            rows = slice(h * G, (h + 1) * G)
            hd = slice(h * D, (h + 1) * D)
            acc_new = acc_ref[:, hd] * alpha[rows] + pairs[rows, hd]

            @pl.when(last)
            def _():
                out_ref[0, :, hd] = (acc_new / l_new[rows]).astype(
                    out_ref.dtype)

            @pl.when(jnp.logical_not(last))
            def _():
                acc_ref[:, hd] = acc_new


def grouped_decode_attention(q: jax.Array, k_cache: jax.Array,
                             v_cache: jax.Array, bias: jax.Array,
                             cur_len: jax.Array, sm_scale: float,
                             interpret: Optional[bool] = None) -> jax.Array:
    """See module docstring for the layout contract."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, G, H, D = q.shape
    _, _, _, T, _ = k_cache.shape
    BT = _pick_bt(T)
    NT = T // BT
    kernel = functools.partial(_kernel, H=H, D=D, G=G, BT=BT,
                               scale=float(sm_scale))

    def _clamped(i, cur_ref):
        # repeat the last VALID chunk index for the skipped tail: Pallas
        # sees an unchanged block index and elides the DMA entirely
        nblk = pl.cdiv(cur_ref[0], BT)
        return jnp.minimum(i, nblk - 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, NT),
        in_specs=[
            pl.BlockSpec((1, G, H * D), lambda b, i, cur: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, BT * G),
                         lambda b, i, cur: (b, 0, _clamped(i, cur)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H * D, BT * G),
                         lambda b, i, cur: (b, 0, _clamped(i, cur)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H * D, BT * G),
                         lambda b, i, cur: (b, 0, _clamped(i, cur)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, G, H * D), lambda b, i, cur: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((H * G, H * D), q.dtype),   # block-diagonal queries
            pltpu.VMEM((H * G, G), q.dtype),       # head-tiling selector
            pltpu.VMEM((G, H * D), jnp.float32),   # acc
            pltpu.VMEM((H * G, 1), jnp.float32),   # running max
            pltpu.VMEM((H * G, 1), jnp.float32),   # running normalizer
        ],
    )
    cur = jnp.asarray(cur_len, jnp.int32).reshape(1)
    # merge (T, G) into lanes and (H, D) into sublanes OUTSIDE the kernel
    # (free: adjacent dims, D sublane-aligned) — Mosaic cannot shape-cast
    # lane-padded pairs inside the kernel
    k_flat = k_cache.reshape(B, H * D, T * G)
    v_flat = v_cache.reshape(B, H * D, T * G)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, G, H * D), q.dtype),
        interpret=interpret,
    )(cur, q.reshape(B, G, H * D), bias.astype(jnp.float32), k_flat, v_flat)
    return out.reshape(B, G, H, D)
