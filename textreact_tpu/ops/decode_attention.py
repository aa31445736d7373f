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

Layout contract (matches models/layers.py grouped beam cache):
  q        (B, G, H, D)            — current-token queries, beams grouped
  k_cache  (B, H, D, T, G)         — head-major, position-major: D as
  v_cache  (B, H, D, T, G)           sublanes, (T, G) merged as lanes; both
                                     kernel matmuls are then transpose-free
                                     (scores: q @ K, context: V contracted
                                     over lanes)
  bias     (B, G, T*G)      f32    — ancestry mask from beam.py (0 at the
                                     ancestor slot, -1e9 elsewhere/beyond
                                     cur_len), merged (t, g) column order
  cur_len  ()               int32  — decoded prefix length (t < cur_len)
Returns ctx (B, G, H, D) in q.dtype.

Streaming-softmax state (running max / normalizer / accumulator, per head)
lives in VMEM scratch, reset at the first block of each example and
normalized into the output at the last VALID block. Numerics: f32
accumulation, probabilities in f32 through the context matmul — within one
bf16 ulp of the XLA grouped path (verified on-chip).
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
            acc_ref, m_ref, l_ref, *, H, D, G, BT, scale):
    i = pl.program_id(1)
    cur = cur_ref[0]
    nblk = pl.cdiv(cur, BT)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(i < nblk)
    def _():
        last = i == nblk - 1
        for h in range(H):
            hd = slice(h * D, (h + 1) * D)
            q = q_ref[0, :, hd]                              # (G, D)
            k = k_ref[0, h]                                  # (D, BT*G)
            v = v_ref[0, h]
            s = jax.lax.dot_general(
                q, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # (G, BT*G)
            s = s * scale + bias_ref[0]
            m = m_ref[:, h:h + 1]
            l = l_ref[:, h:h + 1]
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            e = jnp.exp(s - m_new)
            l_new = l * alpha + jnp.sum(e, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                e.astype(v.dtype), v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # (G, D)
            acc_new = acc_ref[:, hd] * alpha + pv
            m_ref[:, h:h + 1] = m_new
            l_ref[:, h:h + 1] = l_new

            @pl.when(last)
            def _():
                out_ref[0, :, hd] = (acc_new / l_new).astype(out_ref.dtype)

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
            pl.BlockSpec((1, H, D, BT * G),
                         lambda b, i, cur: (b, 0, 0, _clamped(i, cur)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, D, BT * G),
                         lambda b, i, cur: (b, 0, 0, _clamped(i, cur)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, G, H * D), lambda b, i, cur: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((G, H * D), jnp.float32),   # acc
            pltpu.VMEM((G, H), jnp.float32),       # running max
            pltpu.VMEM((G, H), jnp.float32),       # running normalizer
        ],
    )
    cur = jnp.asarray(cur_len, jnp.int32).reshape(1)
    # merge (T, G) outside the kernel (free: adjacent minor dims) — Mosaic
    # cannot shape-cast a lane-padded (BT, G) pair inside the kernel
    k_flat = k_cache.reshape(B, H, D, T * G)
    v_flat = v_cache.reshape(B, H, D, T * G)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, G, H * D), q.dtype),
        interpret=interpret,
    )(cur, q.reshape(B, G, H * D), bias.astype(jnp.float32), k_flat, v_flat)
    return out.reshape(B, G, H, D)
