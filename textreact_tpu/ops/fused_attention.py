"""Fused attention with in-kernel attention-probability dropout (Pallas TPU).

Why this kernel exists: the reference trains with attention_probs_dropout_prob
= 0.1 (reference textreact/configs/bert_l6.json + HF BERT defaults, applied at
main.py's model forward), but the stock Pallas flash-attention kernel has no
dropout, so round 1 had to choose between reference dropout semantics (XLA
attention: materializes (B, H, L, L) probs in HBM) and speed (flash). This
kernel does both: softmax *and* the dropout mask are computed on-chip, the
(L, L) probability tile never touches HBM, and the backward pass regenerates
the identical mask from the same per-(batch, head-group) PRNG seed instead
of storing it.

Scope: encoder self-attention at the framework's sequence scale (L <= ~1024,
a whole attention row fits VMEM), non-causal, optional key-padding mask.
The numerics follow torch/HF exactly: P = softmax(S); D = P * keep / (1-p);
out = D @ V — the softmax normalizer is computed over *undropped* weights.

Layout: tensors stay in the model's natural (B, L, H*D) activation layout —
no HBM transposes around the kernel (they cost several ms/step at the
flagship geometry). The grid is (B, H/NH) where NH = 128//D heads share one
instance so the head-group block is a full 128-lane tile; each head's
(L, L) f32 score tile lives only in VMEM. Matmuls run on the MXU with f32
accumulation; dropout bits come from pltpu.prng_random_bits seeded with
(seed, batch * num_groups + group), heads within a group drawing successive
tiles from the same stream (identical order forward and backward).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9
LANE = 128


def _keep_mask(p: float, shape) -> jax.Array:
    """Bernoulli(1-p) keep mask from the seeded per-core PRNG (uint32
    compare: keep iff bits >= p * 2^32)."""
    bits = pltpu.prng_random_bits(shape)
    threshold = jnp.uint32(min(int(p * (1 << 32)), (1 << 32) - 1))
    return (pltpu.bitcast(bits, jnp.uint32) >= threshold)


def _scores(q, k, mask, scale):
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s * scale
    if mask is not None:
        bias = jnp.where(mask > 0, 0.0, NEG_INF).astype(jnp.float32)
        s = s + bias[None, :]
    return s


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, keep_ref,
                out_ref, *, dropout_p, scale, use_mask,
                host_keep, nh, head_dim):
    b, g = pl.program_id(0), pl.program_id(1)
    mask = mask_ref[0, 0] if use_mask else None
    if dropout_p > 0.0 and not host_keep:
        pltpu.prng_seed(seed_ref[0], b * pl.num_programs(1) + g)
    for i in range(nh):
        sl = slice(i * head_dim, (i + 1) * head_dim)
        q = q_ref[0][:, sl]                  # (L, D)
        k = k_ref[0][:, sl]
        v = v_ref[0][:, sl]
        s = _scores(q, k, mask, scale)       # (L, L) f32
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        l = jnp.sum(e, axis=-1, keepdims=True)
        # Deferred normalization: PV runs on the UNNORMALIZED (dropped)
        # exp-weights and the softmax denominator scales the (L, D) context
        # instead of the (L, L) probs — one less full-tile elementwise pass,
        # and mathematically identical (the normalizer is computed over
        # undropped weights, torch/HF semantics).
        # m/l are NOT written out: this kernel is unblocked (a whole row's
        # scores live in VMEM), so the backward recomputes them bitwise from
        # its own S tile. Storing them as (B, H, L, 1) f32 residuals cost
        # 128x lane padding in HBM (2 x 384 MB/layer at B=128 -> OOM).
        if dropout_p > 0.0:
            if host_keep:
                keep = keep_ref[0, i] > 0    # interpret mode: no in-kernel PRNG
            else:
                keep = _keep_mask(dropout_p, e.shape)
            e = jnp.where(keep, e, 0.0)
            inv = 1.0 / (1.0 - dropout_p)
        else:
            inv = 1.0
        ctx = jnp.dot(e.astype(v.dtype), v,
                      preferred_element_type=jnp.float32)
        ctx = ctx * (inv / l)
        out_ref[0, :, sl] = ctx.astype(out_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, keep_ref,
                o_ref, do_ref, dq_ref, dk_ref, dv_ref, *, dropout_p,
                scale, use_mask, host_keep, nh, head_dim):
    b, g = pl.program_id(0), pl.program_id(1)
    mask = mask_ref[0, 0] if use_mask else None
    if dropout_p > 0.0 and not host_keep:
        pltpu.prng_seed(seed_ref[0], b * pl.num_programs(1) + g)
    for i in range(nh):
        sl = slice(i * head_dim, (i + 1) * head_dim)
        q = q_ref[0][:, sl]
        k = k_ref[0][:, sl]
        v = v_ref[0][:, sl]
        o = o_ref[0][:, sl]
        do = do_ref[0][:, sl]
        s = _scores(q, k, mask, scale)
        # Deferred normalization in the backward too: everything runs on the
        # UNNORMALIZED exp-weights; 1/l is applied to (L, D) tiles or folded
        # into an existing (L, L) pass — never a standalone (L, L) normalize.
        # m/l recomputed from this S tile: same inputs, same MXU op, same
        # reductions as the forward -> bitwise-identical values.
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)                   # matches fwd exactly
        l = jnp.sum(e, axis=-1, keepdims=True)

        if dropout_p > 0.0:
            if host_keep:
                keep = keep_ref[0, i] > 0
            else:
                keep = _keep_mask(dropout_p, e.shape)  # same stream order
            inv = 1.0 / (1.0 - dropout_p)
            dropped = jnp.where(keep, e, 0.0)
        else:
            keep, inv, dropped = None, 1.0, e

        dof = do.astype(jnp.float32)
        # delta_i = sum_j dP_ij P_ij == sum_d dO_id O_id (keep^2 == keep), an
        # (L, D) product instead of an (L, L) multiply + row-reduce
        delta = jnp.sum(dof * o.astype(jnp.float32), axis=-1, keepdims=True)
        # dV = D^T dO = (e*keep)^T (dO * inv/l): the row scale moves to the
        # (L, D) side of the contraction
        dv = jax.lax.dot_general(dropped.astype(do.dtype),
                                 (dof * (inv / l)).astype(do.dtype),
                                 (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        # dD = dO V^T ; softmax VJP with dP = keep*inv*dD and 1/l folded in:
        #   dS = P (dP - delta) = (e*keep*dd*inv - e*delta) / l * scale
        # written on the already-masked `dropped` tile (needed for dV anyway)
        # instead of a second where() + standalone inv multiply — the
        # dropout-vs-p=0 backward gap measured 0.39 ms/layer before, with
        # only 0.05 in the forward (r5 chained probe)
        dd = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if keep is not None:
            ds = (dropped * dd) * (inv * scale / l) - e * (delta * scale / l)
        else:
            ds = e * ((dd - delta) * (scale / l))
        ds = ds.astype(q.dtype)
        dq = jnp.dot(ds, k, preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dq_ref[0, :, sl] = dq.astype(dq_ref.dtype)
        dk_ref[0, :, sl] = dk.astype(dk_ref.dtype)
        dv_ref[0, :, sl] = dv.astype(dv_ref.dtype)


def _group_geometry(HD, head_dim):
    nh = max(1, LANE // head_dim)            # heads per kernel instance
    H = HD // head_dim
    if H % nh != 0:
        nh = 1
    return nh, H // nh, nh * head_dim        # nh, groups, group width


def _qkv_spec(L, gw):
    return pl.BlockSpec((1, L, gw), lambda b, g, *_: (b, 0, g))


def _mask_arg(in_specs, args, mask, L):
    if mask is not None:
        in_specs.append(pl.BlockSpec((1, 1, L), lambda b, g, *_: (b, 0, 0)))
        args.append(mask)
    else:
        in_specs.append(pl.BlockSpec((1, 1), lambda b, g, *_: (0, 0),
                                     memory_space=pltpu.SMEM))
        args.append(jnp.zeros((1, 1), jnp.int32))


def _host_keep_arg(in_specs, args, B, H, L, nh, seed, dropout_p, interpret):
    """Interpret mode lacks a prng_seed lowering; synthesize the keep mask
    host-side (CPU tests only — on TPU the bits come from the in-kernel PRNG
    and never exist in HBM)."""
    host_keep = bool(interpret) and dropout_p > 0.0
    if host_keep:
        key = jax.random.fold_in(jax.random.PRNGKey(0), seed[0])
        keep = (jax.random.uniform(key, (B, H, L, L)) >= dropout_p)
        in_specs.append(pl.BlockSpec((1, nh, L, L),
                                     lambda b, g, *_: (b, g, 0, 0)))
        args.append(keep.astype(jnp.int8))
    else:
        in_specs.append(pl.BlockSpec((1, 1), lambda b, g, *_: (0, 0),
                                     memory_space=pltpu.SMEM))
        args.append(jnp.zeros((1, 1), jnp.int8))
    return host_keep


def _fwd_call(q, k, v, mask, seed, dropout_p, scale, head_dim, interpret):
    B, L, HD = q.shape
    nh, groups, gw = _group_geometry(HD, head_dim)
    H = HD // head_dim
    qkv = _qkv_spec(L, gw)
    in_specs = [qkv, qkv, qkv]
    args = [q, k, v]
    _mask_arg(in_specs, args, mask, L)
    host_keep = _host_keep_arg(in_specs, args, B, H, L, nh, seed, dropout_p,
                               interpret)
    kernel = functools.partial(_fwd_kernel, dropout_p=dropout_p, scale=scale,
                               use_mask=mask is not None,
                               host_keep=host_keep, nh=nh, head_dim=head_dim)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B, groups),
        in_specs=in_specs,
        out_specs=[qkv])
    [out] = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, L, HD), q.dtype)],
        interpret=interpret,
    )(seed, *args)
    return out


def _bwd_call(q, k, v, mask, seed, o, do, dropout_p, scale, head_dim,
              interpret):
    B, L, HD = q.shape
    nh, groups, gw = _group_geometry(HD, head_dim)
    H = HD // head_dim
    qkv = _qkv_spec(L, gw)
    in_specs = [qkv, qkv, qkv]
    args = [q, k, v]
    _mask_arg(in_specs, args, mask, L)
    host_keep = _host_keep_arg(in_specs, args, B, H, L, nh, seed, dropout_p,
                               interpret)
    in_specs += [qkv, qkv]
    args += [o, do]
    kernel = functools.partial(_bwd_kernel, dropout_p=dropout_p, scale=scale,
                               use_mask=mask is not None,
                               host_keep=host_keep, nh=nh, head_dim=head_dim)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B, groups),
        in_specs=in_specs,
        out_specs=[qkv, qkv, qkv])
    dq, dk, dv = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, L, HD), q.dtype)] * 3,
        interpret=interpret,
    )(seed, *args)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _fused_attention(q, k, v, mask, seed, dropout_p, scale, head_dim,
                     interpret):
    return _fwd_call(q, k, v, mask, seed, dropout_p, scale, head_dim,
                     interpret)


def _fa_fwd(q, k, v, mask, seed, dropout_p, scale, head_dim, interpret):
    out = _fwd_call(q, k, v, mask, seed, dropout_p, scale, head_dim,
                    interpret)
    # out itself is a residual: the backward's softmax-VJP row term is
    # delta = rowsum(dO * O) (the flash-attention identity, valid under
    # dropout because keep^2 == keep) — an (L, D) product in place of an
    # (L, L) multiply + row-reduce. m/l are recomputed in the backward
    # kernel (unblocked rows), never stored.
    return out, (q, k, v, mask, seed, out)


def _fa_bwd(dropout_p, scale, head_dim, interpret, res, do):
    q, k, v, mask, seed, out = res
    dq, dk, dv = _bwd_call(q, k, v, mask, seed, out, do, dropout_p,
                           scale, head_dim, interpret)
    return dq, dk, dv, None, None


_fused_attention.defvjp(_fa_fwd, _fa_bwd)


def fused_dropout_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                            mask_kv: Optional[jax.Array],
                            dropout_p: float, dropout_rng,
                            sm_scale: float,
                            interpret: Optional[bool] = None) -> jax.Array:
    """Attention with HF/torch attention-prob dropout semantics, fused.

    q, k, v: (B, L, H, D); mask_kv: (B, L) {0,1} key-padding mask or None.
    Returns (B, L, H, D). Differentiable wrt q/k/v; the dropout mask is
    regenerated (not stored) in the backward pass. Internally everything
    stays in the (B, L, H*D) activation layout — no HBM transposes.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, L, H, D = q.shape
    q2 = q.reshape(B, L, H * D)
    k2 = k.reshape(B, L, H * D)
    v2 = v.reshape(B, L, H * D)
    if dropout_p > 0.0:
        seed = jax.random.randint(dropout_rng, (1,), 0,
                                  jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
    else:
        seed = jnp.zeros((1,), jnp.int32)
    mask = (mask_kv.astype(jnp.int32)[:, None, :]
            if mask_kv is not None else None)
    out = _fused_attention(q2, k2, v2, mask, seed, float(dropout_p),
                           float(sm_scale), int(D), bool(interpret))
    return out.reshape(B, L, H, D)
