"""Fused residual-add + LayerNorm (Pallas TPU), forward and backward.

Why this kernel exists: the post-LN transformer block applies
``LayerNorm(x + dropout(y))`` three times per layer (reference HF BERT
semantics). Under XLA the add produces an HBM intermediate and the
normalization makes separate reduction/apply passes over it, so every LN
site moves the (B, L, H) activation several times; the round-2 train-step
profile named these LayerNorm/bias chains as the largest non-matmul tail
at the flagship geometry (NOTES.md, VERDICT r2 item 3). This kernel reads
x and y from HBM exactly once, keeps z = x + y, the row statistics, and
the normalized output in VMEM, and the custom VJP recomputes z in the
backward pass instead of storing it (traffic: read x, y, write out
forward; read x, y, g backward).

Semantics match flax.linen.LayerNorm(dtype=float32) over the last axis
with use_fast_variance (mean of squares minus squared mean), scale+bias
parameters, epsilon inside the rsqrt. Inputs of any leading shape
(..., H); statistics are computed in float32 regardless of input dtype.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_block_rows(R: int) -> int:
    for br in (256, 128, 64, 32, 16, 8, 4, 2, 1):
        if R % br == 0:
            return br
    return 1


def _fwd_kernel(x_ref, y_ref, scale_ref, bias_ref, out_ref, mean_ref,
                rstd_ref, *, eps):
    z = x_ref[:].astype(jnp.float32) + y_ref[:].astype(jnp.float32)
    mean = jnp.mean(z, axis=-1, keepdims=True)
    # fast-variance can go negative in fp; flax clamps to avoid rsqrt NaN
    var = jnp.maximum(
        jnp.mean(z * z, axis=-1, keepdims=True) - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (z - mean) * rstd
    out = xhat * scale_ref[0] + bias_ref[0]
    out_ref[:] = out.astype(out_ref.dtype)
    mean_ref[:] = mean
    rstd_ref[:] = rstd


def _bwd_kernel(x_ref, y_ref, g_ref, scale_ref, mean_ref, rstd_ref,
                dz_ref, dscale_ref, dbias_ref):
    z = x_ref[:].astype(jnp.float32) + y_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)
    mean = mean_ref[:]
    rstd = rstd_ref[:]
    xhat = (z - mean) * rstd
    gi = g * scale_ref[0]
    h = jnp.mean(gi, axis=-1, keepdims=True)
    hx = jnp.mean(gi * xhat, axis=-1, keepdims=True)
    dz = rstd * (gi - h - xhat * hx)
    dz_ref[:] = dz.astype(dz_ref.dtype)
    # per-row-block partials; summed over blocks outside the kernel
    dscale_ref[0] = jnp.sum(g * xhat, axis=0)
    dbias_ref[0] = jnp.sum(g, axis=0)


def _fwd_call(x2, y2, scale, bias, eps, interpret):
    R, H = x2.shape
    BR = _pick_block_rows(R)
    out, mean, rstd = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=(R // BR,),
        in_specs=[
            pl.BlockSpec((BR, H), lambda r: (r, 0)),
            pl.BlockSpec((BR, H), lambda r: (r, 0)),
            pl.BlockSpec((1, H), lambda r: (0, 0)),
            pl.BlockSpec((1, H), lambda r: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((BR, H), lambda r: (r, 0)),
            pl.BlockSpec((BR, 1), lambda r: (r, 0)),
            pl.BlockSpec((BR, 1), lambda r: (r, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, H), x2.dtype),
            jax.ShapeDtypeStruct((R, 1), jnp.float32),
            jax.ShapeDtypeStruct((R, 1), jnp.float32),
        ],
        interpret=interpret,
    )(x2, y2, scale.reshape(1, H).astype(jnp.float32),
      bias.reshape(1, H).astype(jnp.float32))
    return out, mean, rstd


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_residual_layernorm(x: jax.Array, y: jax.Array, scale: jax.Array,
                             bias: jax.Array, eps: float = 1e-12,
                             interpret: Optional[bool] = None) -> jax.Array:
    """LayerNorm(x + y) over the last axis (see module docstring)."""
    out, _ = _fused_fwd(x, y, scale, bias, eps, interpret)
    return out


def _fused_fwd(x, y, scale, bias, eps, interpret):
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    shape = x.shape
    H = shape[-1]
    x2 = x.reshape(-1, H)
    y2 = y.reshape(-1, H)
    out, mean, rstd = _fwd_call(x2, y2, scale, bias, eps, interpret)
    return out.reshape(shape), (x2, y2, scale, mean, rstd, shape, interpret)


def _fused_bwd(eps, _interpret_nondiff, res, g):
    x2, y2, scale, mean, rstd, shape, interpret = res
    H = shape[-1]
    R = x2.shape[0]
    BR = _pick_block_rows(R)
    g2 = g.reshape(R, H)
    dz, dscale_p, dbias_p = pl.pallas_call(
        _bwd_kernel,
        grid=(R // BR,),
        in_specs=[
            pl.BlockSpec((BR, H), lambda r: (r, 0)),
            pl.BlockSpec((BR, H), lambda r: (r, 0)),
            pl.BlockSpec((BR, H), lambda r: (r, 0)),
            pl.BlockSpec((1, H), lambda r: (0, 0)),
            pl.BlockSpec((BR, 1), lambda r: (r, 0)),
            pl.BlockSpec((BR, 1), lambda r: (r, 0)),
        ],
        out_specs=[
            pl.BlockSpec((BR, H), lambda r: (r, 0)),
            pl.BlockSpec((1, H), lambda r: (r, 0)),
            pl.BlockSpec((1, H), lambda r: (r, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, H), x2.dtype),
            jax.ShapeDtypeStruct((R // BR, H), jnp.float32),
            jax.ShapeDtypeStruct((R // BR, H), jnp.float32),
        ],
        interpret=interpret,
    )(x2, y2, g2, scale.reshape(1, H).astype(jnp.float32), mean, rstd)
    dz = dz.reshape(shape)
    dscale = jnp.sum(dscale_p, axis=0).astype(scale.dtype)
    dbias = jnp.sum(dbias_p, axis=0).astype(scale.dtype)
    return dz, dz, dscale, dbias


def _vjp_fwd(x, y, scale, bias, eps, interpret):
    out, res = _fused_fwd(x, y, scale, bias, eps, interpret)
    return out, res


fused_residual_layernorm.defvjp(_vjp_fwd, _fused_bwd)


def residual_layernorm_reference(x, y, scale, bias, eps=1e-12):
    """XLA reference with identical semantics (flax fast-variance LN,
    incl. the negative-variance clamp flax applies to avoid rsqrt NaN)."""
    z = x.astype(jnp.float32) + y.astype(jnp.float32)
    mean = jnp.mean(z, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(z * z, axis=-1, keepdims=True) - mean * mean, 0.0)
    xhat = (z - mean) * jax.lax.rsqrt(var + eps)
    return (xhat * scale.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(x.dtype)
