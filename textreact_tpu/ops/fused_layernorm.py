"""Fused residual-add (+ dropout) + LayerNorm (Pallas TPU), fwd and bwd.

Why this kernel exists: the post-LN transformer block applies
``LayerNorm(x + dropout(y))`` three times per layer (reference HF BERT
semantics). Under XLA the dropout and the add each produce an HBM
intermediate and the normalization makes separate reduction/apply passes,
so every LN site moves the (B, L, H) activation several times; the round-2
train-step profile named these LayerNorm/bias chains as the largest
non-matmul tail at the flagship geometry (NOTES.md, VERDICT r2 item 3).
These kernels read x and y from HBM exactly once, keep z = x + dropout(y),
the row statistics, and the normalized output in VMEM, generate the
dropout mask with the in-kernel PRNG (ops/fused_attention.py convention —
regenerated in the backward pass, never stored), and the custom VJP
recomputes z instead of storing it.

Semantics match flax.linen.LayerNorm(dtype=float32) over the last axis
with use_fast_variance (mean of squares minus squared mean, clamped at
zero like flax to avoid rsqrt NaN), scale+bias parameters, epsilon inside
the rsqrt; dropout follows nn.Dropout (keep-and-rescale by 1/(1-p)).
Inputs of any leading shape (..., H); statistics in float32 regardless of
input dtype. Interpret mode (CPU tests) has no PRNG lowering: the keep
mask is synthesized host-side and passed in.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_block_rows(R: int) -> int:
    for br in (256, 128, 64, 32, 16, 8, 4, 2, 1):
        if R % br == 0:
            return br
    return 1


def _keep_mask(p: float, shape):
    """Bernoulli(1-p) keep mask from the seeded per-core PRNG (same
    convention as ops/fused_attention.py)."""
    bits = pltpu.prng_random_bits(shape)
    threshold = jnp.uint32(min(int(p * (1 << 32)), (1 << 32) - 1))
    return pltpu.bitcast(bits, jnp.uint32) >= threshold


def _dropped_residual(seed_ref, x_ref, y_ref, keep_ref, dropout_p,
                      host_keep):
    """z = x + dropout(y) in f32. The mask comes from the in-kernel PRNG
    seeded per row-block (identical stream in fwd and bwd) or, in
    interpret mode, from a host-synthesized keep input. Returns (z, dmask)
    where dmask is keep/(1-p) (ones when p == 0) for the backward dy."""
    y = y_ref[:].astype(jnp.float32)
    if dropout_p > 0.0:
        if host_keep:
            keep = keep_ref[:] > 0
        else:
            pltpu.prng_seed(seed_ref[0], pl.program_id(0))
            keep = _keep_mask(dropout_p, y.shape)
        dmask = jnp.where(keep, 1.0 / (1.0 - dropout_p), 0.0)
    else:
        dmask = jnp.ones_like(y)
    return x_ref[:].astype(jnp.float32) + y * dmask, dmask


def _fwd_kernel(seed_ref, x_ref, y_ref, keep_ref, scale_ref, bias_ref,
                out_ref, mean_ref, rstd_ref, *, eps, dropout_p, host_keep):
    z, _ = _dropped_residual(seed_ref, x_ref, y_ref, keep_ref, dropout_p,
                             host_keep)
    mean = jnp.mean(z, axis=-1, keepdims=True)
    # fast-variance can go negative in fp; flax clamps to avoid rsqrt NaN
    var = jnp.maximum(
        jnp.mean(z * z, axis=-1, keepdims=True) - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (z - mean) * rstd
    out_ref[:] = (xhat * scale_ref[0] + bias_ref[0]).astype(out_ref.dtype)
    mean_ref[:] = mean
    rstd_ref[:] = rstd


def _bwd_kernel(seed_ref, x_ref, y_ref, keep_ref, g_ref, scale_ref,
                mean_ref, rstd_ref, dx_ref, dy_ref, dscale_ref, dbias_ref,
                *, dropout_p, host_keep):
    z, dmask = _dropped_residual(seed_ref, x_ref, y_ref, keep_ref,
                                 dropout_p, host_keep)
    g = g_ref[:].astype(jnp.float32)
    mean = mean_ref[:]
    rstd = rstd_ref[:]
    xhat = (z - mean) * rstd
    gi = g * scale_ref[0]
    h = jnp.mean(gi, axis=-1, keepdims=True)
    hx = jnp.mean(gi * xhat, axis=-1, keepdims=True)
    dz = rstd * (gi - h - xhat * hx)
    dx_ref[:] = dz.astype(dx_ref.dtype)
    dy_ref[:] = (dz * dmask).astype(dy_ref.dtype)
    # dscale/dbias accumulate across the sequential TPU grid into one
    # VMEM-resident (1, H) block (a (1, H) per-step partial output would
    # violate Mosaic's (8, 128) block divisibility)
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dscale_ref[:] = jnp.zeros_like(dscale_ref)
        dbias_ref[:] = jnp.zeros_like(dbias_ref)

    dscale_ref[0] += jnp.sum(g * xhat, axis=0)
    dbias_ref[0] += jnp.sum(g, axis=0)


def _host_keep(seed, dropout_p, R, H, interpret):
    """Interpret mode lacks a prng_seed lowering; synthesize the keep mask
    host-side (CPU tests only — on TPU the bits never exist in HBM)."""
    if not (bool(interpret) and dropout_p > 0.0):
        return False, jnp.zeros((R, 1), jnp.int8)
    key = jax.random.fold_in(jax.random.PRNGKey(0), seed[0])
    keep = jax.random.uniform(key, (R, H)) >= dropout_p
    return True, keep.astype(jnp.int8)


def _row_spec(BR, W):
    # index maps under PrefetchScalarGridSpec also receive the scalar ref
    return pl.BlockSpec((BR, W), lambda r, s: (r, 0))


def _fwd_call(x2, y2, scale, bias, seed, eps, dropout_p, interpret):
    R, H = x2.shape
    BR = _pick_block_rows(R)
    host_keep, keep = _host_keep(seed, dropout_p, R, H, interpret)
    kernel = functools.partial(_fwd_kernel, eps=eps, dropout_p=dropout_p,
                               host_keep=host_keep)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(R // BR,),
        in_specs=[
            _row_spec(BR, H), _row_spec(BR, H),
            _row_spec(BR, keep.shape[1]),
            pl.BlockSpec((1, H), lambda r, s: (0, 0)),
            pl.BlockSpec((1, H), lambda r, s: (0, 0)),
        ],
        out_specs=[_row_spec(BR, H), _row_spec(BR, 1), _row_spec(BR, 1)],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((R, H), x2.dtype),
            jax.ShapeDtypeStruct((R, 1), jnp.float32),
            jax.ShapeDtypeStruct((R, 1), jnp.float32),
        ],
        interpret=interpret,
    )(seed, x2, y2, keep, scale.reshape(1, H).astype(jnp.float32),
      bias.reshape(1, H).astype(jnp.float32))


def _bwd_call(x2, y2, scale, seed, mean, rstd, g2, dropout_p, interpret):
    R, H = x2.shape
    BR = _pick_block_rows(R)
    host_keep, keep = _host_keep(seed, dropout_p, R, H, interpret)
    kernel = functools.partial(_bwd_kernel, dropout_p=dropout_p,
                               host_keep=host_keep)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(R // BR,),
        in_specs=[
            _row_spec(BR, H), _row_spec(BR, H),
            _row_spec(BR, keep.shape[1]),
            _row_spec(BR, H),
            pl.BlockSpec((1, H), lambda r, s: (0, 0)),
            _row_spec(BR, 1), _row_spec(BR, 1),
        ],
        out_specs=[
            _row_spec(BR, H), _row_spec(BR, H),
            pl.BlockSpec((1, H), lambda r, s: (0, 0)),
            pl.BlockSpec((1, H), lambda r, s: (0, 0)),
        ],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((R, H), x2.dtype),
            jax.ShapeDtypeStruct((R, H), x2.dtype),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
        ],
        interpret=interpret,
    )(seed, x2, y2, keep, g2, scale.reshape(1, H).astype(jnp.float32),
      mean, rstd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _fused(x, y, scale, bias, seed, eps, dropout_p, interpret):
    out, _, _ = _fwd_call(x, y, scale, bias, seed, eps, dropout_p, interpret)
    return out


def _vjp_fwd(x, y, scale, bias, seed, eps, dropout_p, interpret):
    out, mean, rstd = _fwd_call(x, y, scale, bias, seed, eps, dropout_p,
                                interpret)
    return out, (x, y, scale, seed, mean, rstd)


def _vjp_bwd(eps, dropout_p, interpret, res, g):
    x2, y2, scale, seed, mean, rstd = res
    dx, dy, dscale_p, dbias_p = _bwd_call(x2, y2, scale, seed, mean, rstd,
                                          g, dropout_p, interpret)
    dscale = dscale_p[0].astype(scale.dtype)
    dbias = dbias_p[0].astype(scale.dtype)
    return dx, dy, dscale, dbias, None


_fused.defvjp(_vjp_fwd, _vjp_bwd)


def fused_residual_layernorm(x: jax.Array, y: jax.Array, scale: jax.Array,
                             bias: jax.Array, eps: float = 1e-12,
                             interpret: Optional[bool] = None,
                             dropout_p: float = 0.0,
                             dropout_rng=None) -> jax.Array:
    """LayerNorm(x + dropout(y, p)) over the last axis (module docstring).

    Differentiable wrt x/y/scale/bias; the dropout mask (p > 0) is drawn
    from the in-kernel PRNG seeded via dropout_rng and regenerated — not
    stored — in the backward pass."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    shape = x.shape
    H = shape[-1]
    R = 1
    for s in shape[:-1]:
        R *= s
    if not interpret and _pick_block_rows(R) < 8:
        # Mosaic requires the row-block dim divisible by 8 (or equal to R);
        # odd row counts (e.g. a ragged final eval batch at decode time)
        # take the XLA path with the same semantics.
        z = x.astype(jnp.float32)
        yf = y.astype(jnp.float32)
        if dropout_p > 0.0:
            keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_p, y.shape)
            yf = jnp.where(keep, yf / (1.0 - dropout_p), 0.0)
        return residual_layernorm_reference(
            z, yf, scale, bias, eps).astype(x.dtype)
    if dropout_p > 0.0:
        assert dropout_rng is not None
        seed = jax.random.randint(dropout_rng, (1,), 0,
                                  jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
    else:
        seed = jnp.zeros((1,), jnp.int32)
    out = _fused(x.reshape(-1, H), y.reshape(-1, H), scale, bias, seed,
                 float(eps), float(dropout_p), bool(interpret))
    return out.reshape(shape)


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
