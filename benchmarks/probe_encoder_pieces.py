"""Per-piece anatomy of ONE encoder layer at flagship geometry, on chip.

train_anatomy.py shows the 12-layer encoder is 78.3 of the 98.3 ms B=32
step (fwd 29.7 vs a ~15.7 ms matmul roofline); this pins down where the
slack lives, piece by piece: QKV projections, the fused-dropout
attention kernel (p=0.1 vs p=0), the output projection, the MLP pair,
and the two fused residual+dropout+LN sites. Each piece runs x12 inside
a fori_loop with loop-variant inputs (relay rule: only queued-reps
deltas are trustworthy), fwd and fwd+bwd, and is compared against its
bf16 matmul roofline where one exists.

Usage: python benchmarks/probe_encoder_pieces.py [B]   (default 32)
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), '..'))
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from textreact_tpu.ops.fused_attention import fused_dropout_attention
from textreact_tpu.ops.fused_layernorm import fused_residual_layernorm

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
L, H, D, F, NL = 512, 12, 64, 3072, 12
d = H * D
dt = jnp.bfloat16
key = jax.random.PRNGKey(0)
PEAK = 197e12  # v5e bf16


def timeit(fn, *args, reps=8):
    """R-vs-1 queued-reps delta: the ~25-30 ms fixed relay readback cost
    would otherwise swamp 1-10 ms piece signals."""
    f = jax.jit(fn)
    o = f(*args)
    np.asarray(jax.tree.leaves(o)[0])

    def run(n):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            o = None
            for _ in range(n):
                o = f(*args)
            np.asarray(jax.tree.leaves(o)[0])
            best = min(best, time.perf_counter() - t0)
        return best

    return max((run(reps) - run(1)) / (reps - 1), 1e-9)


def loop12(piece):
    """x12 layers; the per-iteration scalar feedback keeps iterations
    loop-variant (XLA cannot hoist or dedupe them)."""
    def fn(x, *ws):
        def body(i, carry):
            x, acc = carry
            out = piece(x + (acc * 0).astype(dt), *ws)
            return x, acc + out.astype(jnp.float32).ravel()[0]
        _, acc = jax.lax.fori_loop(0, NL, body, (x, jnp.float32(0)))
        return acc
    return fn


def report(name, t_fwd, t_bwd, flops_fwd=None):
    note = ""
    if flops_fwd:
        roof = flops_fwd / PEAK * 1e3
        note = (f"   roofline {roof:5.2f} ms ({roof / (t_fwd * 1e3) * 100:3.0f}%"
                f" fwd eff)")
    print(f"  {name:22s} fwd {t_fwd*1e3:6.2f} ms   fwd+bwd "
          f"{t_bwd*1e3:6.2f} ms{note}", flush=True)


def main():
    M = B * L
    x = jax.random.normal(jax.random.fold_in(key, 1), (B, L, d), dt)
    mask = jnp.ones((B, L), jnp.int32)
    w_att = jax.random.normal(jax.random.fold_in(key, 2), (d, 3 * d), dt) * 0.02
    w_out = jax.random.normal(jax.random.fold_in(key, 3), (d, d), dt) * 0.02
    w_fc1 = jax.random.normal(jax.random.fold_in(key, 4), (d, F), dt) * 0.02
    w_fc2 = jax.random.normal(jax.random.fold_in(key, 5), (F, d), dt) * 0.02
    scale = jnp.ones((d,), jnp.float32)
    bias = jnp.zeros((d,), jnp.float32)
    rng = jax.random.key(7, impl="rbg")

    def grad_of(fn, *args):
        g = jax.grad(lambda *a: loop12(fn)(*a))
        return timeit(g, *args), None

    pieces = []

    def qkv(x, w):
        return jnp.einsum("bld,de->ble", x, w,
                          preferred_element_type=jnp.float32).astype(dt)
    pieces.append(("qkv_proj(3-in-1)", qkv, (x, w_att),
                   2 * M * d * 3 * d))

    def attn(p):
        def f(x, w):
            qkv3 = jnp.einsum("bld,de->ble", x, w,
                              preferred_element_type=jnp.float32).astype(dt)
            q, k, v = [a.reshape(B, L, H, D)
                       for a in jnp.split(qkv3, 3, axis=-1)]
            return fused_dropout_attention(q, k, v, mask, p, rng if p else None,
                                           sm_scale=1.0 / D ** 0.5)
        return f
    flops_attn = 2 * M * d * 3 * d + 2 * 2 * B * H * L * L * D
    pieces.append(("qkv+attn p=0.1", attn(0.1), (x, w_att), flops_attn))
    pieces.append(("qkv+attn p=0.0", attn(0.0), (x, w_att), flops_attn))

    def outproj(x, w):
        return jnp.einsum("bld,de->ble", x, w,
                          preferred_element_type=jnp.float32).astype(dt)
    pieces.append(("out_proj", outproj, (x, w_out), 2 * M * d * d))

    def mlp(x, w1, w2):
        h = jax.nn.gelu(jnp.einsum("bld,df->blf", x, w1,
                                   preferred_element_type=jnp.float32))
        return jnp.einsum("blf,fd->bld", h.astype(dt), w2,
                          preferred_element_type=jnp.float32).astype(dt)
    pieces.append(("mlp fc1+gelu+fc2", mlp, (x, w_fc1, w_fc2),
                   2 * M * d * F * 2))

    def fln(x, y, s, b):
        return fused_residual_layernorm(x, y, s, b, dropout_p=0.1,
                                        dropout_rng=rng)
    pieces.append(("fused res+drop+LN", fln, (x, x, scale, bias), None))

    for name, fn, args, flops in pieces:
        t_fwd = timeit(loop12(fn), *args)
        t_bwd, _ = grad_of(fn, *args)
        report(name, t_fwd / NL * NL, t_bwd, flops * NL if flops else None)

    enc_flops = NL * (2 * M * d * 3 * d + 2 * 2 * B * H * L * L * D
                      + 2 * M * d * d + 4 * M * d * F)
    print(f"  (12-layer matmul roofline: fwd {enc_flops/PEAK*1e3:.1f} ms, "
          f"fwd+bwd {3*enc_flops/PEAK*1e3:.1f} ms; train_anatomy measured "
          f"enc_fwd/enc_fwdbwd for the whole encoder)", flush=True)


if __name__ == "__main__":
    print(f"-- encoder pieces, B={B}", flush=True)
    main()
