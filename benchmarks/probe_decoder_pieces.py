"""Per-piece anatomy of ONE train-path decoder layer at flagship geometry.

train_anatomy.py puts the 6-layer decoder at ~9.6 ms of the 92.7 ms B=32
step, but its matmul roofline is ~4 ms: the cross-attention K/V
projections over the L=512 encoder states are ~83% of the decoder's
FLOPs, everything else runs at Ld=16. This pins down where the other
~5 ms live: cross K/V, the XLA cross-attention chain (16-query scores ->
f32 softmax -> prob dropout -> PV -> out proj), causal self-attention at
Ld=16, the FFN, the three fused res+drop+LN sites, and the tied LM head.

Same harness discipline as probe_encoder_pieces.py: x6 layers inside a
fori_loop with loop-variant inputs, R-vs-1 queued-reps deltas.

Usage: python benchmarks/probe_decoder_pieces.py [B]   (default 32)
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), '..'))
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from textreact_tpu.ops.fused_layernorm import fused_residual_layernorm

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
L, Ld, H, D, F, NL, V = 512, 16, 12, 64, 3072, 6, 315
d = H * D
dt = jnp.bfloat16
key = jax.random.PRNGKey(0)
PEAK = 197e12  # v5e bf16
NEG_INF = -1e9


def timeit(fn, *args, reps=8):
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


def loop6(piece):
    def fn(x, *ws):
        def body(i, carry):
            x, acc = carry
            out = piece(x + (acc * 0).astype(x.dtype), *ws)
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
    x = jax.random.normal(jax.random.fold_in(key, 1), (B, Ld, d), dt)
    enc = jax.random.normal(jax.random.fold_in(key, 2), (B, L, d), dt)
    kc = jax.random.normal(jax.random.fold_in(key, 3), (B, L, H, D), dt)
    vc = jax.random.normal(jax.random.fold_in(key, 4), (B, L, H, D), dt)
    w_kv = jax.random.normal(jax.random.fold_in(key, 5), (d, 2 * d), dt) * 0.02
    w_q = jax.random.normal(jax.random.fold_in(key, 6), (d, d), dt) * 0.02
    w_qkv = jax.random.normal(jax.random.fold_in(key, 7), (d, 3 * d), dt) * 0.02
    w_out = jax.random.normal(jax.random.fold_in(key, 8), (d, d), dt) * 0.02
    w_fc1 = jax.random.normal(jax.random.fold_in(key, 9), (d, F), dt) * 0.02
    w_fc2 = jax.random.normal(jax.random.fold_in(key, 10), (F, d), dt) * 0.02
    scale = jnp.ones((d,), jnp.float32)
    bias = jnp.zeros((d,), jnp.float32)
    rng = jax.random.key(7, impl="rbg")
    causal = jnp.where(jnp.arange(Ld)[:, None] >= jnp.arange(Ld)[None, :],
                       0.0, NEG_INF).astype(jnp.float32)[None, None]

    def grad_wrap(fn):
        return jax.grad(lambda *a: loop6(fn)(*a))

    pieces = []

    # cross-attention K/V projections over the encoder states — 83% of the
    # decoder's matmul FLOPs (loop over enc, not x: the piece's own input)
    def cross_kv(e, w):
        kv = jnp.einsum("bld,de->ble", e, w,
                        preferred_element_type=jnp.float32).astype(dt)
        return kv
    pieces.append(("cross_kv_proj", cross_kv, (enc, w_kv),
                   2 * B * L * d * 2 * d))

    # the rest of cross-attention: q proj, 16-query scores over 512 keys,
    # f32 softmax, attention-prob dropout, PV, out proj
    def cross_attn(p):
        def f(x, kc, vc, wq, wo):
            q = jnp.einsum("bld,de->ble", x, wq,
                           preferred_element_type=jnp.float32).astype(dt)
            q = q.reshape(B, Ld, H, D)
            s = jnp.einsum("bqhd,bkhd->bhqk", q, kc,
                           preferred_element_type=jnp.float32)
            s = s / jnp.sqrt(D).astype(jnp.float32)
            probs = jax.nn.softmax(s, axis=-1)
            if p > 0.0:
                keep = jax.random.bernoulli(rng, 1.0 - p, probs.shape)
                probs = jnp.where(keep, probs / (1.0 - p), 0.0)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(dt), vc,
                             preferred_element_type=jnp.float32).astype(dt)
            return jnp.einsum("bqe,ef->bqf", ctx.reshape(B, Ld, d), wo,
                              preferred_element_type=jnp.float32).astype(dt)
        return f
    fl_cross = (2 * B * Ld * d * d * 2 + 2 * 2 * B * H * Ld * L * D)
    pieces.append(("cross_q+attn+out p=.1", cross_attn(0.1),
                   (x, kc, vc, w_q, w_out), fl_cross))
    pieces.append(("cross_q+attn+out p=0", cross_attn(0.0),
                   (x, kc, vc, w_q, w_out), fl_cross))

    # causal self-attention at Ld=16 (XLA path: 16 % 128 != 0)
    def self_attn(x, w, wo):
        qkv = jnp.einsum("bld,de->ble", x, w,
                         preferred_element_type=jnp.float32).astype(dt)
        q, k, v = [a.reshape(B, Ld, H, D) for a in jnp.split(qkv, 3, axis=-1)]
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                       preferred_element_type=jnp.float32)
        s = s / jnp.sqrt(D).astype(jnp.float32) + causal
        probs = jax.nn.softmax(s, axis=-1)
        keep = jax.random.bernoulli(rng, 0.9, probs.shape)
        probs = jnp.where(keep, probs / 0.9, 0.0)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(dt), v,
                         preferred_element_type=jnp.float32).astype(dt)
        return jnp.einsum("bqe,ef->bqf", ctx.reshape(B, Ld, d), wo,
                          preferred_element_type=jnp.float32).astype(dt)
    pieces.append(("self_attn(Ld=16)", self_attn, (x, w_qkv, w_out),
                   2 * B * Ld * d * 4 * d + 2 * 2 * B * H * Ld * Ld * D))

    def mlp(x, w1, w2):
        h = jax.nn.gelu(jnp.einsum("bld,df->blf", x, w1,
                                   preferred_element_type=jnp.float32))
        return jnp.einsum("blf,fd->bld", h.astype(dt), w2,
                          preferred_element_type=jnp.float32).astype(dt)
    pieces.append(("mlp(Ld=16)", mlp, (x, w_fc1, w_fc2),
                   2 * B * Ld * d * F * 2))

    def fln3(x, s, b):
        y = fused_residual_layernorm(x, x, s, b, dropout_p=0.1,
                                     dropout_rng=rng)
        y = fused_residual_layernorm(y, y, s, b, dropout_p=0.1,
                                     dropout_rng=rng)
        return fused_residual_layernorm(y, y, s, b, dropout_p=0.1,
                                        dropout_rng=rng)
    pieces.append(("3x res+drop+LN(Ld=16)", fln3, (x, scale, bias), None))

    for name, fn, args, flops in pieces:
        t_fwd = timeit(loop6(fn), *args)
        t_bwd = timeit(grad_wrap(fn), *args)
        report(name, t_fwd, t_bwd, flops * NL if flops else None)

    # LM head (once, not per layer): dense+gelu+LN + tied vocab projection
    emb = jax.random.normal(jax.random.fold_in(key, 11), (V, d), dt) * 0.02

    def lm_head(x, wt, emb):
        h = jnp.einsum("bld,de->ble", x, wt,
                       preferred_element_type=jnp.float32)
        h = jax.nn.gelu(h)
        mu = h.mean(-1, keepdims=True)
        var = ((h - mu) ** 2).mean(-1, keepdims=True)
        h = ((h - mu) * jax.lax.rsqrt(var + 1e-12)).astype(dt)
        lg = jnp.einsum("bld,vd->blv", h, emb,
                        preferred_element_type=jnp.float32)
        return lg.astype(jnp.float32).sum()

    t_fwd = timeit(lm_head, x, w_out, emb)
    t_bwd = timeit(jax.grad(lm_head), x, w_out, emb)
    report("lm_head+logits (x1)", t_fwd, t_bwd,
           2 * B * Ld * d * (d + V))

    dec_flops = NL * (2 * B * L * d * 2 * d + fl_cross
                      + 2 * B * Ld * d * 4 * d + 4 * B * Ld * d * F)
    print(f"  (6-layer matmul roofline: fwd {dec_flops/PEAK*1e3:.2f} ms, "
          f"fwd+bwd {3*dec_flops/PEAK*1e3:.2f} ms; train_anatomy measured "
          f"dec_fwd/dec_fwdbwd for the whole decoder)", flush=True)


if __name__ == "__main__":
    print(f"-- decoder pieces, B={B}", flush=True)
    main()
