"""Isolated microbenches of the retro decode step's components on one chip.

These probes produced the round-3 numbers in NOTES.md ("decode step
anatomy"): cache-update layout variants (in-place vs copying
dynamic_update_slice), the self-attention QK/softmax/PV split, score-dtype
A/B, and the transposed-V PV candidate. Each probe is an isolated
fori_loop over loop-variant operands (relay timing rules, NOTES.md).

Usage: python benchmarks/decode_anatomy.py {pieces|cache|attn|pv|all}
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), '..'))
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

Bex, G, T, H, D, L, V, NL = 32, 20, 160, 12, 64, 512, 590, 6
dt = jnp.bfloat16
key = jax.random.PRNGKey(0)


def timed(name, fn, *args, steps=T):
    f = jax.jit(fn)
    o = f(*args)
    np.asarray(jax.tree.leaves(o)[0])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        o = f(*args)
        np.asarray(jax.tree.leaves(o)[0])
        ts.append(time.perf_counter() - t0)
    print(f"{name:24s} {min(ts)/steps*1e3:6.2f} ms/step", flush=True)


def _caches(shape, n=2 * NL):
    return [jax.random.normal(jax.random.fold_in(key, i), shape, dt)
            for i in range(n)]


def _bias():
    return jnp.where(
        jax.random.bernoulli(jax.random.fold_in(key, 99), 0.05,
                             (Bex, G, T * G)), 0.0, -1e9).astype(jnp.float32)


def run_cache_variants():
    """dynamic_update_slice layout A/B: only a lane-axis dynamic index is
    updated in place; any other placement copies the whole cache."""
    z = jnp.zeros((), jnp.int32)
    variants = [
        ("5d_idx_dim3", (Bex, H, D, T, G), lambda i: (z, z, z, i, z),
         (Bex, H, D, 1, G)),
        ("4d_merged_lane", (Bex, H, D, T * G), lambda i: (z, z, z, i * G),
         (Bex, H, D, G)),
        ("T_majormost", (T, Bex, H, D, G), lambda i: (i, z, z, z, z),
         (1, Bex, H, D, G)),
        ("kmajor_sublane", (Bex, H, T * G, D), lambda i: (z, z, i * G, z),
         (Bex, H, G, D)),
    ]
    for name, shape, idx_fn, slab_shape in variants:
        caches = _caches(shape)
        slab = jnp.ones(slab_shape, dt)

        def fn(caches, slab, idx_fn=idx_fn):
            def body(i, carry):
                caches, slab = carry
                start = idx_fn(jnp.int32(i % T))
                caches = [jax.lax.dynamic_update_slice(
                    c, (slab + i).astype(dt), start) for c in caches]
                return caches, slab
            caches, _ = jax.lax.fori_loop(0, T, body, (caches, slab))
            return caches[0].ravel()[0]

        timed(name, fn, caches, slab)


def _attn_loop(make_layer, caches, q0, bias):
    def fn(caches, q, bias):
        def body(i, acc):
            out = acc * 0
            for l in range(NL):
                q2 = q + (out[:, None, None, None] * 0).astype(dt)
                out = out + make_layer(caches[2 * l], caches[2 * l + 1],
                                       q2, bias)
            return acc + out
        return jax.lax.fori_loop(0, T, body, jnp.zeros((Bex,), jnp.float32))
    return fn


def run_attn_split():
    caches = _caches((Bex, H, D, T * G))
    bias = _bias()
    q0 = jax.random.normal(jax.random.fold_in(key, 7), (Bex, G, H, D), dt)

    def qk_only(k, v, q, bias):
        s = jnp.einsum("bghd,bhdk->bhgk", q, k,
                       preferred_element_type=jnp.float32)
        return s.sum(axis=(1, 2, 3))

    def qk_bias_softmax(k, v, q, bias):
        s = jnp.einsum("bghd,bhdk->bhgk", q, k,
                       preferred_element_type=jnp.float32) * 0.125
        p = jax.nn.softmax(s + bias[:, None], axis=-1)
        return p.sum(axis=(1, 2, 3))

    def full(s_dt):
        def layer(k, v, q, bias):
            s = jnp.einsum("bghd,bhdk->bhgk", q, k,
                           preferred_element_type=s_dt)
            s = s.astype(jnp.float32) * 0.125 + bias[:, None]
            p = jax.nn.softmax(s, axis=-1)
            ctx = jnp.einsum("bhgk,bhdk->bghd", p.astype(dt), v,
                             preferred_element_type=jnp.float32)
            return ctx.sum(axis=(1, 2, 3))
        return layer

    for name, layer in [("qk_only", qk_only),
                        ("qk_bias_softmax", qk_bias_softmax),
                        ("full_f32_scores", full(jnp.float32)),
                        ("full_bf16_scores", full(jnp.bfloat16))]:
        timed(name, _attn_loop(layer, caches, q0, bias), caches, q0, bias)


def run_pv_variants():
    """PV contraction layout: current (B,H,D,K) keys-on-lanes vs a
    transposed V cache (B,H,K,D) with the contraction on sublanes."""
    p0 = jax.nn.softmax(
        jax.random.normal(jax.random.fold_in(key, 30), (Bex, H, G, T * G)),
        axis=-1).astype(dt)

    vs = _caches((Bex, H, D, T * G), n=NL)
    def pv_cur(vs, p):
        def body(i, acc):
            out = acc * 0
            for l in range(NL):
                p2 = p + (out[:, None, None, None] * 0).astype(dt)
                ctx = jnp.einsum("bhgk,bhdk->bghd", p2, vs[l],
                                 preferred_element_type=jnp.float32)
                out = out + ctx.sum(axis=(1, 2, 3))
            return acc + out
        return jax.lax.fori_loop(0, T, body, jnp.zeros((Bex,), jnp.float32))
    timed("pv_current", pv_cur, vs, p0)

    vsT = _caches((Bex, H, T * G, D), n=NL)
    def pv_T(vsT, p):
        def body(i, acc):
            out = acc * 0
            for l in range(NL):
                p2 = p + (out[:, None, None, None] * 0).astype(dt)
                ctx = jnp.einsum("bhgk,bhkd->bghd", p2, vsT[l],
                                 preferred_element_type=jnp.float32)
                out = out + ctx.sum(axis=(1, 2, 3))
            return acc + out
        return jax.lax.fori_loop(0, T, body, jnp.zeros((Bex,), jnp.float32))
    timed("pv_transposedV", pv_T, vsT, p0)


def run_pieces():
    """Whole-step pieces: cross-attention and dense/MLP/logits (the cache
    and self-attention pieces have their own selectors)."""
    enc_kv = _caches((Bex, H, D, L), n=2 * NL)
    q0 = jax.random.normal(jax.random.fold_in(key, 2), (Bex, G, H, D), dt)

    def cross(k, v, q, bias):
        s = jnp.einsum("bghd,bhdk->bhgk", q, k,
                       preferred_element_type=jnp.float32) * 0.125
        p = jax.nn.softmax(s, axis=-1)
        ctx = jnp.einsum("bhgk,bhdk->bghd", p.astype(dt), v,
                         preferred_element_type=jnp.float32)
        return ctx.sum(axis=(1, 2, 3))
    timed("cross_attn", _attn_loop(cross, enc_kv, q0, None), enc_kv, q0, None)

    Wq = jax.random.normal(jax.random.fold_in(key, 16), (H * D, H * D), dt) * 0.02
    Wf1 = jax.random.normal(jax.random.fold_in(key, 17), (H * D, 4 * H * D), dt) * 0.02
    Wf2 = jax.random.normal(jax.random.fold_in(key, 18), (4 * H * D, H * D), dt) * 0.02
    Wlog = jax.random.normal(jax.random.fold_in(key, 19), (H * D, V), dt) * 0.02

    def dense(x):
        def body(i, x):
            h = x
            for l in range(NL):
                for _ in range(4):
                    h = h @ Wq
                h = jax.nn.gelu(h @ Wf1) @ Wf2
            logits = h @ Wlog
            return x + logits[:, :1] * 1e-6
        return jax.lax.fori_loop(0, T, body, x)
    timed("dense_mlp_logits", dense,
          jax.random.normal(jax.random.fold_in(key, 3), (Bex * G, H * D), dt))


if __name__ == "__main__":
    sel = sys.argv[1] if len(sys.argv) > 1 else "all"
    probes = {"cache": run_cache_variants, "attn": run_attn_split,
              "pv": run_pv_variants, "pieces": run_pieces}
    for name, fn in probes.items():
        if sel in (name, "all"):
            print(f"-- {name}", flush=True)
            fn()
