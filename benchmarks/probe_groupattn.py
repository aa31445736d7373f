"""In-loop microbench of the ancestry-masked grouped decode attention."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), '..'))
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

B, K, T, H, D = 32, 20, 160, 12, 64
KT = K * T
N_IT = 50

rng = np.random.default_rng(0)
q0 = jnp.asarray(rng.standard_normal((B, K, H, D)), jnp.bfloat16)
k0 = jnp.asarray(rng.standard_normal((B, KT, H, D)), jnp.bfloat16)
v0 = jnp.asarray(rng.standard_normal((B, KT, H, D)), jnp.bfloat16)
bias0 = jnp.asarray(rng.choice([0.0, -1e9], (B, K, KT), p=[0.05, 0.95]),
                    jnp.float32)


def attn_f32(q, k, v, bias):
    s = jnp.einsum("bghd,bkhd->bhgk", q, k, preferred_element_type=jnp.float32)
    s = s / np.sqrt(D) + bias[:, None]
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhgk,bkhd->bghd", p.astype(jnp.bfloat16), v,
                      preferred_element_type=jnp.float32).astype(jnp.bfloat16)


def attn_bf16(q, k, v, bias):
    s = jnp.einsum("bghd,bkhd->bhgk", q, k, preferred_element_type=jnp.float32)
    s = s / np.sqrt(D) + bias[:, None]
    m = s.max(axis=-1, keepdims=True)
    e = jnp.exp((s - m)).astype(jnp.bfloat16)
    p = e / e.sum(axis=-1, keepdims=True).astype(jnp.bfloat16)
    return jnp.einsum("bhgk,bkhd->bghd", p, v,
                      preferred_element_type=jnp.float32).astype(jnp.bfloat16)


def perrow_ref(q, k, v, bias):
    # old per-row path shape: (B*K, 1, H, D) q against (B*K, T, H, D) cache
    q2 = q.reshape(B * K, 1, H, D)
    k2 = k.reshape(B * K, T, H, D)
    v2 = v.reshape(B * K, T, H, D)
    s = jnp.einsum("bqhd,bkhd->bhqk", q2, k2, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s / np.sqrt(D), axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", p.astype(jnp.bfloat16), v2,
                   preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    return o.reshape(B, K, H, D)


def loop(op, with_bias=True):
    @jax.jit
    def run(q, k, v, bias):
        def body(i, carry):
            q, o = carry
            q = q + o * jnp.bfloat16(1e-6)  # chain dependence
            o = op(q, k, v, bias)
            return q, o
        q, o = jax.lax.fori_loop(0, N_IT, body, (q, jnp.zeros_like(q)))
        return o.reshape(-1)[0]
    return run


def t(fn, reps=3):
    np.asarray(fn(q0, k0, v0, bias0))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(q0, k0, v0, bias0))
        best = min(best, time.perf_counter() - t0)
    return best / N_IT


names = sys.argv[1:] or ["f32", "bf16", "perrow"]
for name in names:
    op = {"f32": attn_f32, "bf16": attn_bf16, "perrow": perrow_ref}[name]
    dt = t(loop(op))
    print(f"{name:8s} {dt*1e3:7.2f} ms per attention (x6 layers = "
          f"{6*dt*1e3:5.1f} ms/step)", flush=True)
