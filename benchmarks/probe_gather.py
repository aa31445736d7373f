"""Microbenchmark beam-permute variants INSIDE a device loop (the relay
costs ~31 ms per call, so per-op timing must amortize over many iterations
in one jit call)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), '..'))
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

B, K, T, H, D = 32, 20, 160, 12, 64
N_IT = 50

x0 = jnp.asarray(np.random.default_rng(0).standard_normal((B * K, T, H, D)),
                 jnp.bfloat16)
idx0 = jnp.asarray(np.random.default_rng(1).integers(0, K, (B, K)), jnp.int32)

nbytes = B * K * T * H * D * 2


def loop(op):
    @jax.jit
    def run(x, idx):
        def body(i, carry):
            x, idx = carry
            # vary idx per iteration so nothing is loop-hoisted
            idx = (idx + i) % K
            x = op(x, idx)
            return x, idx
        x, idx = jax.lax.fori_loop(0, N_IT, body, (x, idx))
        return x[0, 0, 0]
    return run


def op_add(x, idx):
    return x + jnp.bfloat16(1.0)


def op_gather(x, idx):
    flat = (jnp.arange(B)[:, None] * K + idx).reshape(-1)
    return x[flat]


def op_take(x, idx):
    return jnp.take_along_axis(x.reshape(B, K, T, H, D),
                               idx[:, :, None, None, None],
                               axis=1).reshape(x.shape)


def op_onehot(x, idx):
    oh = jax.nn.one_hot(idx, K, dtype=jnp.bfloat16)
    xr = x.reshape(B, K, -1)
    return jnp.einsum("bjk,bkt->bjt", oh, xr,
                      preferred_element_type=jnp.bfloat16).reshape(x.shape)


def op_onehot_merged(x, idx):
    # single (B*K', B*K) one-hot over the merged leading axis: one big matmul
    flat = (jnp.arange(B)[:, None] * K + idx).reshape(-1)
    oh = jax.nn.one_hot(flat, B * K, dtype=jnp.bfloat16)
    return jnp.einsum("jk,kt->jt", oh, x.reshape(B * K, -1),
                      preferred_element_type=jnp.bfloat16).reshape(x.shape)


def t(fn, *a, reps=3):
    o = fn(*a)
    np.asarray(o)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*a))
        best = min(best, time.perf_counter() - t0)
    return best / N_IT


OPS = {"add": op_add, "gather": op_gather, "take": op_take,
       "onehot": op_onehot, "onehot_merged": op_onehot_merged}
sel = sys.argv[1:] or list(OPS)
for name in sel:
    dt = t(loop(OPS[name]), x0, idx0)
    print(f"{name:14s} {dt*1e3:7.2f} ms/it  ({2*nbytes/dt/1e9:6.1f} GB/s r+w)",
          flush=True)
