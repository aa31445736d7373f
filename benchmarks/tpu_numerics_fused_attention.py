"""On-chip numerics battery for the fused dropout-attention kernel.

Run on real TPU (the in-kernel PRNG path — CPU tests exercise interpret
mode with a host-side mask instead). Proves, post backward-rework
(delta = rowsum(dO*O) residual, deferred 1/l normalization, dV rescale):

  1. p=0 forward AND all three grads match XLA attention (f32 tight,
     bf16 at flagship dtype).
  2. Dropout forward and grads match jax autodiff through an EXPLICIT
     keep mask equal to the kernel's own on-chip PRNG bits. The mask is
     extracted exactly by running the kernel forward with identity-slab
     v matrices: out = D_eff @ v with D_eff = keep * P / (1-p), and the
     PRNG stream depends only on (seed, batch, head-group) — not on v —
     so ceil(L/D) slab calls read out the full (L, L) dropped-probs
     matrix per head, and keep = D_eff > 0 on unmasked keys.
  3. Grads are deterministic per seed and distinct across seeds.

Reference dropout semantics: torch/HF attention-prob dropout
(reference textreact main.py model forward + configs/bert_l6.json).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), '..'))

import jax
import jax.numpy as jnp
import numpy as np

from textreact_tpu.ops.fused_attention import fused_dropout_attention

assert jax.default_backend() != "cpu", "this battery must run on real TPU"

B, L, H, D = 2, 512, 12, 64
P_DROP = 0.1
SCALE = 1.0 / np.sqrt(D)
failures = []


def check(name, err, tol):
    ok = err <= tol
    print(f"  {'ok ' if ok else 'FAIL'} {name}: max err {err:.3e} (tol {tol:.0e})",
          flush=True)
    if not ok:
        failures.append(name)


def qkv_mask(dtype, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.normal(size=(B, L, H, D)), dtype)
    q, k, v = mk(), mk(), mk()
    mask = jnp.asarray(
        np.concatenate([np.ones((B, 400)), np.zeros((B, L - 400))], 1),
        jnp.int32)
    return q, k, v, mask


def ref_attn(q, k, v, mask):
    s = jnp.einsum("blhd,bmhd->bhlm", q, k,
                   preferred_element_type=jnp.float32) * SCALE
    s = s + jnp.where(mask[:, None, None, :] > 0, 0.0, -1e9)
    p = jax.nn.softmax(s, -1)
    return jnp.einsum("bhlm,bmhd->blhd", p.astype(q.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def ref_drop(q, k, v, mask, keep):
    s = jnp.einsum("blhd,bmhd->bhlm", q, k,
                   preferred_element_type=jnp.float32) * SCALE
    s = s + jnp.where(mask[:, None, None, :] > 0, 0.0, -1e9)
    pr = jax.nn.softmax(s, -1)
    d = jnp.where(keep, pr / (1 - P_DROP), 0.0).astype(q.dtype)
    return jnp.einsum("bhlm,bmhd->blhd", d, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def grads(f, args):
    return [np.asarray(jax.grad(
        lambda x, i=i: (f(*(args[:i] + (x,) + args[i + 1:]))
                        .astype(jnp.float32) ** 2).sum())(args[i])
        .astype(jnp.float32)) for i in range(3)]


def rel_err(a, b):
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    return float(np.abs(a - b).max() / max(np.abs(b).max(), 1e-12))


def extract_keep(q, k, mask, key):
    """Read the kernel's own keep mask off-chip via identity-slab v."""
    slabs = []
    eye = np.eye(L, dtype=np.float32)
    for j0 in range(0, L, D):
        v_slab = jnp.asarray(
            np.repeat(eye[:, j0:j0 + D][:, None, :], H, axis=1)[None]
            .repeat(B, axis=0), jnp.float32)  # (B, L, H, D)
        out = fused_dropout_attention(q.astype(jnp.float32),
                                      k.astype(jnp.float32), v_slab, mask,
                                      P_DROP, key, SCALE)
        slabs.append(np.asarray(out.astype(jnp.float32)))  # (B, L, H, D)
    d_eff = np.concatenate(slabs, axis=-1)        # (B, L, H, L)
    d_eff = np.transpose(d_eff, (0, 2, 1, 3))     # (B, H, L, L)
    keep = d_eff > 0
    keep[..., 400:] = True  # masked keys: P=0 there, keep value irrelevant
    return jnp.asarray(keep)


def battery(dtype, tol_fwd, tol_grad):
    name = np.dtype(dtype).name if dtype == np.float32 else "bfloat16"
    print(f"-- dtype {name}", flush=True)
    q, k, v, mask = qkv_mask(dtype)

    f0 = lambda q, k, v: fused_dropout_attention(q, k, v, mask, 0.0, None, SCALE)
    r0 = lambda q, k, v: ref_attn(q, k, v, mask)
    check("p=0 fwd vs XLA", rel_err(f0(q, k, v).astype(jnp.float32),
                                    r0(q, k, v).astype(jnp.float32)), tol_fwd)
    gk, gr = grads(f0, (q, k, v)), grads(r0, (q, k, v))
    for nm, a, b in zip("dq dk dv".split(), gk, gr):
        check(f"p=0 {nm} vs XLA", rel_err(a, b), tol_grad)

    key = jax.random.fold_in(jax.random.PRNGKey(17), 3)
    keep = extract_keep(q, k, mask, key)
    frac = float(np.asarray(keep[..., :400]).mean())
    print(f"  keep fraction {frac:.4f} (target {1 - P_DROP})", flush=True)
    assert abs(frac - (1 - P_DROP)) < 0.01, frac

    fd = lambda q, k, v: fused_dropout_attention(q, k, v, mask, P_DROP, key, SCALE)
    rd = lambda q, k, v: ref_drop(q, k, v, mask, keep)
    check("dropout fwd vs explicit mask",
          rel_err(fd(q, k, v).astype(jnp.float32),
                  rd(q, k, v).astype(jnp.float32)), tol_fwd)
    gk, gr = grads(fd, (q, k, v)), grads(rd, (q, k, v))
    for nm, a, b in zip("dq dk dv".split(), gk, gr):
        check(f"dropout {nm} vs explicit mask", rel_err(a, b), tol_grad)

    ga = grads(fd, (q, k, v))
    det = all(np.array_equal(a, b) for a, b in zip(gk, ga))
    key2 = jax.random.fold_in(jax.random.PRNGKey(17), 4)
    f2 = lambda q, k, v: fused_dropout_attention(q, k, v, mask, P_DROP, key2, SCALE)
    dist = not np.array_equal(gk[0], grads(f2, (q, k, v))[0])
    print(f"  {'ok ' if det else 'FAIL'} grads deterministic per seed; "
          f"{'ok ' if dist else 'FAIL'} distinct across seeds", flush=True)
    if not det:
        failures.append("determinism")
    if not dist:
        failures.append("seed-distinct")


# f32 tolerance is MXU-default-precision bound (~3e-3 observed): TPU f32
# matmuls run at reduced precision by default and the kernel's in-Mosaic
# dots truncate differently than the XLA einsum — both sides are "default
# precision correct". The tight-math proof (1e-5) is the CPU interpret
# suite (tests/test_fused_attention.py); this battery proves the REAL
# lowering + in-kernel PRNG path at both dtypes.
battery(np.float32, 1e-2, 1e-2)
battery(jnp.bfloat16, 2e-2, 4e-2)
print("ALL OK" if not failures else f"FAILURES: {failures}", flush=True)
_sys.exit(1 if failures else 0)
