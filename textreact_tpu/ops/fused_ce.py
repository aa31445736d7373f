"""Fused linear + cross-entropy over a large vocabulary (the MLM head).

Folds the vocab projection into the loss so the (N, V) float32 logits are
never materialized in HBM: the forward pass streams W in vocab chunks
through an online logsumexp (flash-attention-style running max/sum), and a
custom VJP recomputes each chunk's softmax on the fly while accumulating
dX / dW / db — so autodiff never stores per-chunk residuals either.

Why: at the RCR flagship geometry (B=32, 64-token masked prefix,
V=31090) the unfused path writes + re-reads ~254 MB of f32 logits in the
forward and again in the backward; the train-step anatomy measured the CE
through those logits alone at 3.8 ms of a 98 ms step
(benchmarks/train_anatomy.py). Semantics match losses.mlm_loss /
torch F.cross_entropy(ignore_index) (reference main.py:158-162): returns
(sum of per-token NLL over non-ignored positions, count of non-ignored).

MXU notes: operands are cast to `x.dtype` (bf16 in training) with float32
accumulation; chunk size 4096 keeps each (N, C) tile MXU-friendly and the
running state in registers/VMEM.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array

_NEG = -1e30


def _pad_w(w: Array, bias: Array, vocab_axis: int, chunk: int, cd):
    """Cast W to the compute dtype and pad the vocab axis to a chunk
    multiple, stacked as (n_chunks, D, C) for clean lax.scan slicing."""
    if vocab_axis == 0:          # (V, D) — tied word embedding
        w = w.T
    d, v = w.shape
    n_chunks = -(-v // chunk)
    pad = n_chunks * chunk - v
    w = jnp.pad(w.astype(cd), ((0, 0), (0, pad)))
    bias = jnp.pad(bias.astype(jnp.float32), (0, pad),
                   constant_values=_NEG)
    w = jnp.moveaxis(w.reshape(d, n_chunks, chunk), 1, 0)
    return w, bias.reshape(n_chunks, chunk), n_chunks, v


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_linear_ce(x: Array, w: Array, bias: Array, labels: Array,
                    ignore_id: int, vocab_axis: int = 1,
                    chunk: int = 4096):
    """sum-NLL and valid-count of softmax(x @ W + b) vs labels.

    x: (N, D); w: (D, V) (vocab_axis=1, nn.Dense kernel) or (V, D)
    (vocab_axis=0, tied embedding); bias: (V,); labels: (N,) int with
    ignore_id holes. Returns (sum_nll float32 scalar, n_valid int32).
    """
    out, _ = _fwd(x, w, bias, labels, ignore_id, vocab_axis, chunk)
    return out


def _fwd(x, w, bias, labels, ignore_id, vocab_axis, chunk):
    cd = x.dtype
    n = x.shape[0]
    wc, bc, n_chunks, v = _pad_w(w, bias, vocab_axis, chunk, cd)
    valid = labels != ignore_id
    safe_labels = jnp.where(valid, labels, 0).astype(jnp.int32)

    def body(carry, wb):
        m, s, ll, j = carry
        w_j, b_j = wb
        logits = jnp.einsum("nd,dc->nc", x, w_j,
                            preferred_element_type=jnp.float32) + b_j
        m_new = jnp.maximum(m, logits.max(axis=-1))
        s = s * jnp.exp(m - m_new) + jnp.exp(
            logits - m_new[:, None]).sum(axis=-1)
        idx = safe_labels - j * chunk
        in_chunk = (idx >= 0) & (idx < chunk)
        picked = jnp.take_along_axis(
            logits, jnp.clip(idx, 0, chunk - 1)[:, None], axis=-1)[:, 0]
        ll = jnp.where(in_chunk, picked, ll)
        return (m_new, s, ll, j + 1), None

    init = (jnp.full((n,), _NEG, jnp.float32), jnp.zeros((n,), jnp.float32),
            jnp.zeros((n,), jnp.float32), jnp.zeros((), jnp.int32))
    (m, s, ll, _), _ = jax.lax.scan(body, init, (wc, bc))
    lse = m + jnp.log(s)
    sum_nll = jnp.where(valid, lse - ll, 0.0).sum()
    n_valid = valid.sum().astype(jnp.int32)
    return (sum_nll, n_valid), (x, w, bias, safe_labels, valid, lse)


def _bwd(ignore_id, vocab_axis, chunk, res, g):
    x, w, bias, safe_labels, valid, lse = res
    g_sum = g[0]  # d(loss)/d(sum_nll); n_valid is integer (no cotangent)
    cd = x.dtype
    wc, bc, n_chunks, v = _pad_w(w, bias, vocab_axis, chunk, cd)
    # per-row scale: g for valid rows, 0 for ignored
    gv = (g_sum * valid.astype(jnp.float32))[:, None]

    def body(dx, wbj):
        w_j, b_j, j = wbj
        logits = jnp.einsum("nd,dc->nc", x, w_j,
                            preferred_element_type=jnp.float32) + b_j
        p = jnp.exp(logits - lse[:, None])
        idx = safe_labels - j * chunk
        in_chunk = (idx >= 0) & (idx < chunk)
        onehot = (jnp.arange(chunk)[None, :] ==
                  jnp.clip(idx, 0, chunk - 1)[:, None]) & in_chunk[:, None]
        dlogits = (gv * (p - onehot.astype(jnp.float32))).astype(cd)
        dx = dx + jnp.einsum("nc,dc->nd", dlogits, w_j,
                             preferred_element_type=jnp.float32)
        dw_j = jnp.einsum("nd,nc->dc", x, dlogits,
                          preferred_element_type=jnp.float32)
        db_j = dlogits.astype(jnp.float32).sum(axis=0)
        return dx, (dw_j, db_j)

    dx0 = jnp.zeros(x.shape, jnp.float32)
    js = jnp.arange(n_chunks, dtype=jnp.int32)
    dx, (dw_c, db_c) = jax.lax.scan(body, dx0, (wc, bc, js))
    dw = jnp.moveaxis(dw_c, 0, 1).reshape(x.shape[1], -1)[:, :v]
    db = db_c.reshape(-1)[:v]
    if vocab_axis == 0:
        dw = dw.T
    return (dx.astype(x.dtype), dw.astype(w.dtype), db.astype(bias.dtype),
            None)


fused_linear_ce.defvjp(_fwd, _bwd)
