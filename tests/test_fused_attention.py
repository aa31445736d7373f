"""Fused dropout-attention kernel (ops/fused_attention.py): forward and
custom-VJP parity against an explicit-mask reference, dropout statistics,
and integration through MultiHeadAttention's flash training path.

On the CPU interpret backend the keep mask is synthesized host-side (no
prng_seed lowering); the in-kernel PRNG path is exercised on real TPU by
_tpu_fa_test-style checks and the train bench.
"""

import jax
import jax.numpy as jnp
import numpy as np

from textreact_tpu.ops.fused_attention import fused_dropout_attention

B, L, H, D = 2, 128, 4, 32
SCALE = 1.0 / np.sqrt(D)


def _qkv(seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.normal(size=(B, L, H, D)), dtype)
    q, k, v = mk(), mk(), mk()
    mask = jnp.asarray(
        np.concatenate([np.ones((B, 100)), np.zeros((B, L - 100))], 1), jnp.int32)
    return q, k, v, mask


def _ref_attn(q, k, v, mask):
    s = jnp.einsum("blhd,bmhd->bhlm", q, k,
                   preferred_element_type=jnp.float32) * SCALE
    s = s + jnp.where(mask[:, None, None, :] > 0, 0.0, -1e9)
    p = jax.nn.softmax(s, -1)
    return jnp.einsum("bhlm,bmhd->blhd", p, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _ref_drop(q, k, v, mask, keep, p):
    s = jnp.einsum("blhd,bmhd->bhlm", q, k,
                   preferred_element_type=jnp.float32) * SCALE
    s = s + jnp.where(mask[:, None, None, :] > 0, 0.0, -1e9)
    pr = jax.nn.softmax(s, -1)
    d = jnp.where(keep, pr / (1 - p), 0.0)
    return jnp.einsum("bhlm,bmhd->blhd", d, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _interpret_keep(rng, p):
    """Reconstruct the keep mask the kernel uses in interpret mode."""
    seed = jax.random.randint(rng, (1,), 0, jnp.iinfo(jnp.int32).max,
                              dtype=jnp.int32)
    key = jax.random.fold_in(jax.random.PRNGKey(0), seed[0])
    return jax.random.uniform(key, (B, H, L, L)) >= p


def test_p0_matches_reference():
    q, k, v, mask = _qkv()
    out = fused_dropout_attention(q, k, v, mask, 0.0, None, SCALE)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref_attn(q, k, v, mask)),
                               rtol=1e-5, atol=1e-5)


def test_p0_grads_match_reference():
    q, k, v, mask = _qkv()
    for arg in range(3):
        args = [q, k, v]
        f1 = lambda x: (fused_dropout_attention(
            *(args[:arg] + [x] + args[arg + 1:]), mask, 0.0, None, SCALE) ** 2).sum()
        f2 = lambda x: (_ref_attn(*(args[:arg] + [x] + args[arg + 1:]), mask) ** 2).sum()
        g1, g2 = jax.grad(f1)(args[arg]), jax.grad(f2)(args[arg])
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-4, atol=1e-5)


def test_dropout_fwd_and_grads_match_explicit_mask():
    """Kernel forward/backward must equal jax autodiff through an explicit
    dropout mask equal to the kernel's own keep bits."""
    q, k, v, mask = _qkv(seed=1)
    p = 0.2
    rng = jax.random.fold_in(jax.random.PRNGKey(3), 5)
    keep = _interpret_keep(rng, p)
    out_k = fused_dropout_attention(q, k, v, mask, p, rng, SCALE)
    out_r = _ref_drop(q, k, v, mask, keep, p)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               rtol=1e-5, atol=1e-5)
    for arg in range(3):
        args = [q, k, v]
        fk = lambda x: (fused_dropout_attention(
            *(args[:arg] + [x] + args[arg + 1:]), mask, p, rng, SCALE) ** 2).sum()
        fr = lambda x: (_ref_drop(
            *(args[:arg] + [x] + args[arg + 1:]), mask, keep, p) ** 2).sum()
        gk, gr = jax.grad(fk)(args[arg]), jax.grad(fr)(args[arg])
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                                   rtol=1e-4, atol=1e-5)


def test_dropout_is_deterministic_per_key_and_varies_across_keys():
    q, k, v, mask = _qkv(seed=2)
    key = jax.random.PRNGKey(7)
    a = fused_dropout_attention(q, k, v, mask, 0.1, key, SCALE)
    b = fused_dropout_attention(q, k, v, mask, 0.1, key, SCALE)
    c = fused_dropout_attention(q, k, v, mask, 0.1, jax.random.fold_in(key, 1), SCALE)
    assert np.array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_dropout_mean_approaches_undropped():
    q, k, v, mask = _qkv(seed=3)
    ref = _ref_attn(q, k, v, mask)
    key = jax.random.PRNGKey(11)
    outs = jnp.stack([
        fused_dropout_attention(q, k, v, mask, 0.2, jax.random.fold_in(key, i), SCALE)
        for i in range(40)
    ])
    err = jnp.abs(outs.mean(0) - ref)[:, :100].max()
    assert float(err) < 0.15, float(err)


def test_flash_training_path_uses_fused_kernel():
    """MultiHeadAttention with attention_impl='flash', dropout on, and a
    non-deterministic apply must run (interpret) and differ from the
    deterministic output; deterministic eval equals the XLA path."""
    from textreact_tpu.models import TransformerConfig
    from textreact_tpu.models.layers import MultiHeadAttention

    cfg = TransformerConfig(vocab_size=32, hidden_size=H * D,
                            num_hidden_layers=1, num_attention_heads=H,
                            intermediate_size=64, max_position_embeddings=L,
                            attention_probs_dropout_prob=0.25,
                            attention_impl="flash")
    mha = MultiHeadAttention(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, L, H * D)), jnp.float32)
    mask = jnp.ones((B, L), jnp.int32)
    params = mha.init({"params": jax.random.PRNGKey(0)}, x, mask_kv=mask)
    det = mha.apply(params, x, mask_kv=mask, deterministic=True)
    tr = mha.apply(params, x, mask_kv=mask, deterministic=False,
                   rngs={"dropout": jax.random.PRNGKey(5)})
    assert not np.allclose(np.asarray(det), np.asarray(tr))
    # deterministic flash == xla path
    cfg_x = cfg.replace(attention_impl="xla")
    mha_x = MultiHeadAttention(cfg_x, dtype=jnp.float32)
    det_x = mha_x.apply(params, x, mask_kv=mask, deterministic=True)
    np.testing.assert_allclose(np.asarray(det), np.asarray(det_x),
                               rtol=2e-5, atol=2e-5)
