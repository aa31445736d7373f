"""Fused grouped decode attention kernel vs the XLA reference path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from textreact_tpu.ops.decode_attention import grouped_decode_attention

NEG = -1e9


def _reference(q, k_cache, v_cache, bias, sm_scale):
    B, G, H, D = q.shape
    _, _, _, T, _ = k_cache.shape
    k2 = k_cache.reshape(B, H, D, T * G)
    v2 = v_cache.reshape(B, H, D, T * G)
    s = jnp.einsum("bghd,bhdk->bhgk", q, k2,
                   preferred_element_type=jnp.float32) * sm_scale
    s = s + bias[:, None]
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhgk,bhdk->bghd", p.astype(q.dtype), v2,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _ancestry_bias(rng, B, G, T, cur):
    """Random but structurally-valid ancestry bias: one admitted row per
    (beam, position < cur)."""
    src = rng.integers(0, G, (B, G, T))
    bias = np.full((B, G, T, G), NEG, np.float32)
    for b in range(B):
        for g in range(G):
            for t in range(cur):
                bias[b, g, t, src[b, g, t]] = 0.0
    return jnp.asarray(bias.reshape(B, G, T * G))


@pytest.mark.parametrize("B,G,H,D,T,cur", [
    (2, 4, 2, 64, 8, 5),      # mid-decode: last block partially masked
    (1, 3, 1, 64, 16, 16),    # full prefix
    (2, 1, 2, 64, 8, 1),      # greedy (G=1), first step
])
def test_kernel_matches_xla_reference(B, G, H, D, T, cur):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, G, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, D, T, G)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, D, T, G)), jnp.float32)
    bias = _ancestry_bias(rng, B, G, T, cur)
    scale = 1.0 / np.sqrt(D)
    ref = _reference(q, k, v, bias, scale)
    got = grouped_decode_attention(q, k, v, bias, jnp.int32(cur), scale,
                                   interpret=jax.default_backend() == "cpu")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_kernel_skips_stale_tail():
    """Entries at t >= cur_len must not leak into the output even when they
    hold garbage (the kernel never reads those blocks)."""
    rng = np.random.default_rng(1)
    B, G, H, D, T, cur = 1, 2, 1, 64, 8, 3
    q = jnp.asarray(rng.standard_normal((B, G, H, D)), jnp.float32)
    k = np.asarray(rng.standard_normal((B, H, D, T, G)), np.float32)
    v = np.asarray(rng.standard_normal((B, H, D, T, G)), np.float32)
    bias = _ancestry_bias(rng, B, G, T, cur)
    scale = 1.0 / np.sqrt(D)
    out1 = grouped_decode_attention(q, jnp.asarray(k), jnp.asarray(v), bias,
                                    jnp.int32(cur), scale,
                                    interpret=jax.default_backend() == "cpu")
    k[:, :, :, cur:, :] = 1e30  # garbage beyond the prefix
    v[:, :, :, cur:, :] = -1e30
    out2 = grouped_decode_attention(q, jnp.asarray(k), jnp.asarray(v), bias,
                                    jnp.int32(cur), scale,
                                    interpret=jax.default_backend() == "cpu")
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))


def test_kernel_at_retro_scale_shapes():
    """Exact flagship retro geometry (G=20 beams, H=12, D=64, T=160) —
    the shapes the head-batched block-diagonal formulation must serve."""
    rng = np.random.default_rng(3)
    B, G, H, D, T, cur = 1, 20, 12, 64, 160, 37
    q = jnp.asarray(rng.standard_normal((B, G, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, D, T, G)) * 0.1, jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, D, T, G)) * 0.1, jnp.float32)
    bias = _ancestry_bias(rng, B, G, T, cur)
    scale = 1.0 / np.sqrt(D)
    ref = _reference(q, k, v, bias, scale)
    got = grouped_decode_attention(q, k, v, bias, jnp.int32(cur), scale,
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
