"""Fused residual+LayerNorm kernel vs the XLA/flax reference (forward and
gradients, f32 + bf16, interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from textreact_tpu.ops.fused_layernorm import (fused_residual_layernorm,
                                               residual_layernorm_reference)


@pytest.mark.parametrize("shape", [(4, 16, 64), (2, 7, 128), (64, 256)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_forward_matches_reference(shape, dtype):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape), dtype)
    y = jnp.asarray(rng.standard_normal(shape), dtype)
    scale = jnp.asarray(rng.standard_normal(shape[-1]), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(shape[-1]), jnp.float32)
    got = fused_residual_layernorm(x, y, scale, bias)
    ref = residual_layernorm_reference(x, y, scale, bias)
    tol = 1e-6 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=tol, atol=tol)


def test_matches_flax_layernorm():
    from flax import linen as nn
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((8, 32, 96)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((8, 32, 96)), jnp.float32)
    ln = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32)
    params = ln.init(jax.random.PRNGKey(0), x + y)
    ref = ln.apply(params, x + y)
    got = fused_residual_layernorm(x, y, params["params"]["scale"],
                                   params["params"]["bias"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-6, atol=2e-6)


def test_gradients_match_reference_autodiff():
    rng = np.random.default_rng(2)
    shape = (4, 24, 64)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    y = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(shape[-1]), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(shape[-1]), jnp.float32)
    g = jnp.asarray(rng.standard_normal(shape), jnp.float32)

    def loss_fused(x, y, s, b):
        return jnp.sum(fused_residual_layernorm(x, y, s, b) * g)

    def loss_ref(x, y, s, b):
        return jnp.sum(residual_layernorm_reference(x, y, s, b) * g)

    got = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, y, scale, bias)
    ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, y, scale, bias)
    for a, b_ in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-5, atol=2e-5)


def test_bf16_gradients_close():
    rng = np.random.default_rng(3)
    shape = (2, 16, 128)
    x = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
    y = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
    scale = jnp.ones((shape[-1],), jnp.float32)
    bias = jnp.zeros((shape[-1],), jnp.float32)

    def loss_fused(x, y, s, b):
        return jnp.sum(fused_residual_layernorm(x, y, s, b).astype(jnp.float32))

    def loss_ref(x, y, s, b):
        return jnp.sum(residual_layernorm_reference(x, y, s, b).astype(jnp.float32))

    got = jax.grad(loss_fused, argnums=(2, 3))(x, y, scale, bias)
    ref = jax.grad(loss_ref, argnums=(2, 3))(x, y, scale, bias)
    for a, b_ in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=5e-2, atol=5e-2)


def test_model_fused_vs_xla_layernorm_equivalence():
    """Flipping layernorm_impl must not change the model function: same
    params (identical tree), same logits within kernel tolerance."""
    from textreact_tpu.models import BERT_L6_DECODER, SCIBERT_BASE
    from textreact_tpu.models.encdec import EncoderDecoder

    def build(impl):
        enc = SCIBERT_BASE.replace(
            vocab_size=128, hidden_size=128, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=256,
            max_position_embeddings=64, layernorm_impl=impl,
            attention_impl="xla")
        dec = BERT_L6_DECODER.replace(
            vocab_size=96, hidden_size=128, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=256,
            max_position_embeddings=32, layernorm_impl=impl,
            attention_impl="xla")
        return EncoderDecoder(encoder_config=enc, decoder_config=dec,
                              dtype=jnp.float32)

    rng = np.random.default_rng(0)
    batch = {
        "input_ids": jnp.asarray(rng.integers(1, 128, (2, 24)), jnp.int32),
        "attention_mask": jnp.ones((2, 24), jnp.int32),
        "decoder_input_ids": jnp.asarray(rng.integers(1, 96, (2, 8)), jnp.int32),
        "decoder_attention_mask": jnp.ones((2, 8), jnp.int32),
    }
    xla_model = build("xla")
    fused_model = build("fused")
    params = xla_model.init(jax.random.PRNGKey(0), **batch)
    ref = xla_model.apply(params, **batch, deterministic=True)["logits"]
    got = fused_model.apply(params, **batch, deterministic=True)["logits"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_in_kernel_dropout_matches_masked_reference():
    """p > 0: the fused output must equal the reference computed with the
    SAME keep mask (reconstructable in interpret mode from the seed), and
    gradients must flow through the mask identically."""
    from textreact_tpu.ops.fused_layernorm import fused_residual_layernorm

    rng = np.random.default_rng(4)
    shape = (8, 16, 64)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    y = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(shape[-1]), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(shape[-1]), jnp.float32)
    p = 0.3
    drop_rng = jax.random.PRNGKey(7)
    # reconstruct the interpret-mode keep mask from the derived seed
    seed = jax.random.randint(drop_rng, (1,), 0,
                              jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
    key = jax.random.fold_in(jax.random.PRNGKey(0), seed[0])
    keep = (jax.random.uniform(key, (np.prod(shape[:-1]), shape[-1]))
            >= p).reshape(shape)
    y_ref = jnp.where(keep, y / (1 - p), 0.0)

    got = fused_residual_layernorm(x, y, scale, bias, dropout_p=p,
                                   dropout_rng=drop_rng)
    ref = residual_layernorm_reference(x, y_ref, scale, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    g = jnp.asarray(rng.standard_normal(shape), jnp.float32)

    def loss_fused(x, y, s, b):
        return jnp.sum(fused_residual_layernorm(
            x, y, s, b, dropout_p=p, dropout_rng=drop_rng) * g)

    def loss_ref(x, y, s, b):
        yr = jnp.where(keep, y / (1 - p), 0.0)
        return jnp.sum(residual_layernorm_reference(x, yr, s, b) * g)

    got_g = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, y, scale, bias)
    ref_g = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, y, scale, bias)
    for a, b_ in zip(got_g, ref_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-5, atol=2e-5)


def test_model_fused_dropout_trains():
    """Training mode with hidden dropout through the fused path must run
    and produce finite, seed-deterministic outputs that differ across
    dropout seeds."""
    from textreact_tpu.models import SCIBERT_BASE
    from textreact_tpu.models.encoder import Encoder

    enc_cfg = SCIBERT_BASE.replace(
        vocab_size=64, hidden_size=128, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=256,
        max_position_embeddings=32, layernorm_impl="fused",
        attention_impl="xla", hidden_dropout_prob=0.2)
    model = Encoder(enc_cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 64, (2, 16)), jnp.int32)
    mask = jnp.ones((2, 16), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), input_ids=ids,
                        attention_mask=mask)
    outs = []
    for seed in (1, 1, 2):
        out = model.apply(params, input_ids=ids, attention_mask=mask,
                          deterministic=False,
                          rngs={"dropout": jax.random.PRNGKey(seed)})
        outs.append(np.asarray(out, np.float32))
    assert np.isfinite(outs[0]).all()
    np.testing.assert_array_equal(outs[0], outs[1])  # same seed -> same mask
    assert not np.array_equal(outs[0], outs[2])      # seed changes mask


def test_odd_row_count_falls_back_to_xla_path():
    """R not divisible by 8 cannot satisfy Mosaic's row-block rule; the
    wrapper must route to the XLA path (interpret=False + CPU would crash
    in pallas_call if it did not fall back)."""
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((7, 128)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((7, 128)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(128), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(128), jnp.float32)
    got = fused_residual_layernorm(x, y, scale, bias, interpret=False)
    ref = residual_layernorm_reference(x, y, scale, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
    # dropout on the fallback: deterministic per key, correct keep scaling
    k = jax.random.PRNGKey(5)
    a = fused_residual_layernorm(x, y, scale, bias, interpret=False,
                                 dropout_p=0.5, dropout_rng=k)
    b = fused_residual_layernorm(x, y, scale, bias, interpret=False,
                                 dropout_p=0.5, dropout_rng=k)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    keep = jax.random.bernoulli(k, 0.5, y.shape)
    y_dropped = jnp.where(keep, y / 0.5, 0.0)
    ref_drop = residual_layernorm_reference(x, y_dropped, scale, bias)
    np.testing.assert_allclose(np.asarray(a), np.asarray(ref_drop),
                               rtol=1e-5, atol=1e-5)
