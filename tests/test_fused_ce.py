"""Fused linear+CE (ops/fused_ce.py) vs the explicit logits path: values
and gradients must match the unfused reference (losses.mlm_loss over a
materialized projection) in f32, including ignored labels, ragged final
vocab chunks, and both W layouts (nn.Dense kernel / tied embedding)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from textreact_tpu.data.collate import IGNORE_INDEX
from textreact_tpu.ops.fused_ce import fused_linear_ce
from textreact_tpu.train import losses


def _case(n=48, d=16, v=1000, seed=0, all_ignored=False):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(d, v)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.normal(size=(v,)) * 0.1, jnp.float32)
    labels = rng.integers(0, v, size=(n,))
    if all_ignored:
        labels[:] = IGNORE_INDEX
    else:
        labels[:: 5] = IGNORE_INDEX   # holes like padded MLM positions
    return x, w, b, jnp.asarray(labels, jnp.int32)


def _ref(x, w, b, labels):
    logits = x @ w + b
    elems, valid = losses.cross_entropy_elements(logits[None], labels[None],
                                                 IGNORE_INDEX)
    return elems.sum(), valid.sum()


@pytest.mark.parametrize("chunk", [256, 1000, 4096])
def test_fused_matches_reference_values(chunk):
    x, w, b, labels = _case()
    s, nv = fused_linear_ce(x, w, b, labels, IGNORE_INDEX, 1, chunk)
    s_ref, nv_ref = _ref(x, w, b, labels)
    assert int(nv) == int(nv_ref)
    np.testing.assert_allclose(float(s), float(s_ref), rtol=1e-5)


def test_fused_tied_embedding_layout():
    x, w, b, labels = _case(seed=1)
    s0, _ = fused_linear_ce(x, w, b, labels, IGNORE_INDEX, 1, 256)
    s1, _ = fused_linear_ce(x, w.T, b, labels, IGNORE_INDEX, 0, 256)
    np.testing.assert_allclose(float(s0), float(s1), rtol=1e-6)


def test_fused_all_ignored_is_zero():
    x, w, b, labels = _case(all_ignored=True)
    s, nv = fused_linear_ce(x, w, b, labels, IGNORE_INDEX, 1, 256)
    assert float(s) == 0.0 and int(nv) == 0
    # gradients through the all-ignored case are zero, not NaN
    g = jax.grad(lambda x_: fused_linear_ce(
        x_, w, b, labels, IGNORE_INDEX, 1, 256)[0])(x)
    np.testing.assert_array_equal(np.asarray(g), 0.0)


@pytest.mark.parametrize("vocab_axis", [0, 1])
def test_fused_gradients_match_reference(vocab_axis):
    x, w, b, labels = _case(seed=2)
    wv = w if vocab_axis == 1 else w.T

    def fused(x_, w_, b_):
        s, nv = fused_linear_ce(x_, w_, b_, labels, IGNORE_INDEX,
                                vocab_axis, 256)
        return s / jnp.maximum(nv, 1)

    def ref(x_, w_, b_):
        wk = w_ if vocab_axis == 1 else w_.T
        s, nv = _ref(x_, wk, b_, labels)
        return s / jnp.maximum(nv, 1)

    gx, gw, gb = jax.grad(fused, argnums=(0, 1, 2))(x, wv, b)
    rx, rw, rb = jax.grad(ref, argnums=(0, 1, 2))(x, wv, b)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb),
                               rtol=2e-5, atol=1e-6)


def test_train_step_fused_equals_xla_impl():
    """Full loss_fn parity: mlm_impl='fused' vs 'xla' on the same params and
    batch (f32 compute) — same total loss and same gradients."""
    from textreact_tpu.config import ExperimentConfig
    from textreact_tpu.models import (BERT_L6_DECODER, SCIBERT_BASE,
                                      EncoderDecoder)
    from textreact_tpu.train.step import make_loss_fn

    enc = SCIBERT_BASE.replace(vocab_size=97, hidden_size=32,
                               num_hidden_layers=2, num_attention_heads=4,
                               intermediate_size=64,
                               max_position_embeddings=64,
                               hidden_dropout_prob=0.0,
                               attention_probs_dropout_prob=0.0)
    dec = BERT_L6_DECODER.replace(vocab_size=50, hidden_size=32,
                                  num_hidden_layers=2, num_attention_heads=4,
                                  intermediate_size=64,
                                  max_position_embeddings=16,
                                  hidden_dropout_prob=0.0,
                                  attention_probs_dropout_prob=0.0)
    module = EncoderDecoder(encoder_config=enc, decoder_config=dec,
                            dtype=jnp.float32, mlm_layer="mlp")
    rng = np.random.default_rng(3)
    B, L, Ld, P = 4, 24, 8, 6
    batch = {
        "input_ids": jnp.asarray(rng.integers(1, 97, (B, L)), jnp.int32),
        "attention_mask": jnp.ones((B, L), jnp.int32),
        "decoder_input_ids": jnp.asarray(rng.integers(1, 50, (B, Ld)), jnp.int32),
        "decoder_attention_mask": jnp.ones((B, Ld), jnp.int32),
        "mlm_labels": jnp.asarray(
            np.where(rng.random((B, P)) < 0.7,
                     rng.integers(0, 97, (B, P)), IGNORE_INDEX), jnp.int32),
    }
    params = module.init(jax.random.PRNGKey(0),
                         input_ids=batch["input_ids"],
                         attention_mask=batch["attention_mask"],
                         decoder_input_ids=batch["decoder_input_ids"],
                         decoder_attention_mask=batch["decoder_attention_mask"],
                         mlm_prefix_len=P)

    outs = {}
    for impl in ("fused", "xla"):
        cfg = ExperimentConfig(task="condition", compute_dtype="float32",
                               mlm=True, mlm_layer="mlp", mlm_lambda=0.3,
                               mlm_impl=impl)
        loss_fn = make_loss_fn(module, cfg, dec_pad_id=0)
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, jax.random.PRNGKey(1))
        outs[impl] = (float(loss), float(metrics["mlm_loss"]), grads)

    assert np.isclose(outs["fused"][0], outs["xla"][0], rtol=1e-5)
    assert np.isclose(outs["fused"][1], outs["xla"][1], rtol=1e-5)
    for gf, gx in zip(jax.tree.leaves(outs["fused"][2]),
                      jax.tree.leaves(outs["xla"][2])):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                                   rtol=2e-4, atol=1e-6)
