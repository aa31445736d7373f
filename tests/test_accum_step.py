"""Gradient-accumulation step semantics: weight-0 padding equivalence and
shape-bucket safety (ADVICE r1: bucketed collation means consecutive
microbatches can have different shapes; the trainer groups them per shape
key and pads trailing flushes with weight-0 copies)."""

import jax
import jax.numpy as jnp
import numpy as np

from textreact_tpu.config import ExperimentConfig
from textreact_tpu.models import EncoderDecoder, TransformerConfig
from textreact_tpu.train.optim import make_optimizer
from textreact_tpu.train.step import (TrainState, make_accum_train_step,
                                      make_train_step)

ENC = TransformerConfig(vocab_size=32, hidden_size=16, num_hidden_layers=1,
                        num_attention_heads=2, intermediate_size=32,
                        max_position_embeddings=32, type_vocab_size=1,
                        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
DEC = ENC.replace(is_decoder=True, add_cross_attention=True)


def _mb(B=2, L=8, Ld=4, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "input_ids": jnp.asarray(rng.integers(1, 32, (B, L)), jnp.int32),
        "attention_mask": jnp.ones((B, L), jnp.int32),
        "decoder_input_ids": jnp.asarray(rng.integers(1, 32, (B, Ld)), jnp.int32),
        "decoder_attention_mask": jnp.ones((B, Ld), jnp.int32),
    }


def _setup():
    cfg = ExperimentConfig(task="condition", compute_dtype="float32",
                           lr=1e-2, scheduler="constant", warmup_ratio=0.0,
                           max_grad_norm=1e9)
    module = EncoderDecoder(encoder_config=ENC, decoder_config=DEC,
                            dtype=jnp.float32)
    params = module.init(jax.random.PRNGKey(3), **_mb())
    tx = make_optimizer(cfg, num_training_steps=10)
    return cfg, module, tx, params


def _stack(mbs):
    return {k: jnp.stack([m[k] for m in mbs]) for k in mbs[0]}


def _fresh_state(params, tx):
    # the jitted steps donate the state buffers; give each run its own copy
    return TrainState.create(jax.tree.map(jnp.array, params), tx)


def test_weight0_padding_matches_unpadded_average():
    """[mb1, mb2] @ weights [1,1] must produce the same update as
    [mb1, mb2, mb2] @ weights [1,1,0]."""
    cfg, module, tx, params = _setup()
    step = make_accum_train_step(module, cfg, tx, dec_pad_id=0)
    mb1, mb2 = _mb(seed=1), _mb(seed=2)
    rng = jax.random.PRNGKey(0)

    s_a = _fresh_state(params, tx)
    s_a, m_a = step(s_a, _stack([mb1, mb2]), jnp.asarray([1.0, 1.0]), rng)

    s_b = _fresh_state(params, tx)
    s_b, m_b = step(s_b, _stack([mb1, mb2, mb2]),
                    jnp.asarray([1.0, 1.0, 0.0]), rng)

    np.testing.assert_allclose(float(m_a["train_loss"]),
                               float(m_b["train_loss"]), rtol=1e-6)
    for pa, pb in zip(jax.tree.leaves(s_a.params), jax.tree.leaves(s_b.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=1e-5, atol=1e-7)


def test_accum_matches_single_large_step_without_dropout():
    """Accumulating 2 microbatches equals one step whose loss is the mean of
    the two microbatch losses (grads of mean of means), dropout off."""
    cfg, module, tx, params = _setup()
    astep = make_accum_train_step(module, cfg, tx, dec_pad_id=0)
    sstep = make_train_step(module, cfg, tx, dec_pad_id=0)
    mb = _mb(seed=5)
    rng = jax.random.PRNGKey(0)
    # identical microbatches: accumulated average == single-batch grads
    s_a = _fresh_state(params, tx)
    s_a, _ = astep(s_a, _stack([mb, mb]), jnp.asarray([1.0, 1.0]), rng)
    s_s = _fresh_state(params, tx)
    s_s, _ = sstep(s_s, mb, rng)
    for pa, ps in zip(jax.tree.leaves(s_a.params), jax.tree.leaves(s_s.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(ps),
                                   rtol=1e-4, atol=1e-6)


def test_accum_step_handles_multiple_shape_buckets():
    """Stacks from different length buckets are separate compilations of the
    same jitted step; both must run (the r1 code crashed stacking them)."""
    cfg, module, tx, params = _setup()
    step = make_accum_train_step(module, cfg, tx, dec_pad_id=0)
    rng = jax.random.PRNGKey(0)
    state = _fresh_state(params, tx)
    short = [_mb(L=8, Ld=4, seed=1), _mb(L=8, Ld=4, seed=2)]
    long = [_mb(L=16, Ld=8, seed=3), _mb(L=16, Ld=8, seed=4)]
    state, m1 = step(state, _stack(short), jnp.asarray([1.0, 1.0]), rng)
    state, m2 = step(state, _stack(long), jnp.asarray([1.0, 1.0]), rng)
    assert np.isfinite(float(m1["train_loss"]))
    assert np.isfinite(float(m2["train_loss"]))
    assert int(state.step) == 2
