"""Loss reduction-semantics and LR-schedule parity tests (oracles follow the
reference's torch/HF formulas)."""

import jax.numpy as jnp
import numpy as np
import pytest

from textreact_tpu.config import ExperimentConfig
from textreact_tpu.train.losses import (masked_probs, mlm_loss,
                                        seq2seq_greedy_acc, seq2seq_loss,
                                        template_loss)
from textreact_tpu.train.optim import lr_schedule

PAD = 0


def _softmax_nll(logits, label):
    logits = np.asarray(logits, dtype=np.float64)
    logits = logits - logits.max()
    p = np.exp(logits) / np.exp(logits).sum()
    return -np.log(p[label])


def test_seq2seq_loss_mean_ignores_pad():
    rng = np.random.default_rng(0)
    B, L, V = 2, 5, 7
    logits = rng.normal(size=(B, L, V))
    dec = np.array([[3, 4, 5, PAD, PAD], [3, 6, PAD, PAD, PAD]])
    loss = float(seq2seq_loss(jnp.asarray(logits), jnp.asarray(dec), PAD))
    # oracle: mean over non-pad shifted targets
    terms = []
    for b in range(B):
        for t in range(L - 1):
            label = dec[b, t + 1]
            if label != PAD:
                terms.append(_softmax_nll(logits[b, t], label))
    np.testing.assert_allclose(loss, np.mean(terms), rtol=1e-5)


def test_seq2seq_loss_none_reduction_divides_by_full_length():
    rng = np.random.default_rng(1)
    B, L, V = 2, 5, 7
    logits = rng.normal(size=(B, L, V))
    dec = np.array([[3, 4, 5, PAD, PAD], [3, 6, 2, 1, PAD]])
    per = np.asarray(seq2seq_loss(jnp.asarray(logits), jnp.asarray(dec), PAD,
                                  reduction="none"))
    for b in range(B):
        terms = [(_softmax_nll(logits[b, t], dec[b, t + 1])
                  if dec[b, t + 1] != PAD else 0.0) for t in range(L - 1)]
        # reference divides by the FULL shifted length incl. ignored slots
        np.testing.assert_allclose(per[b], np.mean(terms), rtol=1e-5)


def test_greedy_acc_pad_positions_auto_pass():
    V = 6
    logits = np.full((2, 4, V), -10.0)
    dec = np.array([[3, 4, 5, PAD], [3, 4, 2, PAD]])
    # row 0: predictions match everywhere
    for t, tok in enumerate([4, 5, 1]):  # the value at pad position is free
        logits[0, t, tok] = 10.0
    # row 1: mismatch at position 1
    logits[1, 0, 4] = 10.0
    logits[1, 1, 5] = 10.0  # label is 2
    acc = np.asarray(seq2seq_greedy_acc(jnp.asarray(logits), jnp.asarray(dec), PAD))
    assert acc.tolist() == [1.0, 0.0]


def test_template_loss_mean_semantics():
    rng = np.random.default_rng(2)
    atom_logits = rng.normal(size=(2, 3, 4))
    bond_logits = rng.normal(size=(2, 2, 3))
    atom_labels = np.array([[0, 2, -100], [1, -100, -100]])
    bond_labels = np.array([[0, -100], [2, 1]])
    loss = float(template_loss(jnp.asarray(atom_logits), jnp.asarray(bond_logits),
                               jnp.asarray(atom_labels), jnp.asarray(bond_labels)))
    a_terms = [_softmax_nll(atom_logits[b, i], atom_labels[b, i])
               for b in range(2) for i in range(3) if atom_labels[b, i] != -100]
    b_terms = [_softmax_nll(bond_logits[b, i], bond_labels[b, i])
               for b in range(2) for i in range(2) if bond_labels[b, i] != -100]
    np.testing.assert_allclose(loss, np.mean(a_terms) + np.mean(b_terms), rtol=1e-5)


def test_masked_probs_zeroes_ignored():
    logits = np.zeros((1, 3, 4))
    labels = np.array([[0, -100, 2]])
    probs = np.asarray(masked_probs(jnp.asarray(logits), jnp.asarray(labels)))
    assert (probs[0, 1] == 0).all()
    np.testing.assert_allclose(probs[0, 0].sum(), 1.0, rtol=1e-6)


def test_cosine_schedule_matches_hf_formula():
    cfg = ExperimentConfig(lr=1e-3, scheduler="cosine", warmup_ratio=0.1)
    total = 100
    sched = lr_schedule(cfg, total)
    warmup = 10
    # linear warmup
    np.testing.assert_allclose(float(sched(0)), 0.0, atol=1e-9)
    np.testing.assert_allclose(float(sched(5)), 1e-3 * 5 / warmup, rtol=1e-6)
    # cosine decay: lr * 0.5 * (1 + cos(pi * progress))
    for step in (10, 50, 99, 100):
        progress = (step - warmup) / (total - warmup)
        expected = 1e-3 * 0.5 * (1 + np.cos(np.pi * min(progress, 1.0)))
        np.testing.assert_allclose(float(sched(step)), expected,
                                   rtol=1e-4, atol=1e-10)  # f32 cos


def test_constant_schedule_with_warmup():
    cfg = ExperimentConfig(lr=2e-4, scheduler="constant", warmup_ratio=0.05)
    sched = lr_schedule(cfg, 200)
    np.testing.assert_allclose(float(sched(200)), 2e-4, rtol=1e-6)
    assert float(sched(2)) < 2e-4
