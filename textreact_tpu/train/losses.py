"""Loss and accuracy computation.

Parity: reference main.py:112-162 (compute_loss / compute_acc /
compute_mlm_loss), including the exact reduction semantics:

- 'mean' = mean over non-ignored target tokens across the whole batch
  (torch F.cross_entropy with ignore_index);
- 'none' = per-example mean over ALL positions, where ignored positions
  contribute 0 (torch reduction='none' zeroes ignored elements, then the
  reference takes .mean(dim=1) over the full length, main.py:124-133).

Batch-padding rows (example_mask == 0) carry all-ignored labels, so they
contribute nothing to sums; per-example outputs are masked by the caller.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..data.collate import IGNORE_INDEX

Array = jax.Array


def cross_entropy_elements(logits: Array, labels: Array, ignore_id: int,
                           label_smoothing: float = 0.0) -> Tuple[Array, Array]:
    """Per-element CE with 0 at ignored positions. Returns (loss, valid)."""
    valid = (labels != ignore_id)
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    if label_smoothing > 0.0:
        smooth = -logp.mean(axis=-1)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    return jnp.where(valid, nll, 0.0), valid


def masked_mean(loss_elems: Array, valid: Array) -> Array:
    denom = jnp.maximum(valid.sum(), 1)
    return loss_elems.sum() / denom


def seq2seq_loss(logits: Array, decoder_input_ids: Array, pad_id: int,
                 label_smoothing: float = 0.0, reduction: str = "mean") -> Array:
    """CE over shifted decoder tokens, pad ignored (main.py:128-133)."""
    labels = decoder_input_ids[:, 1:]
    elems, valid = cross_entropy_elements(logits[:, :-1], labels, pad_id,
                                          label_smoothing)
    if reduction == "mean":
        return masked_mean(elems, valid)
    return elems.mean(axis=1)  # per-example mean over all positions


def seq2seq_greedy_acc(logits: Array, decoder_input_ids: Array, pad_id: int) -> Array:
    """Per-example greedy exact-match accuracy (main.py:150-153): argmax
    matches label at every position, pad positions auto-pass."""
    preds = jnp.argmax(logits[:, :-1], axis=-1)
    labels = decoder_input_ids[:, 1:]
    ok = jnp.logical_or(preds == labels, labels == pad_id)
    return ok.all(axis=-1).astype(jnp.float32)


def template_loss(atom_logits: Array, bond_logits: Array,
                  atom_labels: Array, bond_labels: Array,
                  reduction: str = "mean") -> Array:
    """Atom + bond template CE (main.py:114-126). Labels are IGNORE_INDEX at
    non-atoms / non-bonds / padding."""
    a_elems, a_valid = cross_entropy_elements(atom_logits, atom_labels, IGNORE_INDEX)
    b_elems, b_valid = cross_entropy_elements(bond_logits, bond_labels, IGNORE_INDEX)
    if reduction == "mean":
        return masked_mean(a_elems, a_valid) + masked_mean(b_elems, b_valid)
    return a_elems.mean(axis=1) + b_elems.mean(axis=1)


def mlm_loss(mlm_logits: Array, mlm_labels: Array) -> Array:
    """CE over the masked prefix (main.py:158-162; torch CE default mean
    over non-ignored)."""
    elems, valid = cross_entropy_elements(mlm_logits, mlm_labels, IGNORE_INDEX)
    return masked_mean(elems, valid)


def masked_probs(logits: Array, labels: Array) -> Array:
    """softmax probs with ignored positions zeroed (main.py:140-143,
    202-206) — used by template-based eval edit ranking."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.where((labels != IGNORE_INDEX)[..., None], probs, 0.0)
