"""jit-compiled train/eval steps over the device mesh.

Replaces the reference's Lightning training_step/validation_step
(main.py:164-196). The step is a pure function jitted once per
(batch-shape-bucket); the batch is sharded over the 'dp' mesh axis and
params follow the tensor-parallel PartitionSpecs — XLA SPMD inserts the
gradient all-reduce that DDP/NCCL performed in the reference
(main.py:372-374).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from . import losses

Array = jax.Array


class TrainState(struct.PyTreeNode):
    step: Array
    params: Any
    opt_state: Any

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation) -> "TrainState":
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params))


def _model_inputs(batch: Dict[str, Array], template_based: bool,
                  mlm_prefix_len: Optional[int],
                  mlm_fused: bool = False) -> Dict[str, Any]:
    kw: Dict[str, Any] = dict(
        input_ids=batch["input_ids"],
        attention_mask=batch["attention_mask"],
    )
    if "position_ids" in batch:
        kw["position_ids"] = batch["position_ids"]
    if template_based:
        kw["atom_indices"] = batch["atom_indices"]
        kw["bond_pairs"] = batch["bond_pairs"]
    else:
        kw["decoder_input_ids"] = batch["decoder_input_ids"]
        kw["decoder_attention_mask"] = batch.get("decoder_attention_mask")
    if mlm_prefix_len is not None:
        kw["mlm_prefix_len"] = mlm_prefix_len
        if mlm_fused:   # fold projection+CE into the forward (ops/fused_ce)
            kw["mlm_labels"] = batch["mlm_labels"]
    return kw


def make_loss_fn(module, cfg, dec_pad_id: int) -> Callable:
    """Builds loss_fn(params, batch, dropout_rng) -> (loss, metrics)."""
    template_based = cfg.template_based

    mlm_fused = getattr(cfg, "mlm_impl", "fused") == "fused"

    def loss_fn(params, batch, dropout_rng):
        mlm_prefix = batch["mlm_labels"].shape[1] if cfg.mlm and "mlm_labels" in batch else None
        out = module.apply(params,
                           **_model_inputs(batch, template_based, mlm_prefix,
                                           mlm_fused),
                           deterministic=False, rngs={"dropout": dropout_rng})
        if template_based:
            atom_logits, bond_logits = out["logits"]
            loss = losses.template_loss(atom_logits, bond_logits,
                                        batch["atom_template_labels"],
                                        batch["bond_template_labels"])
        else:
            loss = losses.seq2seq_loss(out["logits"], batch["decoder_input_ids"],
                                       dec_pad_id, cfg.label_smoothing)
        metrics = {"train_loss": loss}
        if mlm_prefix is not None:
            if "mlm_loss_sum" in out:
                mloss = out["mlm_loss_sum"] / jnp.maximum(out["mlm_valid"], 1)
            else:
                mloss = losses.mlm_loss(out["mlm_logits"], batch["mlm_labels"])
            loss = loss + cfg.mlm_lambda * mloss
            metrics["mlm_loss"] = mloss
            metrics["total_loss"] = loss
        return loss, metrics

    return loss_fn


def _jit_kwargs(state_shardings):
    """donate the state; when canonical state shardings are known, pin the
    output state to them — otherwise GSPMD picks fresh output shardings on
    the first step (a second steady-state compile of the biggest graph, and
    a silent undo of the ZeRO-1 optimizer layout)."""
    kw: Dict[str, Any] = dict(donate_argnums=(0,))
    if state_shardings is not None:
        kw["out_shardings"] = (state_shardings, None)
    return kw


def make_train_step(module, cfg, tx: optax.GradientTransformation,
                    dec_pad_id: int, state_shardings=None) -> Callable:
    loss_fn = make_loss_fn(module, cfg, dec_pad_id)

    @partial(jax.jit, **_jit_kwargs(state_shardings))
    def train_step(state: TrainState, batch: Dict[str, Array], rng: Array
                   ) -> Tuple[TrainState, Dict[str, Array]]:
        dropout_rng = jax.random.fold_in(rng, state.step)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, metrics), grads = grad_fn(state.params, batch, dropout_rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state)
        return new_state, metrics

    return train_step


def make_accum_train_step(module, cfg, tx, dec_pad_id: int,
                          state_shardings=None) -> Callable:
    """Gradient accumulation over the leading microbatch axis via lax.scan
    (reference accumulate_grad_batches, main.py:381).

    `mb_weights` (n,) marks real microbatches with 1.0; the trainer pads a
    trailing partial accumulation window with weight-0 copies so the scanned
    graph keeps a single leading extent per shape bucket (no recompile for
    the flush). Gradients/loss average over the weight sum."""
    loss_fn = make_loss_fn(module, cfg, dec_pad_id)

    @partial(jax.jit, **_jit_kwargs(state_shardings))
    def train_step(state: TrainState, microbatches: Dict[str, Array],
                   mb_weights: Array, rng: Array):
        def body(carry, xs):
            mb, w = xs
            grads_acc, loss_acc, i = carry
            dropout_rng = jax.random.fold_in(rng, state.step * 1009 + i)
            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, mb, dropout_rng)
            grads_acc = jax.tree.map(lambda a, g: a + w * g, grads_acc, grads)
            return (grads_acc, loss_acc + w * loss, i + 1), None

        zero_grads = jax.tree.map(jnp.zeros_like, state.params)
        (grads, loss_sum, _), _ = jax.lax.scan(
            body, (zero_grads, jnp.zeros(()), jnp.zeros((), jnp.int32)),
            (microbatches, mb_weights.astype(jnp.float32)))
        denom = jnp.maximum(mb_weights.astype(jnp.float32).sum(), 1.0)
        grads = jax.tree.map(lambda g: g / denom, grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state)
        return new_state, {"train_loss": loss_sum / denom,
                           "grad_norm": optax.global_norm(grads)}

    return train_step


def make_eval_step(module, cfg, dec_pad_id: int, edit_topk: int = 500
                   ) -> Callable:
    """Per-example val scores (reference validation_step, main.py:177-188):
    val_acc = greedy exact match, val_loss = per-example mean CE.

    Template-based models return the top-`edit_topk` edit candidates ranked
    ON DEVICE (lax.top_k over the flattened atom/bond probabilities, SURVEY
    §7 item 7) instead of the full (B, A, n_a+1)/(B, MB, n_b+1) probability
    tensors — the host only merges two k-length lists per example, replacing
    the reference's host argsort over the full grids (utils.py:79-108)."""
    template_based = cfg.template_based

    @jax.jit
    def eval_step(params, batch: Dict[str, Array]) -> Dict[str, Array]:
        out = module.apply(params, **_model_inputs(batch, template_based, None),
                           deterministic=True)
        res: Dict[str, Array] = {"example_mask": batch["example_mask"],
                                 "indices": batch["indices"]}
        if template_based:
            from ..evaluation.edit_rank import device_topk_edits
            atom_logits, bond_logits = out["logits"]
            res["loss"] = losses.template_loss(
                atom_logits, bond_logits, batch["atom_template_labels"],
                batch["bond_template_labels"], reduction="none")
            atom_probs = losses.masked_probs(
                atom_logits, batch["atom_template_labels"])
            bond_probs = losses.masked_probs(
                bond_logits, batch["bond_template_labels"])
            (res["atom_topk_vals"], res["atom_topk_idx"],
             res["bond_topk_vals"], res["bond_topk_idx"]) = device_topk_edits(
                atom_probs, bond_probs,
                batch["bond_template_labels"] != losses.IGNORE_INDEX,
                edit_topk)
        else:
            res["loss"] = losses.seq2seq_loss(
                out["logits"], batch["decoder_input_ids"], dec_pad_id,
                reduction="none")
            res["acc"] = losses.seq2seq_greedy_acc(
                out["logits"], batch["decoder_input_ids"], dec_pad_id)
        return res

    return eval_step
