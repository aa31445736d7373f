"""Optimizer + LR schedule.

Parity: reference main.py:270-276 — torch AdamW (weight decay on every
parameter, torch default) with HF get_scheduler 'cosine'/'constant' warmup
schedules, stepped per optimizer step, plus global-norm gradient clipping
(Trainer gradient_clip_val, main.py:380).
"""

from __future__ import annotations

import optax

from ..config import ExperimentConfig


def lr_schedule(cfg: ExperimentConfig, num_training_steps: int) -> optax.Schedule:
    warmup = int(num_training_steps * cfg.warmup_ratio)
    if cfg.scheduler == "constant":
        if warmup == 0:
            return optax.constant_schedule(cfg.lr)
        return optax.join_schedules(
            [optax.linear_schedule(0.0, cfg.lr, warmup),
             optax.constant_schedule(cfg.lr)], [warmup])

    # HF 'cosine': linear warmup then cosine decay to 0 over the remainder
    def schedule(step):
        step_f = step
        if warmup > 0:
            warm = cfg.lr * step_f / max(1, warmup)
        else:
            warm = cfg.lr
        progress = (step_f - warmup) / max(1, num_training_steps - warmup)
        import jax.numpy as jnp
        progress = jnp.clip(progress, 0.0, 1.0)
        cos = cfg.lr * 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
        return jnp.where(step_f < warmup, warm, cos)

    return schedule


def make_optimizer(cfg: ExperimentConfig, num_training_steps: int) -> optax.GradientTransformation:
    sched = lr_schedule(cfg, num_training_steps)
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(learning_rate=sched, b1=0.9, b2=0.999, eps=1e-8,
                    weight_decay=cfg.weight_decay),
    )
