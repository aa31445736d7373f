"""Training runtime: losses, optimizer, pjit steps, checkpointing, trainer."""

from .checkpoint import CheckpointManager
from .losses import (mlm_loss, seq2seq_greedy_acc, seq2seq_loss, template_loss)
from .optim import lr_schedule, make_optimizer
from .step import (TrainState, make_accum_train_step, make_eval_step,
                   make_loss_fn, make_train_step)
from .trainer import Trainer, run

__all__ = [
    "CheckpointManager", "mlm_loss", "seq2seq_greedy_acc", "seq2seq_loss",
    "template_loss", "lr_schedule", "make_optimizer", "TrainState",
    "make_accum_train_step", "make_eval_step", "make_loss_fn",
    "make_train_step", "Trainer", "run",
]
