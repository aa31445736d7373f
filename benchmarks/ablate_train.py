"""Ablation timing of the flagship train step on one TPU chip."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), '..'))
import time

import jax
import jax.numpy as jnp
import numpy as np

from textreact_tpu.config import ExperimentConfig
from textreact_tpu.models import BERT_L6_DECODER, SCIBERT_BASE, EncoderDecoder
from textreact_tpu.train.optim import make_optimizer
from textreact_tpu.train.step import TrainState, make_loss_fn, make_train_step

B, L, Ld = 32, 512, 16


def make(attn="flash", mlm=True, dropout=True, ln="xla"):
    enc = SCIBERT_BASE.replace(attention_impl=attn, layernorm_impl=ln)
    dec = BERT_L6_DECODER.replace(vocab_size=315, attention_impl=attn,
                                  layernorm_impl=ln)
    if not dropout:
        enc = enc.replace(hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
        dec = dec.replace(hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    module = EncoderDecoder(encoder_config=enc, decoder_config=dec,
                            dtype=jnp.bfloat16, mlm_layer="mlp" if mlm else None)
    cfg = ExperimentConfig(task="condition", mlm=mlm, mlm_lambda=0.1,
                           compute_dtype="bfloat16")
    return module, cfg


def batch_for(mlm=True):
    rng = np.random.default_rng(0)
    b = {
        "input_ids": jnp.asarray(rng.integers(1, 31000, (B, L)), jnp.int32),
        "attention_mask": jnp.ones((B, L), jnp.int32),
        "position_ids": jnp.tile(jnp.arange(L)[None], (B, 1)),
        "decoder_input_ids": jnp.asarray(rng.integers(1, 315, (B, Ld)), jnp.int32),
        "decoder_attention_mask": jnp.ones((B, Ld), jnp.int32),
        "example_mask": jnp.ones((B,), jnp.int32),
        "indices": jnp.arange(B, dtype=jnp.int32),
    }
    if mlm:
        b["mlm_labels"] = jnp.asarray(rng.integers(1, 31000, (B, 64)), jnp.int32)
    return b


def timeit(fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree.leaves(out)[0])  # hard sync
    t0 = time.perf_counter()
    o = None
    for _ in range(reps):
        o = fn(*args)
    np.asarray(jax.tree.leaves(o)[0])
    return (time.perf_counter() - t0) / reps


def full_step(module, cfg, batch):
    params = module.init(jax.random.PRNGKey(0),
                         input_ids=batch["input_ids"],
                         attention_mask=batch["attention_mask"],
                         decoder_input_ids=batch["decoder_input_ids"],
                         decoder_attention_mask=batch["decoder_attention_mask"],
                         **({"mlm_prefix_len": 64} if cfg.mlm else {}))
    tx = make_optimizer(cfg, 1000)
    state = TrainState.create(params, tx)
    step = make_train_step(module, cfg, tx, dec_pad_id=0)
    key = jax.random.PRNGKey(1)

    def run(state):
        s, m = step(state, batch, key)
        return m["train_loss"]
    # can't donate repeatedly with same state; wrap without donation:
    loss_fn = make_loss_fn(module, cfg, dec_pad_id=0)

    @jax.jit
    def fwdbwd(params):
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, key)
        return loss, jax.tree.map(lambda g: g.sum(), grads)["params"]["decoder"]["word_embedding"]

    @jax.jit
    def fwd(params):
        loss, _ = loss_fn(params, batch, key)
        return loss

    t_fwd = timeit(fwd, params)
    t_fwdbwd = timeit(fwdbwd, params)

    # full step timing with donation: re-create state each call is wrong;
    # chain the state through reps manually
    s, m = step(state, batch, key)
    float(np.asarray(m["train_loss"]))
    t0 = time.perf_counter()
    for _ in range(10):
        s, m = step(s, batch, key)
    float(np.asarray(m["train_loss"]))
    t_full = (time.perf_counter() - t0) / 10
    return t_fwd, t_fwdbwd, t_full


if __name__ == "__main__":
    import sys
    sel = sys.argv[1] if len(sys.argv) > 1 else "all"
    for name, kw in [("flash+mlm+drop", dict()),
                     ("flash+mlm+drop+fusedLN", dict(ln="fused")),
                     ("flash+mlm+NOdrop", dict(dropout=False)),
                     ("flash+NOmlm+drop", dict(mlm=False)),
                     ("xla+mlm+drop", dict(attn="xla"))]:
        if sel != "all" and sel != name:
            continue
        module, cfg = make(**kw)
        b = batch_for(mlm=cfg.mlm)
        t_fwd, t_fwdbwd, t_full = full_step(module, cfg, b)
        print(f"{name:22s} fwd {t_fwd*1e3:7.1f} ms  fwd+bwd {t_fwdbwd*1e3:7.1f} ms  "
              f"full {t_full*1e3:7.1f} ms  ({B/t_full:.0f} ex/s)", flush=True)
