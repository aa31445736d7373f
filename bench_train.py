"""Secondary benchmark: flagship-model training throughput on one chip.

RCR geometry (SciBERT-base encoder + bert_l6 decoder, enc len 512) with the
real jit train step (AdamW, bf16 compute). Prints one JSON line with
examples/s; the reference trains the same geometry with global batch 128 on
4 GPUs (scripts/train_RCR.sh), so examples/s-per-device is the comparable
number.
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layernorm_impl", default="fused",
                    choices=["xla", "fused"],
                    help="A/B the fused residual+dropout+LN kernel")
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--mlm_impl", default="fused", choices=["fused", "xla"],
                    help="A/B the fused MLM linear+CE fold")
    args = ap.parse_args()
    from textreact_tpu.config import ExperimentConfig
    from textreact_tpu.models import BERT_L6_DECODER, SCIBERT_BASE, EncoderDecoder
    from textreact_tpu.train.optim import make_optimizer
    from textreact_tpu.train.step import TrainState, make_train_step

    B, L, Ld = args.batch_size, 512, 16
    module = EncoderDecoder(
        encoder_config=SCIBERT_BASE.replace(
            attention_impl="flash", layernorm_impl=args.layernorm_impl),
        decoder_config=BERT_L6_DECODER.replace(
            vocab_size=315, attention_impl="flash",
            layernorm_impl=args.layernorm_impl),
        dtype=jnp.bfloat16, mlm_layer="mlp")
    cfg = ExperimentConfig(task="condition", mlm=True, mlm_lambda=0.1,
                           compute_dtype="bfloat16", mlm_impl=args.mlm_impl)
    rng = np.random.default_rng(0)
    batch = {
        "input_ids": jnp.asarray(rng.integers(1, 31000, (B, L)), jnp.int32),
        "attention_mask": jnp.ones((B, L), jnp.int32),
        "position_ids": jnp.tile(jnp.arange(L)[None], (B, 1)),
        "decoder_input_ids": jnp.asarray(rng.integers(1, 315, (B, Ld)), jnp.int32),
        "decoder_attention_mask": jnp.ones((B, Ld), jnp.int32),
        "mlm_labels": jnp.asarray(rng.integers(1, 31000, (B, 64)), jnp.int32),
        "example_mask": jnp.ones((B,), jnp.int32),
        "indices": jnp.arange(B, dtype=jnp.int32),
    }
    params = module.init(jax.random.PRNGKey(0), input_ids=batch["input_ids"],
                         attention_mask=batch["attention_mask"],
                         decoder_input_ids=batch["decoder_input_ids"],
                         decoder_attention_mask=batch["decoder_attention_mask"],
                         mlm_prefix_len=64)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    tx = make_optimizer(cfg, num_training_steps=1000)
    state = TrainState.create(params, tx)
    train_step = make_train_step(module, cfg, tx, dec_pad_id=0)
    key = jax.random.key(1, impl=cfg.dropout_rng_impl)

    state, metrics = train_step(state, batch, key)   # compile
    float(np.asarray(metrics["train_loss"]))          # hard sync (host readback)
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        state, metrics = train_step(state, batch, key)
    # chain-dependent host readback: forces completion of all queued steps
    float(np.asarray(metrics["train_loss"]))
    dt = (time.perf_counter() - t0) / reps
    print(json.dumps({
        "metric": "train_examples_per_sec_rcr_flagship",
        "value": round(B / dt, 1),
        "unit": f"examples/s (B={B}, L={L}, params={n_params/1e6:.1f}M, bf16+flash, ln={args.layernorm_impl}, mlm={args.mlm_impl}, 1 chip)",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
