"""Per-component anatomy of the flagship RCR train step on one chip.

Applies the decode-anatomy method (NOTES.md round-3) to the train step:
each component is timed in isolation with queued reps and a single
chain-final host readback (the ~30-60 ms fixed relay cost amortizes over
reps; per-piece costs here are 1-100 ms so fori_loop isolation is not
needed). Produces the round-4 component table VERDICT r3 item 1 asks for.

Components:
  enc_fwd / enc_fwdbwd     12-layer SciBERT-base encoder, L=512
  dec_fwd / dec_fwdbwd     6-layer decoder (Ld=16) incl. cross-attn K/V
  mlm_fwd / mlm_fwdbwd     MLM head over the 64-token masked prefix
                           (dense+gelu+LN + 768x31090 vocab projection)
  mlm_loss_bwd             CE through the (B,64,31090) f32 logits alone
  opt_update               AdamW update + apply on the full 192M tree
  grad_norm                optax.global_norm over the grad tree
  full_fwd / full_fwdbwd / full_step   whole loss / grad / train_step

Usage: python benchmarks/train_anatomy.py [B ...]   (default: 32 128)
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), '..'))
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

import ablate_train
from textreact_tpu.train import losses
from textreact_tpu.train.optim import make_optimizer
from textreact_tpu.train.step import TrainState, make_loss_fn, make_train_step


def timeit(fn, *args, reps=10):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])  # hard sync (relay rule)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        o = None
        for _ in range(reps):
            o = fn(*args)
        np.asarray(jax.tree.leaves(o)[0])
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def run(B, ln="fused"):
    ablate_train.B = B
    module, cfg = ablate_train.make(ln=ln)
    batch = ablate_train.batch_for()
    key = jax.random.key(1, impl=cfg.dropout_rng_impl)

    params = module.init(jax.random.PRNGKey(0),
                         input_ids=batch["input_ids"],
                         attention_mask=batch["attention_mask"],
                         decoder_input_ids=batch["decoder_input_ids"],
                         decoder_attention_mask=batch["decoder_attention_mask"],
                         mlm_prefix_len=64)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    rows = []

    def row(name, t_ms):
        rows.append((name, t_ms))
        print(f"  {name:16s} {t_ms:7.2f} ms", flush=True)

    # --- encoder alone ---
    def _enc_fwd(params):
        enc = module.apply(params, batch["input_ids"], batch["attention_mask"],
                           position_ids=batch["position_ids"],
                           deterministic=False, rngs={"dropout": key},
                           method="encode")
        return enc.astype(jnp.float32).sum()

    enc_fwd = jax.jit(_enc_fwd)
    # scalar output: a queued-reps window of full grad-tree outputs (0.77 GB
    # each) OOMs at B=128; global_norm adds ~the grad_norm row's cost
    enc_fwdbwd = jax.jit(lambda p: optax.global_norm(jax.grad(_enc_fwd)(p)))

    row("enc_fwd", timeit(enc_fwd, params) * 1e3)
    row("enc_fwdbwd", timeit(enc_fwdbwd, params) * 1e3)

    # --- decoder alone (fixed encoder states) ---
    enc_states = jax.jit(lambda p: module.apply(
        p, batch["input_ids"], batch["attention_mask"],
        position_ids=batch["position_ids"], deterministic=True,
        method="encode"))(params)
    enc_states = jax.block_until_ready(enc_states)

    def _dec_fwd(params, enc_states):
        lg = module.apply(params, batch["decoder_input_ids"], enc_states,
                          encoder_attention_mask=batch["attention_mask"],
                          deterministic=False, rngs={"dropout": key},
                          method="decode_logits")
        return losses.seq2seq_loss(lg, batch["decoder_input_ids"], 0)

    dec_fwd = jax.jit(_dec_fwd)
    dec_fwdbwd = jax.jit(lambda p, e: optax.global_norm(jax.grad(_dec_fwd)(p, e)))

    row("dec_fwd", timeit(dec_fwd, params, enc_states) * 1e3)
    row("dec_fwdbwd", timeit(dec_fwdbwd, params, enc_states) * 1e3)

    # --- MLM head alone (fixed prefix states) ---
    prefix = jax.block_until_ready(enc_states[:, :64])
    mlm_params = {"params": {"mlm_head": params["params"]["mlm_head"]}}
    from textreact_tpu.models.layers import MLMHead
    head = MLMHead(module.encoder_config, dtype=jnp.bfloat16, mlp=True)

    def _mlm_fwd(mp, prefix):
        lg = head.apply({"params": mp["params"]["mlm_head"]}, prefix)
        return losses.mlm_loss(lg, batch["mlm_labels"])

    mlm_fwd = jax.jit(_mlm_fwd)
    mlm_fwdbwd = jax.jit(lambda m, p: optax.global_norm(jax.grad(_mlm_fwd)(m, p)))

    row("mlm_fwd", timeit(mlm_fwd, mlm_params, prefix) * 1e3)
    row("mlm_fwdbwd", timeit(mlm_fwdbwd, mlm_params, prefix) * 1e3)

    # --- the CE itself through materialized f32 logits ---
    V = module.encoder_config.vocab_size
    logits0 = (jax.block_until_ready(jax.random.normal(
        jax.random.PRNGKey(3), (B, 64, V), jnp.float32)) if B <= 32 else None)

    if B <= 32:   # standalone-CE curiosity probe; pathological compile at
        ce_bwd = jax.jit(lambda x: jax.grad(
            lambda y: losses.mlm_loss(y, batch["mlm_labels"]))(x).sum())
        row("mlm_ce_bwd_alone", timeit(ce_bwd, logits0) * 1e3)

    # --- optimizer update + grad_norm on the real tree ---
    tx = make_optimizer(cfg, 1000)
    opt_state = jax.jit(tx.init)(params)
    grads = jax.tree.map(lambda x: (x * 1e-3).astype(x.dtype), params)
    grads = jax.block_until_ready(grads)

    @jax.jit
    def opt_update(grads, opt_state, params):
        updates, new_os = tx.update(grads, opt_state, params)
        new_p = optax.apply_updates(params, updates)
        return optax.global_norm(new_p), jax.tree.leaves(new_os)[0]

    @jax.jit
    def gnorm(grads):
        return optax.global_norm(grads)

    row("opt_update", timeit(opt_update, grads, opt_state, params) * 1e3)
    row("grad_norm", timeit(gnorm, grads) * 1e3)

    # free the probe-local device arrays (enc states, synthetic grads, a
    # full opt state ~3 GB) before the whole-step section — at B=128 the
    # fwd+bwd peak alone is most of HBM and their liveness OOMs it
    del enc_states, prefix, grads, opt_state, logits0

    # --- whole step ---
    loss_fn = make_loss_fn(module, cfg, dec_pad_id=0)

    @jax.jit
    def full_fwd(params):
        return loss_fn(params, batch, key)[0]

    @jax.jit
    def full_fwdbwd(params):
        (loss, _), g = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, key)
        return loss, optax.global_norm(g)

    row("full_fwd", timeit(full_fwd, params) * 1e3)
    row("full_fwdbwd", timeit(full_fwdbwd, params) * 1e3)

    tx2 = make_optimizer(cfg, 1000)
    state = TrainState.create(params, tx2)
    step = make_train_step(module, cfg, tx2, dec_pad_id=0)
    s, m = step(state, batch, key)
    float(np.asarray(m["train_loss"]))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            s, m = step(s, batch, key)
        float(np.asarray(m["train_loss"]))
        best = min(best, (time.perf_counter() - t0) / 10)
    row("full_step", best * 1e3)

    # --- FLOP model for MFU (matmul macs only, fwd x3 for bwd) ---
    d, f, L, Ld, nl_e, nl_d = 768, 3072, 512, 16, 12, 6
    enc_macs = nl_e * B * L * (4 * d * d + 2 * d * f + 2 * L * d)
    dec_macs = nl_d * (B * Ld * (4 * d * d + 2 * d * f + 2 * Ld * d + 2 * L * d)
                       + B * L * 2 * d * d)          # cross K/V over enc states
    dec_macs += B * Ld * d * 315                      # logits
    mlm_macs = B * 64 * (d * d + d * V)
    total_flops = 3 * 2 * (enc_macs + dec_macs + mlm_macs)
    peak = 197e12  # v5e bf16
    mfu = total_flops / (best * peak)
    print(f"  B={B}: {total_flops/1e12:.2f} TFLOP/step model; full_step "
          f"{best*1e3:.1f} ms -> {B/best:.1f} ex/s, MFU {mfu*100:.1f}% "
          f"(params {n_params/1e6:.1f}M)", flush=True)
    return rows


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [32, 128]
    for B in sizes:
        print(f"-- B={B}", flush=True)
        run(B)
