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
    ap.add_argument("--soak", type=float, default=0.0, metavar="MINUTES",
                    help="sustained-run mode: train for MINUTES wall-clock at "
                         "flagship geometry with eval + async-checkpoint "
                         "cadence; reports step-time drift, recompile count "
                         "and HBM watermark (VERDICT r4 item 5)")
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

    if args.soak:
        return soak(args, train_step, state, batch, key, n_params, B)

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


def soak(args, train_step, state, batch, key, n_params, B):
    """Sustained flagship training: windows of WINDOW steps with one host
    readback each, an eval forward every ~2 min and an async checkpoint
    save every ~5 min (the reference's implicit stability evidence is its
    20-epoch Lightning runs, scripts/train_RCR.sh:34 + main.py:397).
    Reports per-window ex/s, step-time drift (last vs first steady window),
    jit cache sizes (steady-state recompiles must be zero) and the HBM
    watermark when the runtime exposes memory_stats."""
    import tempfile

    import jax

    from textreact_tpu.train.checkpoint import CheckpointManager

    WINDOW = 50
    eval_fn = jax.jit(lambda s, b: (s.params["params"]["encoder"]
                                    ["embeddings"]["word"]["embedding"]
                                    .astype(jnp.float32).sum()))
    ckpt_dir = tempfile.mkdtemp(prefix="soak_ckpt_")
    mgr = CheckpointManager(ckpt_dir, "val_acc")

    state, metrics = train_step(state, batch, key)   # compile
    float(np.asarray(metrics["train_loss"]))
    t_start = time.perf_counter()
    windows = []          # (t_per_step, loss)
    next_eval, next_ckpt = 120.0, 300.0
    evals = ckpts = 0
    while time.perf_counter() - t_start < args.soak * 60:
        t0 = time.perf_counter()
        for _ in range(WINDOW):
            state, metrics = train_step(state, batch, key)
        loss = float(np.asarray(metrics["train_loss"]))
        dt = (time.perf_counter() - t0) / WINDOW
        windows.append((dt, loss))
        elapsed = time.perf_counter() - t_start
        if elapsed >= next_eval:
            float(np.asarray(eval_fn(state, batch)))
            evals += 1
            next_eval += 120.0
        if elapsed >= next_ckpt:
            mgr.save("last", jax.device_get(state.params), {"step": len(windows)})
            ckpts += 1
            next_ckpt += 300.0
        print(f"  window {len(windows):3d}: {dt*1e3:6.2f} ms/step "
              f"({B/dt:6.1f} ex/s) loss {loss:.4f}", flush=True)
    mgr.finalize()

    steady = windows[1:]  # window 0 may include residual warmup
    first = min(w[0] for w in steady[:3])
    last = min(w[0] for w in steady[-3:])
    drift = (last - first) / first
    cache = getattr(train_step, "_cache_size", lambda: -1)()
    mem = {}
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        mem = {k: stats[k] for k in ("bytes_in_use", "peak_bytes_in_use")
               if k in stats}
    except Exception:
        pass
    ok = abs(drift) < 0.02 and cache in (-1, 1)
    print(json.dumps({
        "metric": "train_soak_flagship",
        "value": round(B / last, 1),
        "unit": (f"examples/s final (B={B}, {len(windows)} windows x "
                 f"{WINDOW} steps, {args.soak:.0f} min, evals={evals}, "
                 f"ckpts={ckpts}, drift={drift*100:.2f}%, "
                 f"jit_cache={cache}, hbm_peak="
                 f"{mem.get('peak_bytes_in_use', 'n/a')})"),
        "vs_baseline": None,
    }))
    if not ok:
        raise SystemExit(f"SOAK FAILED: drift={drift*100:.2f}% "
                         f"(|limit| 2%), jit cache entries={cache} (want 1)")


if __name__ == "__main__":
    main()
