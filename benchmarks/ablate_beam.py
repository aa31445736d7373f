"""Ablation timing of retro-scale beam search on one TPU chip.

Worst case from NOTES.md: B=32, beams=20, dec_len=160, untrained params
(no early EOS) -> 8.2 s/batch in round 1 (~51 ms per decode step).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), '..'))
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from textreact_tpu.models import BERT_L6_DECODER, SCIBERT_BASE, EncoderDecoder
from textreact_tpu.inference.predictor import Generator

B, L, K, T = 32, 512, 20, 160


def build(dec_vocab=590):
    enc = SCIBERT_BASE
    dec = BERT_L6_DECODER.replace(vocab_size=dec_vocab,
                                  max_position_embeddings=max(T, 160))
    module = EncoderDecoder(encoder_config=enc, decoder_config=dec,
                            dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    batch = {
        "input_ids": jnp.asarray(rng.integers(1, enc.vocab_size, (B, L)), jnp.int32),
        "attention_mask": jnp.ones((B, L), jnp.int32),
        "decoder_input_ids": jnp.asarray(rng.integers(1, dec_vocab, (B, 8)), jnp.int32),
        "decoder_attention_mask": jnp.ones((B, 8), jnp.int32),
    }
    params = module.init(jax.random.PRNGKey(3), **batch)
    return module, params, batch


def timeit(gen, batch, reps=3):
    rng = np.random.default_rng(1)
    # warm up / compile
    seqs, scores = gen.generate(batch)
    times = []
    for r in range(reps):
        # vary inputs: the relay caches identical executions
        b = dict(batch)
        b["input_ids"] = jnp.asarray(
            rng.integers(1, SCIBERT_BASE.vocab_size, (B, L)), jnp.int32)
        t0 = time.perf_counter()
        seqs, scores = gen.generate(b)  # generate() already np.asarray()s
        times.append(time.perf_counter() - t0)
    spread = (max(times) - min(times)) / min(times) * 100
    print(f"  reps: {[f'{t*1e3:.0f}' for t in times]} ms, "
          f"spread {spread:.1f}% of min", flush=True)
    return min(times), seqs, scores


def probe_loop(module, params, batch, bias_mode="ancestor", topk=True,
               seqs=False, n_steps=None, K_=None, win=None):
    """Stripped beam loop for component ablation (row-stable cache design):
    fixed fori_loop with individually removable stages. NOT semantically a
    beam search when stages are off — perf probe only.

    bias_mode: 'ancestor' (real per-step bias build), 'const' (precomputed
    bias — isolates the bias-build cost)."""
    from textreact_tpu.inference.beam import ancestor_bias
    from textreact_tpu.models import DecoderStep

    K2 = K_ or K
    W = win or T
    steps = n_steps or (W - 1)
    cfg = module.decoder_config
    step_model = DecoderStep(decoder_config=cfg, dtype=module.dtype,
                             cache_len=T, beam_groups=K2)

    @jax.jit
    def run(params, input_ids, attention_mask):
        enc = module.apply(params, method="encode", input_ids=input_ids,
                           attention_mask=attention_mask)
        enc_mask = attention_mask
        step_params = {"params": {"decoder": params["params"]["decoder"]}}
        dummy = jnp.zeros((B * K2, 1), dtype=jnp.int32)
        _, cache_vars = step_model.apply(step_params, dummy, enc, enc_mask, 0,
                                         mutable=["cache"])
        cache = cache_vars["cache"]
        V = cfg.vocab_size
        live_scores = jnp.tile(jnp.array([0.0] + [-1e7] * (K2 - 1)), (B, 1))
        src0 = jnp.zeros((B, K2, T), jnp.int32)
        const_bias = ancestor_bias(src0[:, :, :W], jnp.asarray(W, jnp.int32),
                                   B, K2, W)

        def body(i, carry):
            live_scores, cache, tok, src = carry
            src = jax.lax.dynamic_update_slice_in_dim(
                src, jnp.tile(jnp.arange(K2, dtype=jnp.int32)[None, :, None],
                              (B, 1, 1)), i - 1, axis=2)
            if bias_mode == "ancestor":
                bias = ancestor_bias(src[:, :, :W], i, B, K2, W)
            else:
                bias = const_bias
            logits, vars_out = step_model.apply(
                {**step_params, "cache": cache}, tok, enc, enc_mask, i,
                bias, mutable=["cache"])
            cache = vars_out["cache"]
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            cand = live_scores[:, :, None] + logp.reshape(B, K2, V)
            if topk:
                topv, topi = jax.lax.top_k(cand.reshape(B, K2 * V), 2 * K2)
                live_scores = topv[:, :K2]
                beam_sel = (topi // V)[:, :K2]
                tok = (topi % V)[:, :K2].reshape(B * K2, 1).astype(jnp.int32)
                src = jnp.take_along_axis(src, beam_sel[:, :, None], axis=1)
            else:
                live_scores = cand.max(axis=-1)
                tok = jnp.tile(cand.argmax(axis=-1)[:, :1].astype(jnp.int32),
                               (1, K2)).reshape(B * K2, 1)
            return live_scores, cache, tok, src

        tok0 = jnp.full((B * K2, 1), cfg.bos_token_id, jnp.int32)
        live_scores, cache, tok, _ = jax.lax.fori_loop(
            1, steps + 1, body, (live_scores, cache, tok0, src0))
        return live_scores

    rng = np.random.default_rng(2)
    out = run(params, batch["input_ids"], batch["attention_mask"])
    np.asarray(out)
    times = []
    for _ in range(3):
        ids = jnp.asarray(rng.integers(1, SCIBERT_BASE.vocab_size, (B, L)),
                          jnp.int32)
        t0 = time.perf_counter()
        np.asarray(run(params, ids, batch["attention_mask"]))
        times.append(time.perf_counter() - t0)
    return min(times) / steps


if __name__ == "__main__":
    sel = sys.argv[1] if len(sys.argv) > 1 else "full"
    if sel == "rcr":
        # RCR geometry: beams 15, dec len 16, condition vocab
        K, T = 15, 16
        module, params, batch = build(dec_vocab=315)
        gen = Generator(module, params, num_beams=K, max_length=T)
        t, seqs, scores = timeit(gen, batch, reps=12)
        print(f"beam B={B} K={K} T={T}: {t*1e3:.0f} ms/batch "
              f"({B / t:.1f} ex/s)", flush=True)
        sys.exit(0)
    module, params, batch = build()
    if sel == "full":
        gen = Generator(module, params, num_beams=K, max_length=T)
        t, seqs, scores = timeit(gen, batch)
        print(f"beam B={B} K={K} T={T}: {t:.2f} s/batch  "
              f"({t / T * 1e3:.1f} ms/step, {B / t:.1f} ex/s)", flush=True)
    else:
        variants = {
            "probe": dict(),
            "constbias": dict(bias_mode="const"),
            "notopk": dict(topk=False),
            "k4": dict(K_=4),
            "win40": dict(win=40),
            "win80": dict(win=80),
            "k4win40": dict(K_=4, win=40),
        }
        for name in (variants if sel == "all" else [sel]):
            ms = probe_loop(module, params, batch, **variants[name]) * 1e3
            print(f"{name:10s} {ms:6.1f} ms/step", flush=True)
