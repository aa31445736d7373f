"""Generation: encoder forward + cached beam-search decoding, end-to-end jit.

Role of reference main.py:198-233 (test_step template-free branch):
model.generate with num_beams/num_return_sequences=num_beams,
length_penalty=0, then per-example {prediction, score} dicts.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import DecoderStep, EncoderDecoder
from .beam import beam_search


class Generator:
    def __init__(self, module: EncoderDecoder, params, num_beams: int,
                 max_length: int, attn_windows=None):
        self.module = module
        self.params = params
        self.num_beams = num_beams
        self.max_length = max_length
        self.dec_config = module.decoder_config
        self.attn_windows = attn_windows
        self.step_model = DecoderStep(decoder_config=self.dec_config,
                                      dtype=module.dtype,
                                      cache_len=max_length,
                                      beam_groups=num_beams)
        self._fn = None

    def _build(self, B: int, L: int, mask_ndim: int):
        K, T = self.num_beams, self.max_length
        cfg = self.dec_config
        module, step_model = self.module, self.step_model

        @jax.jit
        def generate(params, input_ids, attention_mask):
            enc = module.apply(params, method="encode", input_ids=input_ids,
                               attention_mask=attention_mask)
            if attention_mask.ndim == 3:
                enc_mask = (attention_mask.sum(axis=-1) > 0).astype(jnp.int32)
            else:
                enc_mask = attention_mask
            # encoder states/mask stay one-row-per-example; beams attend as
            # grouped query positions (models/layers.py cross-decode path)
            step_params = {"params": {"decoder": params["params"]["decoder"]}}

            dummy = jnp.zeros((B * K, 1), dtype=jnp.int32)
            # Build the cache by APPLYING the real decoder params (mutable
            # cache), not by init(): cached_cross_key/value are computed by
            # an init-once lambda from the key/value Dense kernels
            # (models/layers.py cross-decode path), so an init() here would
            # bake in freshly-initialized projections and generation would
            # silently ignore the trained cross-attention weights.
            _, cache_vars = step_model.apply(step_params, dummy, enc,
                                             enc_mask, 0, mutable=["cache"])
            cache = cache_vars["cache"]

            def step_fn(cache, tokens, pos, beam_bias):
                logits, vars_out = step_model.apply(
                    {**step_params, "cache": cache}, tokens, enc, enc_mask,
                    pos, beam_bias, mutable=["cache"])
                return logits, vars_out["cache"]

            return beam_search(
                step_fn, cache, B, K, T,
                bos_token_id=cfg.bos_token_id,
                eos_token_id=cfg.eos_token_id,
                pad_token_id=cfg.pad_token_id,
                attn_windows=self.attn_windows)

        return generate

    def generate(self, batch) -> Tuple[np.ndarray, np.ndarray]:
        input_ids = jnp.asarray(batch["input_ids"])
        attention_mask = jnp.asarray(batch["attention_mask"])
        key = (input_ids.shape, attention_mask.ndim)
        if self._fn is None or self._key != key:
            self._fn = self._build(input_ids.shape[0], input_ids.shape[1],
                                   attention_mask.ndim)
            self._key = key
        seqs, scores = self._fn(self.params, input_ids, attention_mask)
        return np.asarray(seqs), np.asarray(scores)


def predictions_from_beams(seqs: np.ndarray, scores: np.ndarray,
                           indices: np.ndarray, example_mask: np.ndarray,
                           dec_tokenizer) -> Dict[int, Dict[str, Any]]:
    """{example index: {'prediction': [K decoded], 'score': [K floats]}}
    (reference main.py:224-233)."""
    out: Dict[int, Dict[str, Any]] = {}
    B, K, _ = seqs.shape
    for b in range(B):
        if not example_mask[b]:
            continue
        preds: List[Any] = [
            dec_tokenizer.decode(seqs[b, k].tolist(), skip_special_tokens=True)
            for k in range(K)
        ]
        out[int(indices[b])] = {
            "prediction": preds,
            "score": [float(s) for s in scores[b]],
        }
    return out
