"""Transformer decoder with causal self-attention and cross-attention.

Role of the HF decoder half of EncoderDecoderModel (reference model.py:20-32,
config textreact/configs/bert_l6.json). LM logits come from a BERT-style
prediction head tied to the decoder word embeddings.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .config import TransformerConfig
from .layers import (Embeddings, MLMHead, TransformerBlock, causal_bias,
                     mask_to_bias)

Array = jax.Array


class Decoder(nn.Module):
    config: TransformerConfig
    dtype: Any = jnp.bfloat16
    decode: bool = False          # enable KV cache for incremental decoding
    cache_len: int = 0            # decode cache length (0: max_position_embeddings)
    beam_groups: int = 0          # row-stable grouped beam cache (layers.py)
    remat: bool = False

    @nn.compact
    def __call__(self, input_ids: Array,
                 encoder_states: Array,
                 attention_mask: Optional[Array] = None,
                 encoder_attention_mask: Optional[Array] = None,
                 position_offset: int | Array = 0,
                 deterministic: bool = True,
                 beam_bias: Optional[Array] = None) -> Array:
        cfg = self.config
        B, L = input_ids.shape
        if self.decode:
            # incremental: positions offset by the cache index
            position_ids = (jnp.arange(L)[None, :] + position_offset)
            self_bias = None  # cache masking handles causality
        else:
            position_ids = None
            self_bias = causal_bias(L, L)
            if attention_mask is not None:
                self_bias = self_bias + mask_to_bias(attention_mask)
        cross_bias = None
        if encoder_attention_mask is not None:
            enc_mask = encoder_attention_mask
            if enc_mask.ndim == 3:  # 2-D bond mask: any valid row position
                enc_mask = (enc_mask.sum(axis=-1) > 0).astype(jnp.int32)
            cross_bias = mask_to_bias(enc_mask)

        # word-embedding table owned here so the LM head can tie to it
        from .layers import dense_init
        embedding = self.param("word_embedding", dense_init(cfg),
                               (cfg.vocab_size, cfg.hidden_size), jnp.float32)
        x = Embeddings(cfg, dtype=self.dtype, name="embeddings")(
            input_ids, position_ids=position_ids, word_embedding=embedding,
            deterministic=deterministic)
        block_cls = TransformerBlock
        if self.remat and not self.decode:
            block_cls = nn.remat(TransformerBlock, static_argnums=(5,))
        block_kw = {"beam_bias": beam_bias} if self.decode else {}
        for i in range(cfg.num_hidden_layers):
            x = block_cls(cfg, dtype=self.dtype, decode=self.decode,
                          cache_len=self.cache_len,
                          beam_groups=self.beam_groups,
                          name=f"layer_{i}")(
                x, self_bias, encoder_states, cross_bias, deterministic,
                **block_kw)
        logits = MLMHead(cfg, dtype=self.dtype, mlp=True, name="lm_head")(
            x, embedding=embedding)
        return logits
