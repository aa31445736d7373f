"""Transformer encoder (BERT-compatible geometry).

Role of the reference's HF encoder (model.py:13-32). Supports position_ids
(MLM masked-first reorder) and 1-D or 2-D attention masks (bond-graph
masking) natively.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .config import TransformerConfig
from .layers import Embeddings, TransformerBlock, mask_to_bias

Array = jax.Array


class Encoder(nn.Module):
    config: TransformerConfig
    dtype: Any = jnp.bfloat16
    remat: bool = False

    @nn.compact
    def __call__(self, input_ids: Array,
                 attention_mask: Optional[Array] = None,
                 position_ids: Optional[Array] = None,
                 token_type_ids: Optional[Array] = None,
                 deterministic: bool = True) -> Array:
        cfg = self.config
        x = Embeddings(cfg, dtype=self.dtype, name="embeddings")(
            input_ids, position_ids=position_ids, token_type_ids=token_type_ids,
            deterministic=deterministic)
        bias = None
        self_mask = None
        if attention_mask is not None:
            if cfg.attention_impl == "flash" and attention_mask.ndim == 2:
                self_mask = attention_mask  # flash path takes the raw mask
            else:
                bias = mask_to_bias(attention_mask)
        block_cls = TransformerBlock
        if self.remat:
            block_cls = nn.remat(TransformerBlock, static_argnums=(5,))
        for i in range(cfg.num_hidden_layers):
            x = block_cls(cfg, dtype=self.dtype, name=f"layer_{i}")(
                x, bias, None, None, deterministic, self_mask)
        return x
