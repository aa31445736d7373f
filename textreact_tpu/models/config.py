"""Transformer model configuration.

Reads the same BERT-style config json the reference uses for its decoder
(reference textreact/configs/bert_l6.json, consumed at model.py:25-28) and
defines presets for the encoder (SciBERT-base geometry, reference
scripts/train_RCR.sh:14).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional


@dataclasses.dataclass
class TransformerConfig:
    vocab_size: int = 600
    hidden_size: int = 768
    num_hidden_layers: int = 6
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 1
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    layer_norm_eps: float = 1e-5
    initializer_range: float = 0.02
    hidden_act: str = "gelu"
    pad_token_id: int = 0
    bos_token_id: int = 12
    eos_token_id: int = 13
    is_decoder: bool = False
    add_cross_attention: bool = False
    # 'xla' (reference semantics incl. attention-prob dropout) or 'flash'
    # (Pallas flash-attention kernel; O(L) memory, no attention-prob dropout
    # — hidden-state dropout still applies). 2-D bond masks and cached
    # decoding always take the xla path.
    attention_impl: str = "xla"
    # grouped beam-decode QK scores storage dtype: the model dtype
    # (bfloat16, default — f32 MXU accumulation, bf16 store, f32 softmax)
    # or 'float32' for bit-strict score parity at ~1.4x the decode
    # attention cost (see models/layers.py grouped decode branch).
    decode_scores_dtype: str = "bfloat16"
    # residual-add + LayerNorm: 'xla' or 'fused' (Pallas kernel reading the
    # activations once, ops/fused_layernorm.py; identical numerics, same
    # param tree). Applies to the three post-LN sites per block when the
    # hidden size is lane-aligned.
    layernorm_impl: str = "xla"

    @property
    def head_dim(self) -> int:
        assert self.hidden_size % self.num_attention_heads == 0
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def from_json(cls, path: str, **overrides) -> "TransformerConfig":
        with open(path) as f:
            raw = json.load(f)
        fields = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in raw.items() if k in fields}
        kwargs.update(overrides)
        return cls(**kwargs)

    def replace(self, **kw) -> "TransformerConfig":
        return dataclasses.replace(self, **kw)


# SciBERT-base geometry (allenai/scibert_scivocab_uncased): BERT-base with a
# 31090-token scientific vocab.
SCIBERT_BASE = TransformerConfig(
    vocab_size=31090, hidden_size=768, num_hidden_layers=12,
    num_attention_heads=12, intermediate_size=3072,
    max_position_embeddings=512, type_vocab_size=2, pad_token_id=0,
)

# The reference's 6-layer decoder config (textreact/configs/bert_l6.json).
BERT_L6_DECODER = TransformerConfig(
    vocab_size=600, hidden_size=768, num_hidden_layers=6,
    num_attention_heads=12, intermediate_size=3072,
    max_position_embeddings=512, type_vocab_size=1,
    pad_token_id=0, bos_token_id=12, eos_token_id=13,
    is_decoder=True, add_cross_attention=True,
)

PRESETS = {
    "scibert_base": SCIBERT_BASE,
    "allenai/scibert_scivocab_uncased": SCIBERT_BASE,
    "bert_l6": BERT_L6_DECODER,
}


def resolve_config(name_or_path: Optional[str], **overrides) -> TransformerConfig:
    """Preset name, json path, or HF checkpoint dir -> TransformerConfig."""
    if name_or_path is None:
        raise ValueError("model config name/path required")
    if name_or_path in PRESETS:
        return PRESETS[name_or_path].replace(**overrides) if overrides else PRESETS[name_or_path]
    if os.path.isdir(name_or_path):
        return TransformerConfig.from_json(
            os.path.join(name_or_path, "config.json"), **overrides)
    if name_or_path.endswith(".json"):
        return TransformerConfig.from_json(name_or_path, **overrides)
    raise ValueError(f"unknown model config: {name_or_path!r}")
