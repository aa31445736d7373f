"""Flax transformer stack: encoder, decoder, seq2seq + template models."""

from .config import (BERT_L6_DECODER, PRESETS, SCIBERT_BASE, TransformerConfig,
                     resolve_config)
from .decoder import Decoder
from .encdec import (DecoderStep, EncoderDecoder, TemplateBasedModel,
                     TemplateHead)
from .encoder import Encoder
from .factory import build_model
from .layers import (Embeddings, FeedForward, MLMHead, MultiHeadAttention,
                     TransformerBlock, causal_bias, mask_to_bias)

__all__ = [
    "TransformerConfig", "resolve_config", "PRESETS", "SCIBERT_BASE",
    "BERT_L6_DECODER", "Encoder", "Decoder", "EncoderDecoder", "DecoderStep",
    "TemplateBasedModel", "TemplateHead", "build_model", "Embeddings",
    "FeedForward", "MLMHead", "MultiHeadAttention", "TransformerBlock",
    "causal_bias", "mask_to_bias",
]
