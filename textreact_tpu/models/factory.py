"""Model factory: experiment config + tokenizers -> flax module.

Role of reference textreact/model.py:10-47 (get_model / get_mlm_head):
chooses seq2seq vs template-based, sizes vocabularies from the tokenizers
(covering the reference's word-embedding expansion for the joint
smiles_text vocab, utils.py:36-44), and grows position embeddings to
max_length (utils.py:18-33 — here just a config field; pretrained position
rows are copied by the checkpoint importer, import_hf.py).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import ExperimentConfig
from .config import resolve_config
from .encdec import EncoderDecoder, TemplateBasedModel


def _dtype(cfg: ExperimentConfig):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[cfg.compute_dtype]


def build_model(cfg: ExperimentConfig, enc_tokenizer, dec_tokenizer):
    """Returns (module, enc_config, dec_config|None)."""
    enc_config = resolve_config(cfg.encoder)
    enc_config = enc_config.replace(
        max_position_embeddings=max(enc_config.max_position_embeddings,
                                    cfg.max_length),
        vocab_size=max(enc_config.vocab_size, len(enc_tokenizer)),
        attention_impl=cfg.attention_impl,
        layernorm_impl=cfg.layernorm_impl,
    )
    mlm_layer = cfg.mlm_layer if cfg.mlm else None
    if cfg.template_based:
        tables = dec_tokenizer  # TemplateTables
        module = TemplateBasedModel(
            encoder_config=enc_config,
            num_atom_templates=tables.num_atom_templates,
            num_bond_templates=tables.num_bond_templates,
            dtype=_dtype(cfg), mlm_layer=mlm_layer, remat=cfg.remat)
        return module, enc_config, None
    dec_config = resolve_config(cfg.decoder)
    dec_config = dec_config.replace(
        vocab_size=max(dec_config.vocab_size, len(dec_tokenizer)),
        max_position_embeddings=max(dec_config.max_position_embeddings,
                                    cfg.max_dec_length),
        is_decoder=True, add_cross_attention=True,
        attention_impl=cfg.attention_impl,
        layernorm_impl=cfg.layernorm_impl,
        decode_scores_dtype=cfg.decode_scores_dtype,
        pad_token_id=dec_tokenizer.pad_token_id,
        bos_token_id=dec_tokenizer.bos_token_id,
        eos_token_id=dec_tokenizer.eos_token_id,
    )
    module = EncoderDecoder(encoder_config=enc_config, decoder_config=dec_config,
                            dtype=_dtype(cfg), mlm_layer=mlm_layer,
                            remat=cfg.remat)
    return module, enc_config, dec_config
