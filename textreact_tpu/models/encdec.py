"""Top-level models: seq2seq encoder-decoder and template-based predictor.

Role of reference textreact/model.py (get_model, TemplateBasedModel,
TemplatePredictionHead, BondTemplatePredictor) — redesigned for TPU:

- the bond-template head factors the reference's pairwise-concat linear
  (model.py:80-90: logits[i,j] = W @ [h_i; h_j]) into two dense maps summed
  at gathered bond pairs, so no (B, L, L, 2d) concat tensor and no
  (B, L, L, n_b) dense logits are ever materialized;
- atom states are gathered with a batched take along the padded atom-index
  tensor instead of a per-example python loop (model.py:59-62).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .config import TransformerConfig
from .decoder import Decoder
from .encoder import Encoder
from .layers import MLMHead

Array = jax.Array


class EncoderDecoder(nn.Module):
    """Seq2seq predictor (RCR conditions / template-free retro)."""
    encoder_config: TransformerConfig
    decoder_config: TransformerConfig
    dtype: Any = jnp.bfloat16
    mlm_layer: Optional[str] = None    # None | 'linear' | 'mlp'
    remat: bool = False

    def setup(self):
        self.encoder = Encoder(self.encoder_config, dtype=self.dtype,
                               remat=self.remat)
        self.decoder = Decoder(self.decoder_config, dtype=self.dtype,
                               remat=self.remat)
        if self.mlm_layer:
            self.mlm_head = MLMHead(self.encoder_config, dtype=self.dtype,
                                    mlp=self.mlm_layer == "mlp")

    def __call__(self, input_ids: Array, attention_mask: Array,
                 decoder_input_ids: Array,
                 decoder_attention_mask: Optional[Array] = None,
                 position_ids: Optional[Array] = None,
                 mlm_prefix_len: Optional[int] = None,
                 mlm_labels: Optional[Array] = None,
                 deterministic: bool = True):
        enc = self.encoder(input_ids, attention_mask=attention_mask,
                           position_ids=position_ids,
                           deterministic=deterministic)
        logits = self.decoder(decoder_input_ids, enc,
                              attention_mask=decoder_attention_mask,
                              encoder_attention_mask=attention_mask,
                              deterministic=deterministic)
        out = {"logits": logits, "encoder_last_hidden_state": enc}
        if self.mlm_layer and mlm_prefix_len is not None:
            # masked tokens sit in a contiguous prefix (data/mlm.py), so the
            # MLM head runs on a static slice (reference main.py:158-162)
            if mlm_labels is not None:   # fused linear+CE: no (B,P,V) logits
                out["mlm_loss_sum"], out["mlm_valid"] = self.mlm_head(
                    enc[:, :mlm_prefix_len], labels=mlm_labels)
            else:
                out["mlm_logits"] = self.mlm_head(enc[:, :mlm_prefix_len])
        return out

    def encode(self, input_ids: Array, attention_mask: Array,
               position_ids: Optional[Array] = None,
               deterministic: bool = True) -> Array:
        return self.encoder(input_ids, attention_mask=attention_mask,
                            position_ids=position_ids,
                            deterministic=deterministic)

    def decode_logits(self, decoder_input_ids: Array, encoder_states: Array,
                      encoder_attention_mask: Optional[Array] = None,
                      deterministic: bool = True) -> Array:
        """Full-sequence decoding (teacher forcing) given encoder states."""
        return self.decoder(decoder_input_ids, encoder_states,
                            encoder_attention_mask=encoder_attention_mask,
                            deterministic=deterministic)


class DecoderStep(nn.Module):
    """Single-token decoder step with KV cache, for jit beam search.

    cache_len sizes the KV cache to the actual generation length instead of
    max_position_embeddings, so each step attends over max_dec_length keys
    rather than 512."""
    decoder_config: TransformerConfig
    dtype: Any = jnp.bfloat16
    cache_len: int = 0
    beam_groups: int = 0

    @nn.compact
    def __call__(self, token_ids: Array, encoder_states: Array,
                 encoder_attention_mask: Optional[Array], position_offset,
                 beam_bias: Optional[Array] = None):
        """With beam_groups=G > 0 the self-attention KV cache uses the
        row-stable grouped beam layout and beam_bias (B, G, cache_len*G,
        merged (t, g) order) carries the ancestry mask (see layers.py);
        beam_groups=0 decodes per-row with plain positional cache masking."""
        logits = Decoder(self.decoder_config, dtype=self.dtype, decode=True,
                         cache_len=self.cache_len,
                         beam_groups=self.beam_groups,
                         name="decoder")(
            token_ids, encoder_states,
            encoder_attention_mask=encoder_attention_mask,
            position_offset=position_offset, deterministic=True,
            beam_bias=beam_bias)
        return logits


class TemplateHead(nn.Module):
    """Atom + factored bond template classifiers."""
    hidden_size: int
    num_atom_templates: int
    num_bond_templates: int
    dtype: Any = jnp.bfloat16
    initializer_range: float = 0.02

    @nn.compact
    def __call__(self, atom_states: Array, bond_pairs: Array):
        """atom_states: (B, A, d); bond_pairs: (B, MB, 2) indices into A.
        Returns atom_logits (B, A, n_a+1), bond_logits (B, MB, n_b+1)."""
        init = nn.initializers.normal(stddev=self.initializer_range)
        atom_logits = nn.Dense(self.num_atom_templates + 1, kernel_init=init,
                               dtype=jnp.float32, name="atom_head")(atom_states)
        # factored pair head: W [h_i; h_j] + b == W1 h_i + (W2 h_j)
        left = nn.Dense(self.num_bond_templates + 1, kernel_init=init,
                        dtype=jnp.float32, name="bond_head_left")(atom_states)
        right = nn.Dense(self.num_bond_templates + 1, kernel_init=init,
                         use_bias=False, dtype=jnp.float32,
                         name="bond_head_right")(atom_states)
        li = jnp.take_along_axis(left, bond_pairs[:, :, 0:1], axis=1)
        rj = jnp.take_along_axis(right, bond_pairs[:, :, 1:2], axis=1)
        bond_logits = li + rj
        return atom_logits, bond_logits


class TemplateBasedModel(nn.Module):
    """Encoder + template heads (template-based retrosynthesis)."""
    encoder_config: TransformerConfig
    num_atom_templates: int
    num_bond_templates: int
    dtype: Any = jnp.bfloat16
    mlm_layer: Optional[str] = None
    remat: bool = False

    def setup(self):
        self.encoder = Encoder(self.encoder_config, dtype=self.dtype,
                               remat=self.remat)
        self.head = TemplateHead(self.encoder_config.hidden_size,
                                 self.num_atom_templates,
                                 self.num_bond_templates, dtype=self.dtype,
                                 initializer_range=self.encoder_config.initializer_range)
        if self.mlm_layer:
            self.mlm_head = MLMHead(self.encoder_config, dtype=self.dtype,
                                    mlp=self.mlm_layer == "mlp")

    def __call__(self, input_ids: Array, attention_mask: Array,
                 atom_indices: Array, bond_pairs: Array,
                 position_ids: Optional[Array] = None,
                 mlm_prefix_len: Optional[int] = None,
                 mlm_labels: Optional[Array] = None,
                 deterministic: bool = True):
        enc = self.encoder(input_ids, attention_mask=attention_mask,
                           position_ids=position_ids,
                           deterministic=deterministic)
        # batched gather of atom-token states: (B, A, d)
        atom_states = jnp.take_along_axis(
            enc, atom_indices[:, :, None].astype(jnp.int32), axis=1)
        atom_logits, bond_logits = self.head(atom_states, bond_pairs)
        out = {"logits": (atom_logits, bond_logits),
               "encoder_last_hidden_state": enc}
        if self.mlm_layer and mlm_prefix_len is not None:
            if mlm_labels is not None:
                out["mlm_loss_sum"], out["mlm_valid"] = self.mlm_head(
                    enc[:, :mlm_prefix_len], labels=mlm_labels)
            else:
                out["mlm_logits"] = self.mlm_head(enc[:, :mlm_prefix_len])
        return out
