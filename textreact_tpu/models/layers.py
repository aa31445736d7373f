"""Transformer building blocks (flax.linen), BERT-compatible geometry.

Replaces the HF torch stack the reference builds on (reference model.py:10-37
via transformers EncoderDecoderModel). Design notes for TPU:

- params live in float32; matmuls run in `dtype` (bfloat16 by default) on the
  MXU; attention logits/softmax and layer norms accumulate in float32;
- attention masks are additive float biases, supporting both the standard
  (B, L) padding mask and the 2-D (B, L, L) bond-graph mask
  (`unattend_nonbonds`, reference dataset.py:247-254) without separate code
  paths;
- MLM's masked-first reordering arrives as explicit position_ids
  (reference dataset.py:100-105), so position embeddings are always a gather;
- autoregressive decoding uses a fixed-size linen 'cache' collection so the
  whole beam-search loop stays inside one jit.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .config import TransformerConfig

Array = jax.Array

NEG_INF = -1e9


def dense_init(config: TransformerConfig) -> Callable:
    return nn.initializers.normal(stddev=config.initializer_range)


def mask_to_bias(mask: Array, dtype=jnp.float32) -> Array:
    """(B, L) or (B, Lq, Lk) {0,1} mask -> (B, 1, Lq|1, Lk) additive bias."""
    if mask.ndim == 2:
        bias = mask[:, None, None, :]
    elif mask.ndim == 3:
        bias = mask[:, None, :, :]
    else:
        raise ValueError(f"mask ndim {mask.ndim}")
    return ((1.0 - bias.astype(dtype)) * NEG_INF).astype(dtype)


def causal_bias(q_len: int, k_len: int, offset: int = 0, dtype=jnp.float32) -> Array:
    """(1, 1, q_len, k_len) causal additive bias; offset shifts the query
    positions (for incremental decoding)."""
    q_pos = jnp.arange(q_len)[:, None] + offset
    k_pos = jnp.arange(k_len)[None, :]
    allowed = k_pos <= q_pos
    return jnp.where(allowed, 0.0, NEG_INF).astype(dtype)[None, None]


class Embeddings(nn.Module):
    """word + position + token-type embeddings with post-sum LayerNorm."""
    config: TransformerConfig
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, input_ids: Array, position_ids: Optional[Array] = None,
                 token_type_ids: Optional[Array] = None,
                 word_embedding: Optional[Array] = None,
                 deterministic: bool = True) -> Array:
        cfg = self.config
        if position_ids is None:
            position_ids = jnp.arange(input_ids.shape[-1])[None, :]
        if word_embedding is not None:
            # externally-owned table (tied with the LM head)
            word = jnp.take(word_embedding.astype(self.dtype), input_ids, axis=0)
        else:
            word = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                            embedding_init=dense_init(cfg), name="word_embeddings",
                            dtype=self.dtype)(input_ids)
        pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                       embedding_init=dense_init(cfg), name="position_embeddings",
                       dtype=self.dtype)(position_ids)
        x = word + pos
        if cfg.type_vocab_size > 0:
            if token_type_ids is None:
                token_type_ids = jnp.zeros_like(input_ids)
            x = x + nn.Embed(cfg.type_vocab_size, cfg.hidden_size,
                             embedding_init=dense_init(cfg),
                             name="token_type_embeddings",
                             dtype=self.dtype)(token_type_ids)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         name="layer_norm")(x)
        x = nn.Dropout(cfg.hidden_dropout_prob)(x, deterministic=deterministic)
        return x.astype(self.dtype)


def _flash_attention(q: Array, k: Array, v: Array,
                     mask_kv: Optional[Array],
                     causal: bool, sm_scale: float) -> Array:
    """Official Pallas TPU flash-attention kernel over (B, L, H, D) inputs.

    The 1-D key padding mask becomes segment ids: queries all carry segment
    0, padded keys segment 1, so real queries never attend to padding —
    exactly the additive-bias path's key-masking semantics (mask_to_bias
    masks keys only)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention)
    qt = q.transpose(0, 2, 1, 3)   # (B, H, L, D)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    segment_ids = None
    if mask_kv is not None:
        seg_q = jnp.zeros(q.shape[:2], jnp.int32)
        seg_kv = 1 - mask_kv.astype(jnp.int32)
        segment_ids = SegmentIds(q=seg_q, kv=seg_kv)
    # default blocks (128) leave the MXU underutilized at head_dim 64;
    # full-length blocks fit VMEM comfortably at L<=512
    bq = min(512, qt.shape[2])
    bk = min(512, kt.shape[2])
    block_sizes = BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bk, block_k_dkv=bk,
        block_q_dkv=bq,
        block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq,
    )
    out = flash_attention(qt, kt, vt, segment_ids=segment_ids, causal=causal,
                          sm_scale=sm_scale, block_sizes=block_sizes)
    return out.transpose(0, 2, 1, 3)


class MultiHeadAttention(nn.Module):
    """Self- or cross-attention; float32 logits/softmax; optional decode cache.

    beam_groups > 0 switches the decode KV cache to the row-stable grouped
    beam layout (Bex, H, T, G, D): beams never permute the cache (XLA moves
    that multi-GB gather at ~10% of HBM bandwidth); instead each beam
    attends over all G*T slots of its example under an ancestry bias, and
    the (head, position, beam) layout makes both the new-token write (one
    contiguous dynamic_update_slice) and the attention einsum (merged (t,g)
    KV axis already behind H) transpose-free — a minor-dim transpose of the
    full cache per layer per step is what made the naive layout slow."""
    config: TransformerConfig
    dtype: Any = jnp.bfloat16
    decode: bool = False
    causal_hint: bool = False   # true in decoder self-attention (flash path)
    cache_len: int = 0          # decode KV-cache length (0: max_position_embeddings)
    beam_groups: int = 0        # G beams per example (row-stable beam cache)

    @nn.compact
    def __call__(self, x: Array, kv: Optional[Array] = None,
                 bias: Optional[Array] = None,
                 mask_kv: Optional[Array] = None,
                 deterministic: bool = True,
                 beam_bias: Optional[Array] = None) -> Array:
        cfg = self.config
        H, D = cfg.num_attention_heads, cfg.head_dim
        kv_in = x if kv is None else kv
        init = dense_init(cfg)

        def proj(name, src):
            y = nn.Dense(H * D, kernel_init=init, dtype=self.dtype, name=name)(src)
            return y.reshape(src.shape[0], src.shape[1], H, D)

        q = proj("query", x)
        if self.decode and kv is not None:
            # Cross-attention during incremental decoding. The encoder
            # states are fixed, so K/V are projected once at cache creation
            # (predictor init runs with the real encoder output) and stored
            # UNREPLICATED — one row per example, not per beam. Beams attend
            # as extra query positions over their example's row, which cuts
            # the per-step KV reads by the beam count (the dominant
            # generation cost at L=512).
            # stored head-major (B, H, L, D): the per-step attention einsums
            # then read the cache transpose-free (a per-step minor-dim
            # shuffle of the full cache is what made decoding slow)
            cached_ck = self.variable(
                "cache", "cached_cross_key",
                lambda: proj("key", kv_in).transpose(0, 2, 1, 3))
            cached_cv = self.variable(
                "cache", "cached_cross_value",
                lambda: proj("value", kv_in).transpose(0, 2, 1, 3))
            k, v = cached_ck.value, cached_cv.value
            Bq, Bk = q.shape[0], k.shape[0]
            assert x.shape[1] == 1 and Bq % Bk == 0, (q.shape, k.shape)
            G = Bq // Bk  # 1 when beams == 1: same math, grouped layout
            q2 = q.reshape(Bk, G, H, D)
            scores = jnp.einsum("bghd,bhld->bhgl", q2, k,
                                preferred_element_type=jnp.float32)
            scores = scores / jnp.sqrt(D).astype(jnp.float32)
            if bias is not None:
                scores = scores + bias.astype(jnp.float32)  # (Bk,1,1,L)
            probs = jax.nn.softmax(scores, axis=-1)
            ctx = jnp.einsum("bhgl,bhld->bghd", probs.astype(self.dtype),
                             v, preferred_element_type=jnp.float32)
            ctx = ctx.astype(self.dtype).reshape(Bq, 1, H * D)
            return nn.Dense(cfg.hidden_size, kernel_init=init,
                            dtype=self.dtype, name="output")(ctx)
        else:
            k = proj("key", kv_in)
            v = proj("value", kv_in)

        # fused kernels want 128-aligned sequence lengths; shorter/unaligned
        # shapes (e.g. the 16-160 token decoder) fall back to the XLA path
        use_flash = (cfg.attention_impl == "flash" and not self.decode
                     and bias is None
                     and x.shape[1] % 128 == 0 and kv_in.shape[1] % 128 == 0)
        if use_flash:
            drop_p = (0.0 if deterministic
                      else cfg.attention_probs_dropout_prob)
            if not self.causal_hint:
                # fused attention kernel with in-kernel attention-prob
                # dropout (reference HF semantics) — ops/fused_attention.py;
                # p=0 at eval. Faster than the stock flash kernel at this
                # geometry and interpretable on the CPU test backend.
                from ..ops.fused_attention import fused_dropout_attention
                rng = self.make_rng("dropout") if drop_p > 0.0 else None
                ctx = fused_dropout_attention(
                    q, k, v, mask_kv, drop_p, rng,
                    sm_scale=1.0 / float(D) ** 0.5)
            else:
                ctx = _flash_attention(q, k, v, mask_kv,
                                       causal=self.causal_hint,
                                       sm_scale=1.0 / float(D) ** 0.5)
            ctx = ctx.astype(self.dtype)
            ctx = ctx.reshape(ctx.shape[0], ctx.shape[1], H * D)
            return nn.Dense(cfg.hidden_size, kernel_init=init, dtype=self.dtype,
                            name="output")(ctx)
        if mask_kv is not None:
            # additive-bias path from the 1-D key mask (flash declined)
            extra = mask_to_bias(mask_kv)
            bias = extra if bias is None else bias + extra
            if self.causal_hint:
                bias = bias + causal_bias(x.shape[1], kv_in.shape[1])

        if self.decode and kv is None and self.beam_groups > 0:
            # Row-stable grouped beam decode (ancestry-masked attention over
            # the UNPERMUTED cache). Beam reorderings never move K/V; each
            # beam attends over all G*T slots of its example, and beam_bias
            # (built by inference/beam.py from the ancestor table, merged
            # (t, g) axis order, position validity folded in) admits exactly
            # one row per valid position — its ancestor's.
            G = self.beam_groups
            Bex = x.shape[0] // G
            cache_len = self.cache_len or cfg.max_position_embeddings
            is_initialized = self.has_variable("cache", "cached_key")
            # (Bex, H, D, T*G): head-major, D as sublanes, (t, g) MERGED as
            # the lane axis — the attention einsums read it transpose-free,
            # and the per-step token write is a dynamic_update_slice at
            # lane offset t*G, which XLA performs in place inside the
            # decode while_loop. (A 5-D (..., T, G) layout with the dynamic
            # index on the T dim measured 2.27 ms/step at retro scale — XLA
            # copies the whole 157 MB cache per layer per step — vs 0.39
            # for this merged layout.)
            cached_k = self.variable("cache", "cached_key", jnp.zeros,
                                     (Bex, H, D, cache_len * G), self.dtype)
            cached_v = self.variable("cache", "cached_value", jnp.zeros,
                                     (Bex, H, D, cache_len * G), self.dtype)
            cache_index = self.variable("cache", "cache_index",
                                        lambda: jnp.array(0, dtype=jnp.int32))
            if is_initialized:
                assert x.shape[1] == 1, "grouped beam decode is 1 token/step"
                idx = cache_index.value
                zero = jnp.zeros((), dtype=idx.dtype)
                # (B*G, 1, H, D) -> (Bex, H, D, G): tiny transpose of the
                # NEW token only; the big cache is written contiguously
                k_new = k.reshape(Bex, G, H, D).transpose(0, 2, 3, 1)
                v_new = v.reshape(Bex, G, H, D).transpose(0, 2, 3, 1)
                k_all = jax.lax.dynamic_update_slice(
                    cached_k.value, k_new, (zero, zero, zero, idx * G))
                v_all = jax.lax.dynamic_update_slice(
                    cached_v.value, v_new, (zero, zero, zero, idx * G))
                cached_k.value = k_all
                cached_v.value = v_all
                cache_index.value = idx + 1
                if beam_bias is None:
                    raise ValueError("beam_groups decode requires beam_bias")
                q2 = q.reshape(Bex, G, H, D)
                sm_scale = 1.0 / float(D) ** 0.5
                # the bias WIDTH carries the static attention window
                # (inference/beam.py segments the decode): the attention
                # reads only that prefix of the cache
                win = beam_bias.shape[-1] // G
                # batched einsum over the merged (t, g) cache axis; the
                # segment schedule in inference/beam.py bounds `win` so
                # early steps read only a cache prefix. (A Pallas
                # streaming-softmax kernel with valid-prefix block skipping
                # was A/B'd here across two rounds and lost at every
                # shipped beam count — 22.4 vs 10.4 ms/step at retro
                # geometry even head-batched — so it was removed.)
                k2 = k_all[:, :, :, :win * G]
                v2 = v_all[:, :, :, :win * G]
                # QK accumulates in f32 on the MXU but stores bf16 (same
                # precision class as every other activation in a bf16
                # model; the softmax and the final log-probs stay f32) —
                # halving the scores-tensor HBM traffic is worth 3.2
                # ms/step at retro scale. decode_scores_dtype='float32'
                # restores full-precision scores for strict-parity runs.
                s_dt = (jnp.float32 if cfg.decode_scores_dtype == "float32"
                        else self.dtype)
                scores = jnp.einsum("bghd,bhdk->bhgk", q2, k2,
                                    preferred_element_type=s_dt)
                scores = scores.astype(jnp.float32) * sm_scale
                scores = scores + beam_bias[:, None].astype(jnp.float32)
                probs = jax.nn.softmax(scores, axis=-1)
                ctx = jnp.einsum("bhgk,bhdk->bghd",
                                 probs.astype(self.dtype), v2,
                                 preferred_element_type=jnp.float32)
                ctx = ctx.astype(self.dtype).reshape(x.shape[0], 1, H * D)
                return nn.Dense(cfg.hidden_size, kernel_init=init,
                                dtype=self.dtype, name="output")(ctx)
            # cache-building pass: fall through to plain attention on the
            # single dummy token (output unused, variables now shaped)
        elif self.decode and kv is None:
            if beam_bias is not None:
                raise ValueError("beam_bias requires beam_groups > 0")
            # fixed-size per-row KV cache for incremental decoding
            is_initialized = self.has_variable("cache", "cached_key")
            cache_len = self.cache_len or cfg.max_position_embeddings
            cached_k = self.variable("cache", "cached_key", jnp.zeros,
                                     (x.shape[0], cache_len, H, D),
                                     self.dtype)
            cached_v = self.variable("cache", "cached_value", jnp.zeros,
                                     (x.shape[0], cache_len, H, D),
                                     self.dtype)
            cache_index = self.variable("cache", "cache_index",
                                        lambda: jnp.array(0, dtype=jnp.int32))
            if is_initialized:
                idx = cache_index.value
                zero = jnp.zeros((), dtype=idx.dtype)
                k_all = jax.lax.dynamic_update_slice(cached_k.value, k, (zero, idx, zero, zero))
                v_all = jax.lax.dynamic_update_slice(cached_v.value, v, (zero, idx, zero, zero))
                cached_k.value = k_all
                cached_v.value = v_all
                cache_index.value = idx + x.shape[1]
                k, v = k_all, v_all
                # mask out cache slots beyond the current position
                k_len = k.shape[1]
                pos = jnp.arange(k_len)[None, None, None, :]
                valid = pos < (idx + x.shape[1])
                cache_bias = jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)
                bias = cache_bias if bias is None else bias + cache_bias

        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / jnp.sqrt(D).astype(jnp.float32)
        if bias is not None:
            scores = scores + bias.astype(jnp.float32)
        probs = jax.nn.softmax(scores, axis=-1)
        probs = nn.Dropout(cfg.attention_probs_dropout_prob)(
            probs, deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(self.dtype), v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        ctx = ctx.reshape(ctx.shape[0], ctx.shape[1], H * D)
        return nn.Dense(cfg.hidden_size, kernel_init=init, dtype=self.dtype,
                        name="output")(ctx)


class ResidualLayerNorm(nn.Module):
    """LayerNorm(x + dropout(res)) with the exact param tree of
    nn.LayerNorm ({scale, bias} under this module's name — checkpoints and
    the HF importer are unaffected). layernorm_impl='fused' routes through
    the single-HBM-pass Pallas kernel (ops/fused_layernorm.py) with the
    dropout mask generated in-kernel; the XLA path reproduces
    flax.linen.LayerNorm(dtype=float32) fast-variance numerics bit-for-bit
    (its caller applies nn.Dropout itself and passes dropout_p=0)."""
    config: TransformerConfig
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, res: Array, dropout_p: float = 0.0,
                 deterministic: bool = True) -> Array:
        cfg = self.config
        scale = self.param("scale", nn.initializers.ones,
                           (cfg.hidden_size,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (cfg.hidden_size,), jnp.float32)
        if cfg.layernorm_impl == "fused" and cfg.hidden_size % 128 == 0:
            from ..ops.fused_layernorm import fused_residual_layernorm
            p = 0.0 if deterministic else float(dropout_p)
            rng = self.make_rng("dropout") if p > 0.0 else None
            return fused_residual_layernorm(
                x.astype(self.dtype), res.astype(self.dtype), scale, bias,
                cfg.layer_norm_eps, dropout_p=p,
                dropout_rng=rng).astype(self.dtype)
        assert dropout_p == 0.0, "xla path expects pre-applied dropout"
        from ..ops.fused_layernorm import residual_layernorm_reference
        return residual_layernorm_reference(
            x, res, scale, bias, cfg.layer_norm_eps).astype(self.dtype)


class FeedForward(nn.Module):
    config: TransformerConfig
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cfg = self.config
        act = nn.gelu if cfg.hidden_act == "gelu" else getattr(nn, cfg.hidden_act)
        h = nn.Dense(cfg.intermediate_size, kernel_init=dense_init(cfg),
                     dtype=self.dtype, name="intermediate")(x)
        h = act(h)
        return nn.Dense(cfg.hidden_size, kernel_init=dense_init(cfg),
                        dtype=self.dtype, name="output")(h)


class TransformerBlock(nn.Module):
    """Post-LN block: [self-attn] [cross-attn]? [ffn], each with residual+LN."""
    config: TransformerConfig
    dtype: Any = jnp.bfloat16
    decode: bool = False
    causal: bool = False
    cache_len: int = 0
    beam_groups: int = 0

    @nn.compact
    def __call__(self, x: Array, self_bias: Optional[Array] = None,
                 encoder_states: Optional[Array] = None,
                 cross_bias: Optional[Array] = None,
                 deterministic: bool = True,
                 self_mask: Optional[Array] = None,
                 cross_mask: Optional[Array] = None,
                 beam_bias: Optional[Array] = None) -> Array:
        cfg = self.config

        fused_ln = (cfg.layernorm_impl == "fused"
                    and cfg.hidden_size % 128 == 0)

        def res_norm(name, x, y):
            # fused path folds the residual dropout into the LN kernel
            # (mask generated on-chip); xla path keeps nn.Dropout outside
            if fused_ln:
                return ResidualLayerNorm(cfg, dtype=self.dtype, name=name)(
                    x, y, dropout_p=cfg.hidden_dropout_prob,
                    deterministic=deterministic)
            y = nn.Dropout(cfg.hidden_dropout_prob)(
                y, deterministic=deterministic)
            return ResidualLayerNorm(cfg, dtype=self.dtype, name=name)(x, y)

        attn = MultiHeadAttention(cfg, dtype=self.dtype, decode=self.decode,
                                  causal_hint=self.causal,
                                  cache_len=self.cache_len,
                                  beam_groups=self.beam_groups,
                                  name="attention")(
            x, bias=self_bias, mask_kv=self_mask, deterministic=deterministic,
            beam_bias=beam_bias)
        x = res_norm("attention_norm", x, attn)
        if cfg.add_cross_attention and encoder_states is not None:
            cross = MultiHeadAttention(cfg, dtype=self.dtype, decode=self.decode,
                                       name="crossattention")(
                x, kv=encoder_states, bias=cross_bias, mask_kv=cross_mask,
                deterministic=deterministic)
            x = res_norm("crossattention_norm", x, cross)
        ffn = FeedForward(cfg, dtype=self.dtype, name="ffn")(x)
        x = res_norm("ffn_norm", x, ffn)
        return x


class _VocabProj(nn.Module):
    """Raw kernel/bias with nn.Dense's exact param names/shapes/dtypes, so
    the fused-CE path shares the 'decoder' param subtree with the logits
    path (and with imported HF checkpoints)."""
    features: int
    kernel_init: Any

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param("kernel", self.kernel_init,
                            (in_features, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        return kernel, bias


class MLMHead(nn.Module):
    """BERT prediction head: dense+gelu+LN then vocab projection.

    Role of reference model.py:40-47 (get_mlm_head, 'mlp' variant) and the
    decoder LM logits. With `embedding` given, the vocab projection is tied
    to the word-embedding matrix. With `labels` given, returns
    (sum_nll, n_valid) via the fused linear+CE (ops/fused_ce.py) instead of
    materializing the (B, P, V) f32 logits.
    """
    config: TransformerConfig
    dtype: Any = jnp.bfloat16
    mlp: bool = True

    @nn.compact
    def __call__(self, x: Array, embedding: Optional[Array] = None,
                 labels: Optional[Array] = None):
        from ..data.collate import IGNORE_INDEX
        from ..ops.fused_ce import fused_linear_ce

        cfg = self.config
        if self.mlp:
            x = nn.Dense(cfg.hidden_size, kernel_init=dense_init(cfg),
                         dtype=self.dtype, name="transform")(x)
            x = nn.gelu(x)
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                             name="transform_norm")(x).astype(self.dtype)
        d = x.shape[-1]
        if embedding is not None:
            bias = self.param("bias", nn.initializers.zeros, (cfg.vocab_size,),
                              jnp.float32)
            if labels is not None:
                return fused_linear_ce(x.reshape(-1, d), embedding, bias,
                                       labels.reshape(-1), IGNORE_INDEX, 0)
            logits = jnp.einsum("bld,vd->blv", x, embedding.astype(self.dtype),
                                preferred_element_type=jnp.float32)
            return logits + bias
        if labels is not None:
            kernel, bias = _VocabProj(cfg.vocab_size, dense_init(cfg),
                                      name="decoder")(d)
            return fused_linear_ce(x.reshape(-1, d), kernel, bias,
                                   labels.reshape(-1), IGNORE_INDEX, 1)
        return nn.Dense(cfg.vocab_size, kernel_init=dense_init(cfg),
                        dtype=jnp.float32, name="decoder")(x)
