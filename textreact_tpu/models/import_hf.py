"""Pretrained BERT/SciBERT checkpoint import.

Role of reference --encoder_pretrained (model.py:13-31: HF from_pretrained)
plus the embedding-expansion utilities (utils.py:18-44): copy pretrained
rows into the (larger) position/word embedding tables and keep the randomly
initialized remainder. Reads a local HF checkpoint directory
(pytorch_model.bin via torch, or model.safetensors) — no network access.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np

from .config import TransformerConfig


def _load_state_dict(ckpt_dir: str) -> Dict[str, np.ndarray]:
    st_path = os.path.join(ckpt_dir, "model.safetensors")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file
        return load_file(st_path)
    bin_path = os.path.join(ckpt_dir, "pytorch_model.bin")
    if os.path.exists(bin_path):
        import torch
        sd = torch.load(bin_path, map_location="cpu", weights_only=True)
        return {k: v.numpy() for k, v in sd.items()}
    raise FileNotFoundError(f"no model.safetensors / pytorch_model.bin in {ckpt_dir}")


def _strip_prefix(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    if any(k.startswith("bert.") for k in sd):
        # strip the base-model prefix; keep head keys (cls.*) unprefixed
        return {(k[len("bert."):] if k.startswith("bert.") else k): v
                for k, v in sd.items()}
    return sd


def _copy_rows(dst: np.ndarray, src: np.ndarray) -> np.ndarray:
    """Copy pretrained rows into a possibly larger table
    (reference utils.py:18-44)."""
    out = np.array(dst, copy=True)
    n = min(out.shape[0], src.shape[0])
    out[:n] = src[:n]
    return out


def encoder_params_from_hf(init_encoder: Dict[str, Any], ckpt_dir: str,
                           config: TransformerConfig) -> Dict[str, Any]:
    """Fill an initialized encoder param subtree from an HF BERT state dict."""
    sd = _strip_prefix(_load_state_dict(ckpt_dir))
    p = {k: dict(v) if isinstance(v, dict) else v
         for k, v in jax_tree_to_dict(init_encoder).items()}

    def dense(hf: str):
        return {"kernel": sd[f"{hf}.weight"].T.astype(np.float32),
                "bias": sd[f"{hf}.bias"].astype(np.float32)}

    def norm(hf: str):
        return {"scale": sd[f"{hf}.weight"].astype(np.float32),
                "bias": sd[f"{hf}.bias"].astype(np.float32)}

    emb = p["embeddings"]
    emb["word_embeddings"]["embedding"] = _copy_rows(
        emb["word_embeddings"]["embedding"],
        sd["embeddings.word_embeddings.weight"])
    emb["position_embeddings"]["embedding"] = _copy_rows(
        emb["position_embeddings"]["embedding"],
        sd["embeddings.position_embeddings.weight"])
    if "token_type_embeddings" in emb:
        emb["token_type_embeddings"]["embedding"] = _copy_rows(
            emb["token_type_embeddings"]["embedding"],
            sd["embeddings.token_type_embeddings.weight"])
    emb["layer_norm"] = norm("embeddings.LayerNorm")

    for i in range(config.num_hidden_layers):
        hf = f"encoder.layer.{i}"
        layer = p[f"layer_{i}"]
        attn = layer["attention"]
        attn["query"] = dense(f"{hf}.attention.self.query")
        attn["key"] = dense(f"{hf}.attention.self.key")
        attn["value"] = dense(f"{hf}.attention.self.value")
        attn["output"] = dense(f"{hf}.attention.output.dense")
        layer["attention_norm"] = norm(f"{hf}.attention.output.LayerNorm")
        layer["ffn"]["intermediate"] = dense(f"{hf}.intermediate.dense")
        layer["ffn"]["output"] = dense(f"{hf}.output.dense")
        layer["ffn_norm"] = norm(f"{hf}.output.LayerNorm")
    return p


def decoder_params_from_hf(init_decoder: Dict[str, Any], ckpt_dir: str,
                           config: TransformerConfig) -> Dict[str, Any]:
    """Fill an initialized decoder param subtree from an HF BERT state dict
    (reference --decoder_pretrained, model.py:22-24: the decoder half of
    EncoderDecoderModel.from_encoder_decoder_pretrained). BERT has no
    cross-attention, so crossattention/crossattention_norm keep their fresh
    initialization — the same policy HF applies when grafting a BERT
    checkpoint into a decoder."""
    sd = _strip_prefix(_load_state_dict(ckpt_dir))
    p = {k: dict(v) if isinstance(v, dict) else v
         for k, v in jax_tree_to_dict(init_decoder).items()}

    def dense(hf: str):
        return {"kernel": sd[f"{hf}.weight"].T.astype(np.float32),
                "bias": sd[f"{hf}.bias"].astype(np.float32)}

    def norm(hf: str):
        return {"scale": sd[f"{hf}.weight"].astype(np.float32),
                "bias": sd[f"{hf}.bias"].astype(np.float32)}

    # the decoder owns its word-embedding table (tied with the LM head)
    p["word_embedding"] = _copy_rows(
        p["word_embedding"], sd["embeddings.word_embeddings.weight"])
    emb = p["embeddings"]
    emb["position_embeddings"]["embedding"] = _copy_rows(
        emb["position_embeddings"]["embedding"],
        sd["embeddings.position_embeddings.weight"])
    if "token_type_embeddings" in emb and \
            "embeddings.token_type_embeddings.weight" in sd:
        emb["token_type_embeddings"]["embedding"] = _copy_rows(
            emb["token_type_embeddings"]["embedding"],
            sd["embeddings.token_type_embeddings.weight"])
    emb["layer_norm"] = norm("embeddings.LayerNorm")

    for i in range(config.num_hidden_layers):
        hf = f"encoder.layer.{i}"
        layer = p[f"layer_{i}"]
        attn = layer["attention"]
        attn["query"] = dense(f"{hf}.attention.self.query")
        attn["key"] = dense(f"{hf}.attention.self.key")
        attn["value"] = dense(f"{hf}.attention.self.value")
        attn["output"] = dense(f"{hf}.attention.output.dense")
        layer["attention_norm"] = norm(f"{hf}.attention.output.LayerNorm")
        layer["ffn"]["intermediate"] = dense(f"{hf}.intermediate.dense")
        layer["ffn"]["output"] = dense(f"{hf}.output.dense")
        layer["ffn_norm"] = norm(f"{hf}.output.LayerNorm")

    # LM head transform from a MaskedLM checkpoint, when present; the vocab
    # projection itself is tied to word_embedding (+ a bias vector)
    if "cls.predictions.transform.dense.weight" in sd:
        head = p["lm_head"]
        head["transform"] = dense("cls.predictions.transform.dense")
        head["transform_norm"] = norm("cls.predictions.transform.LayerNorm")
        if "cls.predictions.bias" in sd:
            head["bias"] = _copy_rows(head["bias"], sd["cls.predictions.bias"])
    return p


def load_pretrained_decoder(params: Dict[str, Any], ckpt_dir: str,
                            config: TransformerConfig) -> Dict[str, Any]:
    """Replace the 'decoder' subtree of a full model param tree."""
    import jax

    plain = jax_tree_to_dict(params)
    plain["params"]["decoder"] = decoder_params_from_hf(
        plain["params"]["decoder"], ckpt_dir, config)
    return jax.tree.map(lambda x: x, plain)


def jax_tree_to_dict(tree: Any) -> Any:
    """Nested FrozenDict/dict -> plain nested dict of numpy arrays."""
    if hasattr(tree, "items"):
        return {k: jax_tree_to_dict(v) for k, v in tree.items()}
    return np.asarray(tree)


def load_pretrained_encoder(params: Dict[str, Any], ckpt_dir: str,
                            config: TransformerConfig) -> Dict[str, Any]:
    """Replace the 'encoder' subtree of a full model param tree."""
    import jax

    plain = jax_tree_to_dict(params)
    plain["params"]["encoder"] = encoder_params_from_hf(
        plain["params"]["encoder"], ckpt_dir, config)
    return jax.tree.map(lambda x: x, plain)
