"""HF BERT checkpoint import: build a fake torch state dict, import it, and
verify weights landed (incl. position/word embedding expansion)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from textreact_tpu.models import Encoder, TransformerConfig
from textreact_tpu.models.import_hf import load_pretrained_encoder

CFG = TransformerConfig(vocab_size=50, hidden_size=16, num_hidden_layers=2,
                        num_attention_heads=2, intermediate_size=32,
                        max_position_embeddings=24, type_vocab_size=2)


def _fake_hf_checkpoint(tmpdir, vocab=40, hidden=16, layers=2, ffn=32,
                        max_pos=12, with_mlm_head=False):
    g = torch.Generator().manual_seed(0)
    sd = {
        "bert.embeddings.word_embeddings.weight": torch.randn(vocab, hidden, generator=g),
        "bert.embeddings.position_embeddings.weight": torch.randn(max_pos, hidden, generator=g),
        "bert.embeddings.token_type_embeddings.weight": torch.randn(2, hidden, generator=g),
        "bert.embeddings.LayerNorm.weight": torch.ones(hidden),
        "bert.embeddings.LayerNorm.bias": torch.zeros(hidden),
    }
    if with_mlm_head:
        sd["cls.predictions.transform.dense.weight"] = torch.randn(hidden, hidden, generator=g)
        sd["cls.predictions.transform.dense.bias"] = torch.randn(hidden, generator=g)
        sd["cls.predictions.transform.LayerNorm.weight"] = torch.ones(hidden)
        sd["cls.predictions.transform.LayerNorm.bias"] = torch.zeros(hidden)
        sd["cls.predictions.bias"] = torch.randn(vocab, generator=g)
    for i in range(layers):
        base = f"bert.encoder.layer.{i}"
        for name, shape in [
            ("attention.self.query", (hidden, hidden)),
            ("attention.self.key", (hidden, hidden)),
            ("attention.self.value", (hidden, hidden)),
            ("attention.output.dense", (hidden, hidden)),
            ("intermediate.dense", (ffn, hidden)),
            ("output.dense", (hidden, ffn)),
        ]:
            sd[f"{base}.{name}.weight"] = torch.randn(*shape, generator=g)
            sd[f"{base}.{name}.bias"] = torch.randn(shape[0], generator=g)
        for name in ["attention.output.LayerNorm", "output.LayerNorm"]:
            sd[f"{base}.{name}.weight"] = torch.ones(hidden)
            sd[f"{base}.{name}.bias"] = torch.zeros(hidden)
    torch.save(sd, os.path.join(tmpdir, "pytorch_model.bin"))
    return sd


def test_import_and_expansion(tmp_path):
    sd = _fake_hf_checkpoint(str(tmp_path))
    encoder = Encoder(CFG, dtype=jnp.float32)
    dummy = dict(input_ids=jnp.zeros((1, 8), jnp.int32),
                 attention_mask=jnp.ones((1, 8), jnp.int32))
    params = {"params": {"encoder": encoder.init(jax.random.PRNGKey(0), **dummy)["params"]}}
    out = load_pretrained_encoder(params, str(tmp_path), CFG)
    enc = out["params"]["encoder"]

    word = np.asarray(enc["embeddings"]["word_embeddings"]["embedding"])
    assert word.shape == (50, 16)  # expanded vocab keeps random tail
    np.testing.assert_allclose(
        word[:40], sd["bert.embeddings.word_embeddings.weight"].numpy(), rtol=1e-6)

    pos = np.asarray(enc["embeddings"]["position_embeddings"]["embedding"])
    assert pos.shape == (24, 16)  # position expansion (reference utils.py:18-33)
    np.testing.assert_allclose(
        pos[:12], sd["bert.embeddings.position_embeddings.weight"].numpy(), rtol=1e-6)

    # torch Linear weight (out,in) -> flax kernel (in,out)
    q = np.asarray(enc["layer_0"]["attention"]["query"]["kernel"])
    np.testing.assert_allclose(
        q, sd["bert.encoder.layer.0.attention.self.query.weight"].numpy().T,
        rtol=1e-6)
    ffn_in = np.asarray(enc["layer_1"]["ffn"]["intermediate"]["kernel"])
    np.testing.assert_allclose(
        ffn_in, sd["bert.encoder.layer.1.intermediate.dense.weight"].numpy().T,
        rtol=1e-6)

    # imported params actually run
    out2 = encoder.apply({"params": out["params"]["encoder"]["params"]}
                         if "params" in enc else {"params": enc}, **dummy)
    assert np.isfinite(np.asarray(out2)).all()


def test_decoder_import(tmp_path):
    """--decoder_pretrained: BERT weights land in the decoder's self-attn /
    ffn / embeddings / lm_head; cross-attention keeps fresh init
    (reference model.py:22-24 from_encoder_decoder_pretrained policy)."""
    from textreact_tpu.models import Decoder
    from textreact_tpu.models.import_hf import load_pretrained_decoder

    sd = _fake_hf_checkpoint(str(tmp_path), with_mlm_head=True)
    dec_cfg = CFG.replace(is_decoder=True, add_cross_attention=True)
    decoder = Decoder(dec_cfg, dtype=jnp.float32)
    enc_states = jnp.zeros((1, 8, 16), jnp.float32)
    dummy_ids = jnp.zeros((1, 6), jnp.int32)
    init = decoder.init(jax.random.PRNGKey(5), dummy_ids, enc_states)
    params = {"params": {"decoder": init["params"]}}
    before_cross = np.asarray(
        init["params"]["layer_0"]["crossattention"]["query"]["kernel"])

    out = load_pretrained_decoder(params, str(tmp_path), dec_cfg)
    dec = out["params"]["decoder"]

    word = np.asarray(dec["word_embedding"])
    assert word.shape == (50, 16)
    np.testing.assert_allclose(
        word[:40], sd["bert.embeddings.word_embeddings.weight"].numpy(), rtol=1e-6)

    q = np.asarray(dec["layer_0"]["attention"]["query"]["kernel"])
    np.testing.assert_allclose(
        q, sd["bert.encoder.layer.0.attention.self.query.weight"].numpy().T,
        rtol=1e-6)

    # cross-attention untouched (BERT has none)
    np.testing.assert_allclose(
        np.asarray(dec["layer_0"]["crossattention"]["query"]["kernel"]),
        before_cross, rtol=0)

    # lm_head transform imported; tied-vocab bias row-copied
    tr = np.asarray(dec["lm_head"]["transform"]["kernel"])
    np.testing.assert_allclose(
        tr, sd["cls.predictions.transform.dense.weight"].numpy().T, rtol=1e-6)
    bias = np.asarray(dec["lm_head"]["bias"])
    np.testing.assert_allclose(bias[:40], sd["cls.predictions.bias"].numpy(),
                               rtol=1e-6)

    # imported params actually run
    logits = decoder.apply({"params": dec}, dummy_ids, enc_states)
    assert np.isfinite(np.asarray(logits)).all()
