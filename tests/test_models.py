"""Model tests: shapes, masking semantics, cache-equivalence, template heads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from textreact_tpu.models import (DecoderStep, EncoderDecoder,
                                  TemplateBasedModel, TransformerConfig)

TINY_ENC = TransformerConfig(
    vocab_size=64, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
    intermediate_size=64, max_position_embeddings=64, type_vocab_size=1)
TINY_DEC = TINY_ENC.replace(vocab_size=32, is_decoder=True,
                            add_cross_attention=True, max_position_embeddings=32)


@pytest.fixture(scope="module")
def encdec():
    model = EncoderDecoder(encoder_config=TINY_ENC, decoder_config=TINY_DEC,
                           dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    batch = _batch()
    params = model.init(rng, **batch)
    return model, params


def _batch(B=2, L=16, Ld=8):
    rng = np.random.default_rng(0)
    return dict(
        input_ids=jnp.asarray(rng.integers(1, 64, (B, L))),
        attention_mask=jnp.ones((B, L), dtype=jnp.int32),
        decoder_input_ids=jnp.asarray(rng.integers(1, 32, (B, Ld))),
        decoder_attention_mask=jnp.ones((B, Ld), dtype=jnp.int32),
    )


def test_encdec_shapes(encdec):
    model, params = encdec
    batch = _batch()
    out = model.apply(params, **batch)
    assert out["logits"].shape == (2, 8, 32)
    assert out["encoder_last_hidden_state"].shape == (2, 16, 32)


def test_causal_masking(encdec):
    """Changing a later decoder token must not affect earlier logits."""
    model, params = encdec
    batch = _batch()
    out1 = model.apply(params, **batch)["logits"]
    ids2 = batch["decoder_input_ids"].at[:, 5].set(7)
    batch2 = dict(batch, decoder_input_ids=ids2)
    out2 = model.apply(params, **batch2)["logits"]
    np.testing.assert_allclose(out1[:, :5], out2[:, :5], rtol=2e-5, atol=2e-5)
    assert not np.allclose(out1[:, 5:], out2[:, 5:])


def test_encoder_pad_invariance(encdec):
    """Padding the encoder input (with mask 0) must not change decoder logits."""
    model, params = encdec
    batch = _batch(B=2, L=16)
    out1 = model.apply(params, **batch)["logits"]
    pad = jnp.zeros((2, 4), dtype=jnp.int32)
    batch2 = dict(batch,
                  input_ids=jnp.concatenate([batch["input_ids"], pad + 3], axis=1),
                  attention_mask=jnp.concatenate([batch["attention_mask"], pad], axis=1))
    out2 = model.apply(params, **batch2)["logits"]
    np.testing.assert_allclose(out1, out2, rtol=2e-4, atol=2e-4)


def test_2d_attention_mask(encdec):
    """A full-ones 2-D mask must equal the 1-D all-ones mask; zeroing one
    pair must change the output."""
    model, params = encdec
    batch = _batch()
    B, L = batch["input_ids"].shape
    out1 = model.apply(params, **batch)["encoder_last_hidden_state"]
    mask2d = jnp.ones((B, L, L), dtype=jnp.int32)
    out2 = model.apply(params, **dict(batch, attention_mask=mask2d))[
        "encoder_last_hidden_state"]
    np.testing.assert_allclose(out1, out2, rtol=2e-5, atol=2e-5)
    mask2d = mask2d.at[:, 2, 5].set(0)
    out3 = model.apply(params, **dict(batch, attention_mask=mask2d))[
        "encoder_last_hidden_state"]
    assert not np.allclose(out2[:, 2], out3[:, 2])


def test_position_ids_permutation(encdec):
    """Permuting tokens together with their position_ids is a no-op for the
    encoder up to the same permutation (MLM masked-first reorder safety)."""
    model, params = encdec
    batch = _batch()
    B, L = batch["input_ids"].shape
    pos = jnp.tile(jnp.arange(L)[None], (B, 1))
    out1 = model.apply(params, method="encode",
                       input_ids=batch["input_ids"],
                       attention_mask=batch["attention_mask"],
                       position_ids=pos)
    perm = np.random.default_rng(1).permutation(L)
    out2 = model.apply(params, method="encode",
                       input_ids=batch["input_ids"][:, perm],
                       attention_mask=batch["attention_mask"][:, perm],
                       position_ids=pos[:, perm])
    np.testing.assert_allclose(np.asarray(out1)[:, perm], np.asarray(out2),
                               rtol=2e-4, atol=2e-4)


def test_mlm_head_prefix():
    model = EncoderDecoder(encoder_config=TINY_ENC, decoder_config=TINY_DEC,
                           dtype=jnp.float32, mlm_layer="mlp")
    batch = _batch()
    params = model.init(jax.random.PRNGKey(0), **batch, mlm_prefix_len=4)
    out = model.apply(params, **batch, mlm_prefix_len=4)
    assert out["mlm_logits"].shape == (2, 4, TINY_ENC.vocab_size)


@pytest.mark.parametrize("seed", [0, 7])
def test_decode_cache_matches_full_decoder(seed):
    """Incremental decoding with KV cache must reproduce teacher-forced
    logits step by step — with params from a NON-zero seed too, so a cache
    built from freshly-initialized projections (the init() bug) cannot pass
    by coincidence."""
    model = EncoderDecoder(encoder_config=TINY_ENC, decoder_config=TINY_DEC,
                           dtype=jnp.float32)
    batch = _batch()
    params = model.init(jax.random.PRNGKey(seed), **batch)
    full = model.apply(params, **batch)["logits"]  # (B, Ld, V)

    step_model = DecoderStep(decoder_config=TINY_DEC, dtype=jnp.float32)
    enc = model.apply(params, method="encode",
                      input_ids=batch["input_ids"],
                      attention_mask=batch["attention_mask"])
    step_params = {"params": {"decoder": params["params"]["decoder"]}}
    # build the cache by applying the REAL params (predictor.py does the
    # same): cached_cross_key/value are computed from the trained kernels
    _, cache_vars = step_model.apply(
        step_params, batch["decoder_input_ids"][:, :1], enc,
        batch["attention_mask"], 0, mutable=["cache"])
    cache = cache_vars["cache"]
    Ld = batch["decoder_input_ids"].shape[1]
    for t in range(Ld):
        tok = batch["decoder_input_ids"][:, t:t + 1]
        logits, vars_out = step_model.apply(
            {**step_params, "cache": cache}, tok, enc,
            batch["attention_mask"], t, mutable=["cache"])
        cache = vars_out["cache"]
        # tolerance: reassociation noise through LayerNorms differs between
        # the k=cache-width and k=t softmax reductions (verified ~1e-8 in
        # float64, i.e. no logic divergence)
        np.testing.assert_allclose(np.asarray(logits[:, 0]),
                                   np.asarray(full[:, t]),
                                   rtol=2e-2, atol=2e-3)


@pytest.mark.parametrize("seed", [0, 7])
def test_ancestry_beam_attention_matches_permuted_cache(seed):
    """The row-stable ancestry-masked beam attention (beam_bias path) must
    reproduce per-row decoding with a physically permuted KV cache, under
    arbitrary per-step beam reorderings."""
    from textreact_tpu.inference.beam import ancestor_bias

    B, K, T = 2, 3, 5
    model = EncoderDecoder(encoder_config=TINY_ENC, decoder_config=TINY_DEC,
                           dtype=jnp.float32)
    batch = _batch()
    params = model.init(jax.random.PRNGKey(seed), **batch)
    enc_rows = model.apply(params, method="encode",
                           input_ids=batch["input_ids"],
                           attention_mask=batch["attention_mask"])
    # grouped cross-attention: encoder rows stay per-example (B), queries
    # arrive as B*K rows
    step_params = {"params": {"decoder": params["params"]["decoder"]}}
    step_model = DecoderStep(decoder_config=TINY_DEC, dtype=jnp.float32,
                             cache_len=T, beam_groups=K)
    ref_step_model = DecoderStep(decoder_config=TINY_DEC, dtype=jnp.float32,
                                 cache_len=T)
    rng = np.random.default_rng(3)
    tokens = rng.integers(1, TINY_DEC.vocab_size, (T, B * K)).astype(np.int32)
    parents = rng.integers(0, K, (T, B, K)).astype(np.int32)

    def init_cache(model):
        _, cv = model.apply(step_params,
                            jnp.zeros((B * K, 1), jnp.int32), enc_rows,
                            batch["attention_mask"], 0, mutable=["cache"])
        return cv["cache"]

    # --- reference: physically permute the cache each step, per-row path ---
    def permute_cache(cache, sel):
        flat = (np.arange(B)[:, None] * K + sel).reshape(-1)

        def gather(path, x):
            names = {getattr(p, "key", None) for p in path}
            if "cached_cross_key" in names or "cached_cross_value" in names:
                return x
            return x[flat] if x.ndim >= 1 and x.shape[0] == B * K else x
        import jax.tree_util as jtu
        return jtu.tree_map_with_path(gather, cache)

    # after each step t, beam j adopts the history of parents[t, b, j]; row
    # j of both branches then denotes the SAME hypothesis, so logits compare
    # directly step by step
    cache = init_cache(ref_step_model)
    ref_logits = []
    for t in range(T - 1):
        logits, vo = ref_step_model.apply(
            {**step_params, "cache": cache},
            jnp.asarray(tokens[t][:, None]), enc_rows,
            batch["attention_mask"], t, mutable=["cache"])
        ref_logits.append(np.asarray(logits[:, 0]))
        cache = permute_cache(vo["cache"], parents[t])

    # --- ancestry path: row-stable grouped cache + src table ---
    cache = init_cache(step_model)
    src = np.zeros((B, K, T), dtype=np.int32)
    for t in range(T - 1):
        src[:, :, t] = np.arange(K)[None, :]
        bias = ancestor_bias(jnp.asarray(src), jnp.asarray(t + 1), B, K, T)
        logits, vo = step_model.apply(
            {**step_params, "cache": cache},
            jnp.asarray(tokens[t][:, None]), enc_rows,
            batch["attention_mask"], t, bias, mutable=["cache"])
        cache = vo["cache"]
        np.testing.assert_allclose(np.asarray(logits[:, 0]), ref_logits[t],
                                   rtol=2e-4, atol=2e-4, err_msg=f"step {t}")
        src = src[np.arange(B)[:, None], parents[t]]


def test_segmented_attention_windows_are_invariant():
    """The static attention-window schedule is a pure perf carve-up:
    generation output must be identical for any segmentation."""
    from textreact_tpu.inference.predictor import Generator

    model = EncoderDecoder(encoder_config=TINY_ENC, decoder_config=TINY_DEC,
                           dtype=jnp.float32)
    batch = _batch()
    inputs = {"input_ids": batch["input_ids"],
              "attention_mask": batch["attention_mask"]}
    params = model.init(jax.random.PRNGKey(11), **batch)
    T = 12
    ref_s, ref_sc = Generator(model, params, num_beams=3, max_length=T,
                              attn_windows=[T]).generate(inputs)
    seg_s, seg_sc = Generator(model, params, num_beams=3, max_length=T,
                              attn_windows=[4, 8, T]).generate(inputs)
    np.testing.assert_array_equal(seg_s, ref_s)
    np.testing.assert_allclose(seg_sc, ref_sc, rtol=1e-5, atol=1e-6)


def test_decode_cache_from_init_diverges():
    """Regression guard for the predictor cache bug: a cache created with
    step_model.init (fresh kernels) must NOT reproduce the trained decoder's
    cross-attention — if it does, the parity test above lost its teeth."""
    model = EncoderDecoder(encoder_config=TINY_ENC, decoder_config=TINY_DEC,
                           dtype=jnp.float32)
    batch = _batch()
    params = model.init(jax.random.PRNGKey(7), **batch)
    full = model.apply(params, **batch)["logits"]
    step_model = DecoderStep(decoder_config=TINY_DEC, dtype=jnp.float32)
    enc = model.apply(params, method="encode",
                      input_ids=batch["input_ids"],
                      attention_mask=batch["attention_mask"])
    step_params = {"params": {"decoder": params["params"]["decoder"]}}
    bad_cache = step_model.init(
        jax.random.PRNGKey(0), batch["decoder_input_ids"][:, :1], enc,
        batch["attention_mask"], 0)["cache"]
    logits, _ = step_model.apply(
        {**step_params, "cache": bad_cache},
        batch["decoder_input_ids"][:, :1], enc,
        batch["attention_mask"], 0, mutable=["cache"])
    assert not np.allclose(np.asarray(logits[:, 0]), np.asarray(full[:, 0]),
                           rtol=2e-2, atol=2e-3)


def test_template_model():
    model = TemplateBasedModel(encoder_config=TINY_ENC, num_atom_templates=10,
                               num_bond_templates=6, dtype=jnp.float32)
    B, L, A, MB = 2, 16, 8, 8
    rng = np.random.default_rng(0)
    batch = dict(
        input_ids=jnp.asarray(rng.integers(1, 64, (B, L))),
        attention_mask=jnp.ones((B, L), dtype=jnp.int32),
        atom_indices=jnp.asarray(rng.integers(1, L, (B, A))),
        bond_pairs=jnp.asarray(rng.integers(0, A, (B, MB, 2))),
    )
    params = model.init(jax.random.PRNGKey(0), **batch)
    out = model.apply(params, **batch)
    atom_logits, bond_logits = out["logits"]
    assert atom_logits.shape == (B, A, 11)
    assert bond_logits.shape == (B, MB, 7)
    # factored head parity: logits[b, m] = left(h_i) + right(h_j)
    enc = out["encoder_last_hidden_state"]
    hp = params["params"]["head"]
    atom_states = np.take_along_axis(np.asarray(enc),
                                     np.asarray(batch["atom_indices"])[:, :, None],
                                     axis=1)
    left = atom_states @ np.asarray(hp["bond_head_left"]["kernel"]) + \
        np.asarray(hp["bond_head_left"]["bias"])
    right = atom_states @ np.asarray(hp["bond_head_right"]["kernel"])
    for b in range(B):
        for m in range(MB):
            i, j = np.asarray(batch["bond_pairs"])[b, m]
            np.testing.assert_allclose(np.asarray(bond_logits)[b, m],
                                       left[b, i] + right[b, j],
                                       rtol=1e-4, atol=1e-4)


def test_flash_attention_interpret_mode_matches_xla():
    """Flash path runs under pallas interpret mode on CPU and matches the
    XLA path on real (non-padded) positions."""
    from jax.experimental.pallas import tpu as pltpu
    cfg_x = TINY_ENC.replace(hidden_size=32, max_position_embeddings=128)
    cfg_f = cfg_x.replace(attention_impl="flash")
    from textreact_tpu.models import Encoder
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 64, (2, 128)), jnp.int32)
    mask = jnp.ones((2, 128), jnp.int32).at[:, 100:].set(0)
    enc_x = Encoder(cfg_x, dtype=jnp.float32)
    enc_f = Encoder(cfg_f, dtype=jnp.float32)
    params = enc_x.init(jax.random.PRNGKey(0), ids, attention_mask=mask)
    out_x = np.asarray(enc_x.apply(params, ids, attention_mask=mask))
    with pltpu.force_tpu_interpret_mode():
        out_f = np.asarray(enc_f.apply(params, ids, attention_mask=mask))
    np.testing.assert_allclose(out_x[:, :100], out_f[:, :100],
                               rtol=5e-3, atol=5e-3)


def test_decode_scores_dtype_bf16_matches_f32_selection():
    """Canary for the bf16 QK-score default (models/layers.py grouped
    decode): on a bf16 model, storing scores in bf16 vs float32 must pick
    the same beams and near-identical scores at tiny scale — selection
    runs on f32 log-probs either way, only the attention-score storage
    dtype differs."""
    from textreact_tpu.inference.predictor import Generator

    batch = _batch()
    inputs = {"input_ids": batch["input_ids"],
              "attention_mask": batch["attention_mask"]}
    outs = {}
    for sd in ("bfloat16", "float32"):
        model = EncoderDecoder(
            encoder_config=TINY_ENC,
            decoder_config=TINY_DEC.replace(decode_scores_dtype=sd),
            dtype=jnp.bfloat16)
        params = model.init(jax.random.PRNGKey(21), **batch)
        outs[sd] = Generator(model, params, num_beams=3,
                             max_length=12).generate(inputs)
    np.testing.assert_array_equal(outs["bfloat16"][0], outs["float32"][0])
    np.testing.assert_allclose(outs["bfloat16"][1], outs["float32"][1],
                               rtol=0.02, atol=0.02)
