"""Beam search oracle tests: fixed per-step distributions with hand-computable
optimal beams; HF semantics (length_penalty=0, finished pool, live fill)."""

import jax
import jax.numpy as jnp
import numpy as np

from textreact_tpu.inference.beam import beam_search

BOS, EOS, PAD = 0, 1, 2
V = 6


def _static_step(logit_table):
    """step_fn emitting a fixed distribution per position (ignores tokens)."""
    table = jnp.asarray(logit_table, dtype=jnp.float32)

    def step_fn(cache, tokens, pos, beam_bias):
        n = tokens.shape[0]
        logits = jnp.tile(table[pos][None, None, :], (n, 1, 1))
        return logits, cache

    return step_fn


def test_greedy_k1_picks_argmax_path():
    # pos0 favors token 3; pos1 favors EOS
    table = np.full((4, V), -10.0)
    table[0, 3] = 0.0
    table[1, EOS] = 0.0
    table[2, EOS] = 0.0
    seqs, scores = beam_search(_static_step(table), {}, batch_size=2,
                               num_beams=1, max_length=4, bos_token_id=BOS,
                               eos_token_id=EOS, pad_token_id=PAD)
    assert seqs.shape == (2, 1, 4)
    np.testing.assert_array_equal(np.asarray(seqs[0, 0]), [BOS, 3, EOS, PAD])


def test_beam_scores_are_logprob_sums():
    # one position then forced EOS; two candidate tokens with known logits
    table = np.full((3, V), -100.0)
    table[0, 3] = 2.0
    table[0, 4] = 1.0
    table[1, EOS] = 0.0
    seqs, scores = beam_search(_static_step(table), {}, batch_size=1,
                               num_beams=2, max_length=3, bos_token_id=BOS,
                               eos_token_id=EOS, pad_token_id=PAD)
    seqs = np.asarray(seqs)[0]
    scores = np.asarray(scores)[0]
    # best beam took token 3, second took token 4
    assert seqs[0, 1] == 3 and seqs[1, 1] == 4
    logp = jax.nn.log_softmax(jnp.asarray(table[0]))
    eos_logp = float(jax.nn.log_softmax(jnp.asarray(table[1]))[EOS])
    np.testing.assert_allclose(scores[0], float(logp[3]) + eos_logp, rtol=1e-5)
    np.testing.assert_allclose(scores[1], float(logp[4]) + eos_logp, rtol=1e-5)
    assert scores[0] > scores[1]


def test_early_eos_beats_longer_path():
    # EOS immediately has logp -0.5; continuing costs more total
    table = np.zeros((4, V))
    table[0] = [-100, -0.5, -100, -1.2, -100, -100]  # EOS vs token 3
    table[1] = [-100, -0.1, -100, -100, -100, -100]  # then must EOS
    seqs, scores = beam_search(_static_step(table), {}, batch_size=1,
                               num_beams=2, max_length=4, bos_token_id=BOS,
                               eos_token_id=EOS, pad_token_id=PAD)
    seqs = np.asarray(seqs)[0]
    # top beam: immediate EOS (higher score than 3->EOS)
    assert seqs[0, 1] == EOS
    assert np.asarray(scores)[0, 0] > np.asarray(scores)[0, 1]


def test_no_eos_fills_from_live_beams():
    # EOS never probable: beams run to max_length, filled from live pool
    table = np.full((3, V), 0.0)
    table[:, EOS] = -1000.0
    seqs, scores = beam_search(_static_step(table), {}, batch_size=1,
                               num_beams=3, max_length=3, bos_token_id=BOS,
                               eos_token_id=EOS, pad_token_id=PAD)
    assert np.isfinite(np.asarray(scores)).all()
    assert (np.asarray(seqs)[0, :, 1:] != EOS).all()


def test_eos_beyond_num_beams_is_dropped():
    """HF semantics: an EOS candidate ranked >= num_beams among the 2K
    candidates never enters the finished pool, even if its score would beat
    the eventual survivors (transformers BeamSearchScorer.process skips it)."""
    table = np.full((4, V), -100.0)
    # step 0: EOS is the 3rd-best candidate (rank 2 >= K=2) but with a score
    # far better than any continued path
    table[0, 3] = 0.1
    table[0, 4] = 0.0
    table[0, EOS] = -0.1
    # later steps: all non-EOS tokens equally likely, EOS impossible
    table[1:, 3] = table[1:, 4] = table[1:, 5] = table[1:, 0] = 0.0
    seqs, scores = beam_search(_static_step(table), {}, batch_size=1,
                               num_beams=2, max_length=4, bos_token_id=BOS,
                               eos_token_id=EOS, pad_token_id=PAD)
    seqs = np.asarray(seqs)[0]
    scores = np.asarray(scores)[0]
    # the dropped immediate-EOS path would score ~-1.2; survivors ~-4.2
    assert (seqs[:, 1] != EOS).all(), seqs
    assert scores[0] < -2.0, scores


def test_batch_independence():
    rng = np.random.default_rng(0)
    table = rng.normal(size=(4, V)).astype(np.float32)
    table[:, EOS] += 1.0
    seqs1, scores1 = beam_search(_static_step(table), {}, batch_size=1,
                                 num_beams=3, max_length=4, bos_token_id=BOS,
                                 eos_token_id=EOS, pad_token_id=PAD)
    seqs3, scores3 = beam_search(_static_step(table), {}, batch_size=3,
                                 num_beams=3, max_length=4, bos_token_id=BOS,
                                 eos_token_id=EOS, pad_token_id=PAD)
    for b in range(3):
        np.testing.assert_array_equal(np.asarray(seqs3)[b], np.asarray(seqs1)[0])
        np.testing.assert_allclose(np.asarray(scores3)[b],
                                   np.asarray(scores1)[0], rtol=1e-6)
