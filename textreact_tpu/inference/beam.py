"""jit-compiled beam search with KV cache.

Replaces HF `model.generate(num_beams, length_penalty=0, ...)` (reference
main.py:218-223). Semantics matched to HF beam search with length_penalty=0
and early_stopping=False:

- scores are raw log-prob sums (no length normalization);
- a beam ending in EOS moves to the finished pool; search stops when the
  worst finished score cannot be beaten by any live beam (log-probs are
  <= 0, so a live beam's score only decreases) or at max_length;
- unfinished slots at termination are filled from live beams, best first.

The whole loop is a lax.while_loop over a static max_length with a fixed
beam count, so one compilation serves every batch (static shapes; XLA
compiles the step once).
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

NEG_INF = -1.0e7


NEG_INF_BIAS = -1.0e9  # attention-bias masking (matches models/layers.py)


def ancestor_bias(src: Array, cur_len: Array, B: int, K: int, T: int) -> Array:
    """(B, K, T*K) additive attention bias from the ancestor table, merged
    KV axis in (t, g) order matching the grouped beam cache layout
    (models/layers.py: cached_key (B, H, T, G, D)).

    src[b, j, t] = cache ROW holding beam j's key/value at position t. The
    KV cache is never permuted when beams reorder (XLA moves the multi-GB
    gather at ~10% of HBM bandwidth — it was 91% of the decode step at
    retro scale); instead each beam attends over all T*K cache slots of its
    example and this bias admits exactly one row per valid position: its
    ancestor's. Softmax over the masked T*K axis therefore equals softmax
    over the beam's own history."""
    rows = jnp.arange(K)
    valid = src[:, :, :, None] == rows[None, None, None, :]      # (B,K,T,K)
    valid = valid & (jnp.arange(T)[None, None, :, None] < cur_len)
    return jnp.where(valid.reshape(B, K, T * K), 0.0, NEG_INF_BIAS)


def _plan_windows(T: int, user) -> list:
    """Static attention-window schedule: early decode steps attend over a
    prefix slice of the cache (the bias width tells the attention how much
    to read), so per-step HBM traffic tracks the decoded length instead of
    the cache capacity. Short caches get a single window."""
    if user is not None:
        ws = sorted({min(int(w), T) for w in user})
        return ws if ws and ws[-1] == T else ws + [T]
    if T <= 48:
        return [T]
    quarter = max(16, -(-T // 4 // 16) * 16)
    half = max(quarter, -(-T // 2 // 16) * 16)
    return [w for w in (quarter, half) if w < T] + [T]


def beam_search(
    step_fn: Callable[[Any, Array, Array], Tuple[Array, Any]],
    init_cache: Any,
    batch_size: int,
    num_beams: int,
    max_length: int,
    bos_token_id: int,
    eos_token_id: int,
    pad_token_id: int,
    attn_windows=None,
) -> Tuple[Array, Array]:
    """Returns (sequences (B, K, max_length), scores (B, K)) best-first.

    step_fn(cache, tokens (B*K, 1), position, beam_bias) ->
        (logits (B*K, 1, V), cache).

    The KV cache is row-stable: beams reordering never permutes it. The
    (B, K, T) ancestor table `src` tracks which row holds each beam's
    history at each position, and ancestor_bias() turns it into the
    attention mask consumed by the decoder's grouped beam attention. The
    decode runs as chained while_loops over a static window schedule
    (_plan_windows): within a segment the bias spans window*K columns and
    the attention reads only that cache prefix.
    """
    B, K, T = batch_size, num_beams, max_length

    live_seqs = jnp.full((B, K, T), pad_token_id, dtype=jnp.int32)
    live_seqs = live_seqs.at[:, :, 0].set(bos_token_id)
    # only beam 0 is a real hypothesis at the start
    live_scores = jnp.tile(jnp.array([0.0] + [NEG_INF] * (K - 1)), (B, 1))
    fin_seqs = jnp.full((B, K, T), pad_token_id, dtype=jnp.int32)
    fin_scores = jnp.full((B, K), NEG_INF)
    fin_flags = jnp.zeros((B, K), dtype=jnp.bool_)
    src = jnp.zeros((B, K, T), dtype=jnp.int32)

    def make_cond(limit: int, last: bool):
        def cond(state):
            cur_len, live_seqs, live_scores, fin_seqs, fin_scores, fin_flags, src, cache = state
            not_max = cur_len < T if last else cur_len <= limit
            # early_stopping=False heuristic: a live beam can still enter
            # the finished pool iff its (non-increasing) score beats the
            # worst finished score or a slot is empty
            worst_fin = jnp.where(fin_flags, fin_scores, NEG_INF).min(axis=1)
            best_live = live_scores.max(axis=1)
            improvable = jnp.any((best_live > worst_fin) | ~fin_flags.all(axis=1))
            return not_max & improvable
        return cond

    def make_body(window: int):
        return lambda state: body(state, window)

    def body(state, window: int):
        cur_len, live_seqs, live_scores, fin_seqs, fin_scores, fin_flags, src, cache = state
        # the token fed at cur_len-1 belongs to live beam j and its K/V are
        # written to cache row j
        src = jax.lax.dynamic_update_slice_in_dim(
            src, jnp.tile(jnp.arange(K, dtype=jnp.int32)[None, :, None], (B, 1, 1)),
            cur_len - 1, axis=2)
        beam_bias = ancestor_bias(src[:, :, :window], cur_len, B, K, window)
        tokens = jax.lax.dynamic_slice_in_dim(live_seqs, cur_len - 1, 1, axis=2)
        logits, cache = step_fn(cache, tokens.reshape(B * K, 1), cur_len - 1,
                                beam_bias)
        V = logits.shape[-1]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        logp = logp.reshape(B, K, V)

        cand = live_scores[:, :, None] + logp              # (B, K, V)
        flat = cand.reshape(B, K * V)
        topv, topi = jax.lax.top_k(flat, 2 * K)            # (B, 2K)
        beam_idx = topi // V
        tok_idx = topi % V

        # candidate sequences with the new token written at cur_len
        cand_seqs = jnp.take_along_axis(live_seqs, beam_idx[:, :, None], axis=1)
        cand_seqs = jax.lax.dynamic_update_slice_in_dim(
            cand_seqs, tok_idx[:, :, None].astype(jnp.int32), cur_len, axis=2)
        is_eos = tok_idx == eos_token_id

        # --- next live beams: best K non-eos candidates ---
        live_cand_scores = jnp.where(is_eos, NEG_INF, topv)
        new_live_scores, live_sel = jax.lax.top_k(live_cand_scores, K)
        new_live_seqs = jnp.take_along_axis(cand_seqs, live_sel[:, :, None], axis=1)
        live_beam_sel = jnp.take_along_axis(beam_idx, live_sel, axis=1)
        # beams fork/reorder by inheriting the parent's ancestor ROWS — the
        # cache itself is never touched
        src = jnp.take_along_axis(src, live_beam_sel[:, :, None], axis=1)

        # --- finished pool: merge eos candidates ---
        # HF semantics: only EOS candidates ranked < num_beams among the 2K
        # (score-sorted) candidates enter the finished pool
        # (transformers BeamSearchScorer.process: beam_token_rank >= group_size
        # -> skip); lower-ranked EOS candidates are dropped entirely.
        rank = jnp.arange(2 * K)[None, :]
        eos_kept = is_eos & (rank < K)
        fin_cand_scores = jnp.where(eos_kept, topv, NEG_INF)
        all_scores = jnp.concatenate([fin_scores, fin_cand_scores], axis=1)
        all_flags = jnp.concatenate(
            [fin_flags, eos_kept], axis=1)
        all_seqs = jnp.concatenate([fin_seqs, cand_seqs], axis=1)
        new_fin_scores, fin_sel = jax.lax.top_k(all_scores, K)
        new_fin_seqs = jnp.take_along_axis(all_seqs, fin_sel[:, :, None], axis=1)
        new_fin_flags = jnp.take_along_axis(all_flags, fin_sel, axis=1)

        return (cur_len + 1, new_live_seqs, new_live_scores, new_fin_seqs,
                new_fin_scores, new_fin_flags, src, cache)

    state = (jnp.asarray(1, jnp.int32), live_seqs, live_scores, fin_seqs,
             fin_scores, fin_flags, src, init_cache)
    windows = _plan_windows(T, attn_windows)
    for wi, W in enumerate(windows):
        last = wi == len(windows) - 1
        state = jax.lax.while_loop(make_cond(W, last), make_body(min(W, T)),
                                   state)
    (_, live_seqs, live_scores, fin_seqs, fin_scores, fin_flags, _, _) = state

    # HF finalize: live beams join the finished pool, best K overall win
    all_scores = jnp.concatenate(
        [jnp.where(fin_flags, fin_scores, NEG_INF), live_scores], axis=1)
    all_seqs = jnp.concatenate([fin_seqs, live_seqs], axis=1)
    final_scores, sel = jax.lax.top_k(all_scores, K)
    final_seqs = jnp.take_along_axis(all_seqs, sel[:, :, None], axis=1)
    return final_seqs, final_scores
