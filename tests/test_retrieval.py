"""Retrieval engine tests: kernel vs brute-force parity, tie order, masking,
sharded merge on the fake 8-device CPU mesh."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from textreact_tpu.ops.topk import numpy_reference_topk
from textreact_tpu.retrieval import CORPUS_AXIS, FlatIndex


def _random_fps(n, d=256, seed=0, binary=True):
    rng = np.random.default_rng(seed)
    if binary:
        return (rng.random((n, d)) < 0.1).astype(np.int8)
    return rng.integers(-5, 6, (n, d)).astype(np.int8)


def test_kernel_matches_bruteforce_single_device():
    corpus = _random_fps(600, seed=1)
    queries = _random_fps(40, seed=2)
    index = FlatIndex(corpus, mesh=None, tile_q=8, tile_c=128)
    vals, idx = index.search(queries, k=20)
    ref_vals, ref_idx = numpy_reference_topk(queries, corpus, 20)
    np.testing.assert_array_equal(vals, ref_vals)
    np.testing.assert_array_equal(idx, ref_idx)


def test_tie_order_lowest_index_first():
    # many duplicate corpus rows -> heavy ties; faiss rule: lower index wins
    base = _random_fps(8, seed=3)
    corpus = np.repeat(base, 16, axis=0)          # 128 rows, blocks of ties
    perm = np.random.default_rng(0).permutation(len(corpus))
    corpus = corpus[perm]
    queries = base[:4]
    index = FlatIndex(corpus, mesh=None, tile_q=8, tile_c=32)
    vals, idx = index.search(queries, k=20)
    ref_vals, ref_idx = numpy_reference_topk(queries, corpus, 20)
    np.testing.assert_array_equal(vals, ref_vals)
    np.testing.assert_array_equal(idx, ref_idx)


def test_banned_ids_masked_topk():
    corpus = _random_fps(300, seed=4)
    queries = corpus[:16]  # self-queries: nearest is the query itself
    index = FlatIndex(corpus, mesh=None, tile_q=8, tile_c=128)
    _, idx_plain = index.search(queries, k=5)
    assert (idx_plain[:, 0] == np.arange(16)).all()
    banned = np.arange(16, dtype=np.int32)[:, None]
    vals, idx = index.search(queries, k=5, banned=banned)
    assert not (idx[:, 0] == np.arange(16)).any()
    ref_vals, ref_idx = numpy_reference_topk(queries, corpus, 5, banned)
    np.testing.assert_array_equal(idx, ref_idx)
    np.testing.assert_array_equal(vals, ref_vals)


def test_sharded_search_matches_bruteforce():
    devices = np.array(jax.devices()[:8])
    assert devices.size == 8, "conftest must provide 8 fake CPU devices"
    mesh = Mesh(devices, (CORPUS_AXIS,))
    corpus = _random_fps(1000, seed=5)
    queries = _random_fps(30, seed=6)
    index = FlatIndex(corpus, mesh=mesh, tile_q=8, tile_c=32)
    vals, idx = index.search(queries, k=20)
    ref_vals, ref_idx = numpy_reference_topk(queries, corpus, 20)
    np.testing.assert_array_equal(vals, ref_vals)
    np.testing.assert_array_equal(idx, ref_idx)


def test_sharded_search_with_banned():
    devices = np.array(jax.devices()[:4])
    mesh = Mesh(devices, (CORPUS_AXIS,))
    corpus = _random_fps(256, seed=7)
    queries = corpus[:8]
    banned = np.arange(8, dtype=np.int32)[:, None]
    index = FlatIndex(corpus, mesh=mesh, tile_q=8, tile_c=16)
    vals, idx = index.search(queries, k=10, banned=banned)
    ref_vals, ref_idx = numpy_reference_topk(queries, corpus, 10, banned)
    np.testing.assert_array_equal(idx, ref_idx)
    np.testing.assert_array_equal(vals, ref_vals)


def test_count_vectors_negative_values():
    # reaction difference fingerprints carry negative int8 counts
    corpus = _random_fps(200, d=256, seed=8, binary=False)
    queries = _random_fps(12, d=256, seed=9, binary=False)
    index = FlatIndex(corpus, mesh=None, tile_q=8, tile_c=64)
    vals, idx = index.search(queries, k=7)
    ref_vals, ref_idx = numpy_reference_topk(queries, corpus, 7)
    np.testing.assert_array_equal(vals, ref_vals)
    np.testing.assert_array_equal(idx, ref_idx)


def test_corpus_resident_layout_matches_bruteforce():
    from textreact_tpu.ops.topk import (corpus_norms_padded, exact_topk_l2,
                                        pad_matrix)
    import jax.numpy as jnp
    corpus = _random_fps(512, d=256, seed=11)
    queries = _random_fps(128, d=256, seed=12)
    cp = pad_matrix(corpus, 64)
    norms = corpus_norms_padded(cp, len(corpus))
    banned = np.full((128, 1), -1, dtype=np.int32)
    vals, idx = exact_topk_l2(jnp.asarray(queries), jnp.asarray(cp),
                              jnp.asarray(norms), jnp.asarray(banned),
                              k=10, tile_q=8, tile_c=64, interpret=True,
                              corpus_resident=True)
    ref_vals, ref_idx = numpy_reference_topk(queries, corpus, 10)
    np.testing.assert_array_equal(np.asarray(vals), ref_vals)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)


def test_corpus_resident_with_banned():
    from textreact_tpu.ops.topk import (corpus_norms_padded, exact_topk_l2,
                                        pad_matrix)
    import jax.numpy as jnp
    corpus = _random_fps(256, d=128, seed=13)
    queries = np.ascontiguousarray(corpus[:64])
    cp = pad_matrix(corpus, 32)
    norms = corpus_norms_padded(cp, len(corpus))
    banned = np.arange(64, dtype=np.int32)[:, None]
    vals, idx = exact_topk_l2(jnp.asarray(queries), jnp.asarray(cp),
                              jnp.asarray(norms), jnp.asarray(banned),
                              k=5, tile_q=8, tile_c=32, interpret=True,
                              corpus_resident=True)
    ref_vals, ref_idx = numpy_reference_topk(queries, corpus, 5, banned)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    np.testing.assert_array_equal(np.asarray(vals), ref_vals)


def test_corpus_resident_auto_rule(monkeypatch):
    """FlatIndex(corpus_resident=None) picks the layout by corpus size via
    the measured CORPUS_RESIDENT_MIN_N crossover; explicit args override."""
    from textreact_tpu.retrieval import engine as eng

    corpus = _random_fps(600, seed=21)
    # below the crossover: auto -> query-outer
    assert FlatIndex(corpus, tile_q=8, tile_c=128).corpus_resident is False
    # at/above the crossover: auto -> corpus-resident
    monkeypatch.setattr(eng, "CORPUS_RESIDENT_MIN_N", 600)
    assert eng.FlatIndex(corpus, tile_q=8, tile_c=128).corpus_resident is True
    monkeypatch.setattr(eng, "CORPUS_RESIDENT_MIN_N", 601)
    assert eng.FlatIndex(corpus, tile_q=8, tile_c=128).corpus_resident is False
    # explicit override beats the rule either way
    assert eng.FlatIndex(corpus, tile_q=8, tile_c=128,
                         corpus_resident=True).corpus_resident is True
    monkeypatch.setattr(eng, "CORPUS_RESIDENT_MIN_N", 1)
    assert eng.FlatIndex(corpus, tile_q=8, tile_c=128,
                         corpus_resident=False).corpus_resident is False
