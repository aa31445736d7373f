"""Retrieval engine edge cases: tiny corpora, k > N, duplicate queries,
neighbor-file building."""

import numpy as np

from textreact_tpu.ops.topk import BIG, numpy_reference_topk
from textreact_tpu.retrieval import FlatIndex, build_neighbor_file


def test_corpus_smaller_than_k():
    corpus = (np.random.default_rng(0).random((5, 128)) < 0.2).astype(np.int8)
    queries = corpus[:3]
    index = FlatIndex(corpus, tile_q=8, tile_c=8)
    vals, idx = index.search(queries, k=20)
    # first 5 slots are the real corpus, remainder are BIG sentinels
    for row in idx:
        assert sorted(row[:5]) == list(range(5))
        assert (row[5:] >= BIG).all()


def test_single_row_corpus():
    corpus = np.ones((1, 128), dtype=np.int8)
    queries = np.zeros((2, 128), dtype=np.int8)
    index = FlatIndex(corpus, tile_q=8, tile_c=8)
    vals, idx = index.search(queries, k=3)
    assert (idx[:, 0] == 0).all()
    assert (vals[:, 0] == 128).all()  # L2^2 = 128 differing bits


def test_duplicate_queries_identical_results():
    corpus = (np.random.default_rng(1).random((64, 128)) < 0.2).astype(np.int8)
    q = corpus[7:8]
    queries = np.repeat(q, 4, axis=0)
    index = FlatIndex(corpus, tile_q=8, tile_c=16)
    vals, idx = index.search(queries, k=5)
    for row in range(1, 4):
        np.testing.assert_array_equal(idx[0], idx[row])
    assert idx[0, 0] == 7 and vals[0, 0] == 0


def test_build_neighbor_file_filters_padding():
    corpus = (np.random.default_rng(2).random((6, 128)) < 0.2).astype(np.int8)
    index = FlatIndex(corpus, tile_q=8, tile_c=8)
    train_ids = [f"id{i}" for i in range(6)]
    records = build_neighbor_file(["q0", "q1"], train_ids, index, corpus[:2],
                                  k=10)
    assert [r["id"] for r in records] == ["q0", "q1"]
    for r in records:
        assert len(r["nn"]) == 6          # sentinel indices dropped
        assert set(r["nn"]) == set(train_ids)
    assert records[0]["nn"][0] == "id0"   # self-match first


def test_multiple_banned_columns():
    corpus = (np.random.default_rng(3).random((40, 128)) < 0.2).astype(np.int8)
    queries = corpus[:4]
    banned = np.stack([np.arange(4), np.arange(4) + 10], axis=1).astype(np.int32)
    index = FlatIndex(corpus, tile_q=8, tile_c=8)
    vals, idx = index.search(queries, k=8, banned=banned)
    ref_vals, ref_idx = numpy_reference_topk(queries, corpus, 8, banned)
    np.testing.assert_array_equal(idx, ref_idx)
    for i in range(4):
        assert i not in idx[i] and (i + 10) not in idx[i]
