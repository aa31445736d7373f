"""Dataset mode coverage: test_each_neighbor windows, no_smiles,
train_label_corpus, neighbor aggregation."""

import os
import random

import pytest

from textreact_tpu.config import ExperimentConfig
from textreact_tpu.data import (RetrosynthesisDataset, ConditionDataset,
                                generate_train_label_corpus, read_corpus)
from textreact_tpu.evaluation import gather_prediction_each_neighbor
from textreact_tpu.tokenizers import (ConditionTokenizer,
                                      JointSmilesTextTokenizer,
                                      SmilesTokenizer, WordPieceTokenizer)

from fixtures import make_condition_data, make_retro_data


@pytest.fixture(scope="module")
def retro_root(tmp_path_factory):
    return make_retro_data(str(tmp_path_factory.mktemp("retro_modes")))


@pytest.fixture(scope="module")
def cond_root(tmp_path_factory):
    return make_condition_data(str(tmp_path_factory.mktemp("cond_modes")))


def _retro_cfg(root, **kw):
    base = dict(task="retro", data_path=root, num_neighbors=1, max_length=96,
                max_dec_length=32, encoder_tokenizer="text",
                text_vocab_file=os.path.join(root, "text_vocab.txt"),
                corpus_file=os.path.join(root, "corpus.csv"))
    base.update(kw)
    return ExperimentConfig(**base)


def test_test_each_neighbor_expands_dataset(retro_root):
    cfg = _retro_cfg(retro_root, test_each_neighbor=True, test_num_neighbors=3)
    text_tok = WordPieceTokenizer(cfg.text_vocab_file)
    enc = JointSmilesTextTokenizer(text_tok)
    dec = SmilesTokenizer()
    ds = RetrosynthesisDataset(cfg, os.path.join(retro_root, "test.csv"),
                               enc, dec, split="test")
    ds.load_corpus(read_corpus(cfg.corpus_file),
                   os.path.join(retro_root, "test_nn.json"))
    base_len = len(ds.data_df)
    assert len(ds) == base_len * 3
    # windows shift by one neighbor per expanded index
    ex0 = ds.example(0)
    ex1 = ds.example(1)
    ex3 = ds.example(3)
    assert ex0["id"] == ex1["id"]          # same underlying reaction
    assert ex0["id"] != ex3["id"]          # next reaction
    assert ex0["input_ids"] != ex1["input_ids"]  # different neighbor window


def test_gather_prediction_each_neighbor():
    prediction = {
        0: {"prediction": ["a"], "score": [0.9]},
        1: {"prediction": ["b"], "score": [0.8]},
        2: {"prediction": ["c"], "score": [0.7]},
        3: {"prediction": ["d"], "score": [0.6]},
    }
    out = gather_prediction_each_neighbor(prediction, 2)
    assert out == {
        0: {"prediction": ["a", "b"], "score": [0.9, 0.8]},
        1: {"prediction": ["c", "d"], "score": [0.7, 0.6]},
    }


def test_no_smiles_mode(cond_root):
    cfg = ExperimentConfig(task="condition", data_path=cond_root,
                           num_neighbors=2, no_smiles=True, max_length=96,
                           encoder_tokenizer="text",
                           text_vocab_file=os.path.join(cond_root, "text_vocab.txt"),
                           corpus_file=os.path.join(cond_root, "corpus.csv"))
    text_tok = WordPieceTokenizer(cfg.text_vocab_file)
    enc = JointSmilesTextTokenizer(text_tok)
    ds = ConditionDataset(cfg, os.path.join(cond_root, "train.csv"),
                          enc, ConditionTokenizer(), split="train")
    ds.load_corpus(read_corpus(cfg.corpus_file),
                   os.path.join(cond_root, "train_nn.json"))
    ex = ds.example(0, rng=random.Random(0))
    # encoder input = [CLS] [SEP] + neighbor text only (no reaction tokens)
    assert ex["input_ids"][0] == text_tok.cls_token_id
    assert ex["input_ids"][1] == text_tok.sep_token_id


def test_train_label_corpus(cond_root):
    corpus = generate_train_label_corpus(os.path.join(cond_root, "train.csv"))
    assert len(corpus) == 24
    sample = next(iter(corpus.values()))
    # rxn smiles with conditions spliced between > >
    assert sample.count(">") == 2 and ">>" not in sample or ">>" in sample
    import pandas as pd
    df = pd.read_csv(os.path.join(cond_root, "train.csv"), keep_default_na=False)
    row = df.iloc[0]
    expected_conditions = ".".join(v for v in [row["catalyst1"], row["solvent1"],
                                               row["solvent2"], row["reagent1"],
                                               row["reagent2"]] if v)
    assert corpus[row["id"]] == row["canonical_rxn"].replace(
        ">>", f">{expected_conditions}>")
