"""Curation-layer tests: dedup, splits, vocab, matching, augmentation,
frequency baseline."""

import numpy as np
import pandas as pd

from textreact_tpu.preprocess import (add_corpus_id_column, augment_condition_train,
                                      canonical_rxn_smiles, condition_vocab,
                                      dedup_corpus, frequency_baseline_accuracy,
                                      match_to_corpus, random_split_no_overlap,
                                      reaction_similarity, time_split,
                                      top_condition_tuples, year_resplit)


def _corpus_df():
    return pd.DataFrame({
        "id": ["a", "b", "c", "d"],
        "heading_text": ["", "", "", ""],
        "paragraph_text": ["text one", "text two", "text one", "text three"],
    })


def test_dedup_corpus():
    dedup, id_map = dedup_corpus(_corpus_df())
    assert list(dedup["id"]) == ["a", "b", "d"]
    assert id_map == {"a": "a", "b": "b", "c": "a", "d": "d"}
    df = pd.DataFrame({"id": ["c", "x"], "val": [1, 2]})
    out = add_corpus_id_column(df, id_map)
    assert list(out.columns[:2]) == ["id", "corpus_id"]
    assert list(out["corpus_id"]) == ["a", "x"]


def test_random_split_no_overlap():
    rxns = [f"rxn{i}" for i in range(50)] + ["dup"] * 10
    df = pd.DataFrame({"id": range(60), "canonical_rxn": rxns})
    out = random_split_no_overlap(df, frac=(0.6, 0.2, 0.2), seed=0)
    assert set(out["dataset"]) == {"train", "val", "test"}
    # duplicated reactions must all live in train
    assert (out[out["canonical_rxn"] == "dup"]["dataset"] == "train").all()
    # no rxn overlap between splits
    by_split = {s: set(out[out["dataset"] == s]["canonical_rxn"]) for s in
                ("train", "val", "test")}
    assert not (by_split["train"] & by_split["val"])
    assert not (by_split["train"] & by_split["test"])
    assert not (by_split["val"] & by_split["test"])


def test_time_split():
    df = pd.DataFrame({"source": ["p1", "p2", "p3", "p4"], "x": range(4)})
    years = {"p1": 2010, "p2": 2015, "p3": 2016, "p4": 2012}
    train, val, test = time_split(df, years)
    assert list(train["source"]) == ["p1", "p4"]
    assert list(val["source"]) == ["p2"]
    assert list(test["source"]) == ["p3"]


def test_condition_vocab():
    df = pd.DataFrame({
        "catalyst1": ["", "Pd"], "solvent1": ["CCO", ""], "solvent2": ["", ""],
        "reagent1": ["O", "O"], "reagent2": ["", ""]})
    vocab = condition_vocab(df)
    assert vocab[:6] == ["[PAD]", "[BOS]", "[EOS]", "[MASK]", "[UNK]", "[SEP]"]
    assert "" in vocab and "Pd" in vocab and "CCO" in vocab
    assert vocab[6:] == sorted(vocab[6:])


def test_canonical_rxn_smiles():
    rxn, cr, cp, ok = canonical_rxn_smiles("[CH3:1][OH:2].CC(O)=O>>CC(=O)OC")
    assert ok
    assert ">>" in rxn
    assert ":" not in cr  # atom maps stripped


def test_reaction_similarity_identity():
    rxn = "CCO.CC(=O)O>>CC(=O)OCC"
    assert reaction_similarity(rxn, rxn) == 1.0
    assert reaction_similarity(rxn, "CCN>>CCN") < 1.0


def test_match_to_corpus_exact_and_unk():
    corpus = pd.DataFrame({
        "id": ["US1_0", "US2_0"],
        "source": ["US1", "US2"],
        "canonical_rxn": ["CCO>>CCN", "CC>>CO"],
    })
    split = pd.DataFrame({
        "id": ["US1", "US9"],
        "reactant_smiles": ["CCO", "OCO"],
        "product_smiles": ["CCN", "OCN"],
    })
    out = match_to_corpus(split, corpus, "test")
    assert out["id"].tolist()[0] == "US1_0"
    assert out["id"].tolist()[1].startswith("unk_test_")
    assert out["source"].tolist() == ["US1", "US9"]


def test_year_resplit():
    dfs = [pd.DataFrame({"id": ["P1_0", "P2_0", "P3_0"], "x": [1, 2, 3]})]
    years = {"P1": 2010, "P2": 2012, "P3": 2015}
    train, valid, test = year_resplit(dfs, years)
    assert list(train["id"]) == ["P1_0"]
    assert list(valid["id"]) == ["P2_0"]
    assert list(test["id"]) == ["P3_0"]


def test_augment_condition_train():
    df = pd.DataFrame({"canonical_rxn": ["CCO.CC>>CCOC"], "catalyst1": ["Pd"]})
    out = augment_condition_train(df, n=3, seed=1)
    assert len(out) == 3
    assert (out["catalyst1"] == "Pd").all()
    # augmented rows describe the same reaction
    from textreact_tpu.chem import canonical_smiles
    def canon_rxn(r):
        a, b = r.split(">>")
        return canonical_smiles(a) + ">>" + canonical_smiles(b)
    assert len({canon_rxn(r) for r in out["canonical_rxn"]}) == 1


def test_frequency_baseline():
    train = pd.DataFrame({
        "catalyst1": ["", "", "Pd"], "solvent1": ["CCO", "CCO", ""],
        "solvent2": ["", "", ""], "reagent1": ["", "", ""], "reagent2": ["", "", ""]})
    test = train.iloc[:2].reset_index(drop=True)
    acc = frequency_baseline_accuracy(train, test, k=15)
    assert acc[1] == 1.0  # most frequent tuple matches both test rows
    assert set(acc.keys()) == {1, 3, 5, 10, 15}
