"""Retrieval-augmentation learnability: conditions are NOT derivable from
the reaction SMILES but ARE spelled out in each reaction's own corpus
paragraph. With gold-neighbor training the model must learn to read the
neighbor text; the dual-corpus eval must then show high accuracy with the
full corpus and chance-level accuracy with the gold paragraph removed —
the core TextReact mechanism (reference README.md:68-71) end to end."""

import json
import os
import random

import pandas as pd
import pytest

from textreact_tpu.config import ExperimentConfig
from textreact_tpu.train.trainer import Trainer

from fixtures import write_text_vocab

TUPLES = [
    ("C1CCCCC1", "BrBr"),
    ("BrBr", "C1CCCCC1"),
    ("CC(=O)O", ""),
    ("", "CC(=O)O"),
]

TINY = {"vocab_size": 700, "hidden_size": 64, "num_hidden_layers": 2,
        "num_attention_heads": 4, "intermediate_size": 128,
        "max_position_embeddings": 96, "type_vocab_size": 1}


def _make(root):
    os.makedirs(root, exist_ok=True)
    rng = random.Random(0)
    corpus_rows = []
    for split, n in [("train", 96), ("val", 16)]:
        rows = []
        for i in range(n):
            rid = f"R{split}{i}"
            rule = rng.randrange(4)
            cat, rea = TUPLES[rule]
            # the reaction itself carries no signal; the paragraph does
            rows.append({"id": rid, "canonical_rxn": "CC.CC>>CC",
                         "catalyst1": cat, "solvent1": "", "solvent2": "",
                         "reagent1": rea, "reagent2": ""})
            corpus_rows.append({"id": rid, "heading_text": "",
                                "paragraph_text": f"prepared with acid {rule}"})
        pd.DataFrame(rows).to_csv(os.path.join(root, f"{split}.csv"), index=False)
        # neighbor files: gold first, then unrelated neighbors
        ids = [r["id"] for r in rows]
        nn = [{"id": rid, "nn": [rid] + [x for x in ids[:6] if x != rid][:4]}
              for rid in ids]
        with open(os.path.join(root, f"{split}_nn.json"), "w") as f:
            json.dump(nn, f)
    pd.DataFrame(corpus_rows).to_csv(os.path.join(root, "corpus.csv"), index=False)
    write_text_vocab(os.path.join(root, "text_vocab.txt"))
    with open(os.path.join(root, "enc.json"), "w") as f:
        json.dump(TINY, f)
    with open(os.path.join(root, "dec.json"), "w") as f:
        json.dump(dict(TINY, vocab_size=320, max_position_embeddings=16), f)
    return root


@pytest.mark.slow
def test_model_learns_to_read_neighbor_text(tmp_path):
    root = _make(str(tmp_path / "data"))
    cfg = ExperimentConfig(
        task="condition", do_train=True,
        data_path=root, train_file="train.csv", valid_file="val.csv",
        test_file="val.csv", corpus_file=os.path.join(root, "corpus.csv"),
        nn_path=root, train_nn_file="train_nn.json",
        valid_nn_file="val_nn.json", test_nn_file="val_nn.json",
        text_vocab_file=os.path.join(root, "text_vocab.txt"),
        encoder=os.path.join(root, "enc.json"),
        decoder=os.path.join(root, "dec.json"), encoder_tokenizer="text",
        num_neighbors=1, use_gold_neighbor=True, random_neighbor_ratio=0.0,
        max_length=96, max_dec_length=16,
        batch_size=16, epochs=60, lr=3e-3, eval_per_epoch=20,
        save_path=os.path.join(root, "out"), compute_dtype="float32",
        dp_size=1, log_every=8, length_buckets=(96,), dec_length_buckets=(16,),
        debug=True,
    ).validate()
    trainer = Trainer(cfg)
    trainer.prepare_data()
    trainer.fit()
    with open(os.path.join(cfg.save_path, "metrics.jsonl")) as f:
        records = [json.loads(l) for l in f]
    full = [r["val_acc"] for r in records if "val_acc" in r]
    removed = [r["val_acc/1"] for r in records if "val_acc/1" in r]
    assert full and removed
    # with the gold paragraph retrievable the rule is learnable...
    assert max(full) >= 0.9, full
    # ...and removing it (dual-corpus eval) collapses accuracy to ~chance
    best_epoch = full.index(max(full))
    assert removed[best_epoch] <= 0.6, (full, removed)
