"""Learnability: on a deterministic product->condition mapping the full
pipeline must reach ~perfect greedy val accuracy (exercises data->model->
loss->optimizer->eval end to end, not just plumbing)."""

import json
import os
import random

import pandas as pd
import pytest

from textreact_tpu.config import ExperimentConfig
from textreact_tpu.train.trainer import Trainer

from fixtures import write_text_vocab

RULES = {
    "CCO": ("C1CCCCC1", "BrBr"),
    "CCN": ("BrBr", "C1CCCCC1"),
    "CCC": ("CC(=O)O", ""),
    "COC": ("", "CC(=O)O"),
}

TINY = {"vocab_size": 600, "hidden_size": 64, "num_hidden_layers": 2,
        "num_attention_heads": 4, "intermediate_size": 128,
        "max_position_embeddings": 64, "type_vocab_size": 1}


def _make(root):
    os.makedirs(root, exist_ok=True)
    rng = random.Random(0)
    for split, n in [("train", 64), ("val", 16)]:
        rows = []
        for i in range(n):
            prod = rng.choice(list(RULES))
            cat, rea = RULES[prod]
            rows.append({"id": f"L{split}{i}",
                         "canonical_rxn": f"CC.{prod}>>{prod}",
                         "catalyst1": cat, "solvent1": "", "solvent2": "",
                         "reagent1": rea, "reagent2": ""})
        pd.DataFrame(rows).to_csv(os.path.join(root, f"{split}.csv"), index=False)
    write_text_vocab(os.path.join(root, "text_vocab.txt"))
    with open(os.path.join(root, "enc.json"), "w") as f:
        json.dump(TINY, f)
    with open(os.path.join(root, "dec.json"), "w") as f:
        json.dump(dict(TINY, vocab_size=320, max_position_embeddings=16), f)
    return root


@pytest.mark.slow
def test_condition_rule_is_learned(tmp_path):
    root = _make(str(tmp_path / "data"))
    cfg = ExperimentConfig(
        task="condition", do_train=True,
        data_path=root, train_file="train.csv", valid_file="val.csv",
        test_file="val.csv",
        text_vocab_file=os.path.join(root, "text_vocab.txt"),
        encoder=os.path.join(root, "enc.json"),
        decoder=os.path.join(root, "dec.json"), encoder_tokenizer="smiles",
        num_neighbors=-1, max_length=64, max_dec_length=16,
        batch_size=16, epochs=80, lr=3e-3, eval_per_epoch=20,
        save_path=os.path.join(root, "out"), compute_dtype="float32",
        dp_size=1, log_every=4, length_buckets=(64,), dec_length_buckets=(16,),
        debug=True,
    ).validate()
    trainer = Trainer(cfg)
    trainer.prepare_data()
    trainer.fit()
    with open(os.path.join(cfg.save_path, "metrics.jsonl")) as f:
        records = [json.loads(l) for l in f]
    accs = [r["val_acc"] for r in records if "val_acc" in r]
    assert accs, "no val accuracy logged"
    assert max(accs) >= 0.9, accs
