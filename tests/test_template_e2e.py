"""Template-based retrosynthesis end-to-end (train + val + ranked-edit
prediction) with fabricated template artifacts — exercises the
atom/bond-head model, pair-list labels, 2-D bond attention mask, and edit
ranking without RDKit (final SMILES decoding is RDKit-gated and not run)."""

import json
import os
import random

import pandas as pd
import pytest

from textreact_tpu.chem import parse_smiles
from textreact_tpu.config import ExperimentConfig
from textreact_tpu.train.trainer import Trainer

from fixtures import write_text_vocab

TINY_ENC = {
    "vocab_size": 700, "hidden_size": 32, "num_hidden_layers": 2,
    "num_attention_heads": 4, "intermediate_size": 64,
    "max_position_embeddings": 96, "type_vocab_size": 1,
}

PRODUCTS = ["CCO", "CCC", "CCN", "CCOC", "CC(C)O", "CCCN", "CCCC", "COC"]


def _bonds(smiles):
    mol = parse_smiles(smiles)
    out = set()
    for b in mol.bonds:
        out.add((b.a1, b.a2))
        out.add((b.a2, b.a1))
    return sorted(out)


def _make_data(root):
    os.makedirs(root, exist_ok=True)
    rng = random.Random(0)
    pd.DataFrame({"Template": [f"[T{i}]>>[U{i}]" for i in range(4)],
                  "Frequency": [10, 8, 6, 4], "Class": [1, 2, 3, 4]}).to_csv(
        os.path.join(root, "atom_templates.csv"), index=False)
    pd.DataFrame({"Template": [f"[B{i}]>>[V{i}]" for i in range(3)],
                  "Frequency": [9, 7, 5], "Class": [1, 2, 3]}).to_csv(
        os.path.join(root, "bond_templates.csv"), index=False)

    for split, n in [("train", 16), ("val", 6), ("test", 6)]:
        rows, labels, a2c, bonds = [], [], [], []
        for i in range(n):
            prod = rng.choice(PRODUCTS)
            n_atoms = len(parse_smiles(prod).atoms)
            rows.append({"id": f"T{split}{i}", "product_smiles": prod,
                         "reactant_smiles": prod + ".O"})
            b = _bonds(prod)
            if rng.random() < 0.5:
                lab = [("a", rng.randrange(n_atoms), rng.randrange(1, 5))]
            else:
                lab = [("b", tuple(rng.choice(b)), rng.randrange(1, 4))]
            labels.append(lab)
            a2c.append(list(range(n_atoms)))
            bonds.append(b)
        pd.DataFrame({"id": [r["id"] for r in rows],
                      "product_smiles": [r["product_smiles"] for r in rows],
                      "reactant_smiles": [r["reactant_smiles"] for r in rows]}
                     ).to_csv(os.path.join(root, f"{split}.csv"), index=False)
        pd.DataFrame({"Labels": [repr(l) for l in labels],
                      "ProductAtomIdx2CanonIdx": [repr(x) for x in a2c],
                      "ProductCanonBonds": [repr(b) for b in bonds]}).to_csv(
            os.path.join(root, f"preprocessed_{split}.csv"), index=False)
    write_text_vocab(os.path.join(root, "text_vocab.txt"))
    with open(os.path.join(root, "enc.json"), "w") as f:
        json.dump(TINY_ENC, f)
    return root


@pytest.mark.slow
def test_template_based_end_to_end(tmp_path):
    root = _make_data(str(tmp_path / "data"))
    cfg = ExperimentConfig(
        task="retro", template_based=True, unattend_nonbonds=True,
        do_train=True, do_test=True, data_path=root, template_path=root,
        train_file="train.csv", valid_file="val.csv", test_file="test.csv",
        encoder=os.path.join(root, "enc.json"),
        encoder_tokenizer="smiles", vocab_file=None,
        num_neighbors=-1, max_length=64, batch_size=8, test_batch_size=8,
        epochs=2, lr=1e-3, eval_per_epoch=1,
        save_path=os.path.join(root, "out"), compute_dtype="float32",
        dp_size=1, log_every=1, length_buckets=(64,), debug=True,
    ).validate()
    # 'val' split file name is val.csv but preprocessed files use split names
    trainer = Trainer(cfg)
    trainer.prepare_data()
    trainer.fit()

    with open(os.path.join(cfg.save_path, "metrics.jsonl")) as f:
        records = [json.loads(l) for l in f]
    losses = [r["train_loss"] for r in records if "train_loss" in r]
    assert losses and losses[-1] < losses[0]
    val_recs = [r for r in records if "val_acc" in r]
    assert val_recs  # template top-1 accuracy computed via rank_edits

    # ranked-edit predictions (reference test_step template branch)
    state = trainer._load_for_eval()
    loader = trainer._loaders(trainer.test_dataset, eval_mode=True)[0]
    with trainer.mesh:
        preds = trainer._predict(loader, state.params)
    assert len(preds) == 6
    first = next(iter(preds.values()))
    assert first["prediction"], "ranked edit list must be non-empty"
    kind, loc, template = first["prediction"][0]
    assert kind in ("a", "b")
    assert isinstance(first["top1_template_match"], bool)
    assert len(first["prediction"]) == len(first["score"])
    # scores descending
    assert all(a >= b for a, b in zip(first["score"], first["score"][1:]))


@pytest.mark.slow
def test_template_rule_is_learned(tmp_path):
    """Deterministic product->edit rule: atom 0 edited with a class that is
    a function of the molecule — template top-1 val accuracy must approach 1."""
    root = str(tmp_path / "data")
    os.makedirs(root, exist_ok=True)
    rng = random.Random(0)
    prods = ["CCO", "CCN", "CCC", "COC"]
    pd.DataFrame({"Template": [f"[T{i}]>>[U{i}]" for i in range(4)],
                  "Frequency": [10] * 4, "Class": [1, 2, 3, 4]}).to_csv(
        os.path.join(root, "atom_templates.csv"), index=False)
    pd.DataFrame({"Template": ["[B0]>>[V0]"], "Frequency": [5],
                  "Class": [1]}).to_csv(
        os.path.join(root, "bond_templates.csv"), index=False)
    for split, n in [("train", 64), ("val", 16), ("test", 8)]:
        rows, labels, a2c, bonds = [], [], [], []
        for i in range(n):
            prod = rng.choice(prods)
            n_atoms = len(parse_smiles(prod).atoms)
            rows.append({"id": f"T{split}{i}", "product_smiles": prod,
                         "reactant_smiles": prod + ".O"})
            labels.append([("a", 0, prods.index(prod) + 1)])  # the rule
            a2c.append(list(range(n_atoms)))
            bonds.append(_bonds(prod))
        pd.DataFrame(rows).to_csv(os.path.join(root, f"{split}.csv"), index=False)
        pd.DataFrame({"Labels": [repr(l) for l in labels],
                      "ProductAtomIdx2CanonIdx": [repr(x) for x in a2c],
                      "ProductCanonBonds": [repr(b) for b in bonds]}).to_csv(
            os.path.join(root, f"preprocessed_{split}.csv"), index=False)
    with open(os.path.join(root, "enc.json"), "w") as f:
        json.dump(dict(TINY_ENC, hidden_size=64, intermediate_size=128), f)

    cfg = ExperimentConfig(
        task="retro", template_based=True, do_train=True,
        data_path=root, template_path=root,
        train_file="train.csv", valid_file="val.csv", test_file="test.csv",
        encoder=os.path.join(root, "enc.json"), encoder_tokenizer="smiles",
        num_neighbors=-1, max_length=64, batch_size=16, epochs=40, lr=3e-3,
        eval_per_epoch=10, save_path=os.path.join(root, "out"),
        compute_dtype="float32", dp_size=1, log_every=8,
        length_buckets=(64,), debug=True,
    ).validate()
    trainer = Trainer(cfg)
    trainer.prepare_data()
    trainer.fit()
    with open(os.path.join(cfg.save_path, "metrics.jsonl")) as f:
        records = [json.loads(l) for l in f]
    accs = [r["val_acc"] for r in records if "val_acc" in r]
    assert accs and max(accs) >= 0.9, accs


@pytest.mark.slow
def test_template_full_cycle_with_native_decode(tmp_path):
    """The COMPLETE template-based workflow in one run, RDKit-free:
    train -> ranked edits -> native template decode (chem/reaction.py) ->
    retro top-k metric (reference test_step template branch +
    evaluate.py:47-64). Products are esters labeled at their ester bond
    with a real hydrolysis template, so the gold reactants are exactly
    what the decoder must produce."""
    from textreact_tpu.chem.smarts import find_matches, parse_smarts
    from textreact_tpu.evaluation._own_template_apply import apply_ranked_edits

    ester = ("[C:1](=[O:2])-[O;H0;D2;+0:3]>>"
             "[C:1](=[O:2])-[OH;D1;+0:4].[OH;D1;+0:3]")
    info = {"edit_site": {"B": [(1, 3)]},
            "change_H": {1: 0, 2: 0, 3: 1},
            "change_C": {1: 0, 2: 0, 3: 0},
            "change_S": {1: 0, 2: 0, 3: 0}}
    root = str(tmp_path / "data")
    os.makedirs(root, exist_ok=True)
    pd.DataFrame({"Template": [ester], "Frequency": [10], "Class": [1]}
                 ).to_csv(os.path.join(root, "atom_templates.csv"), index=False)
    pd.DataFrame({"Template": [ester], "Frequency": [10], "Class": [1]}
                 ).to_csv(os.path.join(root, "bond_templates.csv"), index=False)
    pd.DataFrame({"Template": [ester], "edit_site": [repr(info["edit_site"])],
                  "change_H": [repr(info["change_H"])],
                  "change_C": [repr(info["change_C"])],
                  "change_S": [repr(info["change_S"])]}).to_csv(
        os.path.join(root, "template_infos.csv"), index=False)

    esters = ["CCOC(C)=O", "COC(C)=O", "CCOC(=O)CC", "COC(=O)CC",
              "CCCOC(C)=O", "CCOC(=O)C(C)C"]
    pattern = parse_smarts("[C:1](=[O:2])-[O;H0;D2;+0:3]")
    rng = random.Random(0)
    for split, n in [("train", 16), ("val", 6), ("test", 6)]:
        rows, labels, a2c, bonds = [], [], [], []
        for i in range(n):
            prod = esters[rng.randrange(len(esters))]
            m = find_matches(pattern, parse_smiles(prod))[0]
            site = (m[0], m[2])
            gold = apply_ranked_edits([("b", site, 1, 1.0)], prod,
                                      {}, {1: ester}, {ester: info}, 1)[0]
            n_atoms = len(parse_smiles(prod).atoms)
            rows.append({"id": f"F{split}{i}", "product_smiles": prod,
                         "reactant_smiles": gold})
            labels.append([("b", site, 1)])
            a2c.append(list(range(n_atoms)))
            bonds.append(_bonds(prod))
        pd.DataFrame({"id": [r["id"] for r in rows],
                      "product_smiles": [r["product_smiles"] for r in rows],
                      "reactant_smiles": [r["reactant_smiles"] for r in rows]}
                     ).to_csv(os.path.join(root, f"{split}.csv"), index=False)
        pd.DataFrame({"Labels": [repr(l) for l in labels],
                      "ProductAtomIdx2CanonIdx": [repr(x) for x in a2c],
                      "ProductCanonBonds": [repr(b) for b in bonds]}).to_csv(
            os.path.join(root, f"preprocessed_{split}.csv"), index=False)
    with open(os.path.join(root, "enc.json"), "w") as f:
        json.dump(TINY_ENC, f)

    cfg = ExperimentConfig(
        task="retro", template_based=True, unattend_nonbonds=True,
        do_train=True, do_test=True, data_path=root, template_path=root,
        train_file="train.csv", valid_file="val.csv", test_file="test.csv",
        encoder=os.path.join(root, "enc.json"), encoder_tokenizer="smiles",
        num_neighbors=-1, max_length=64, batch_size=8, test_batch_size=8,
        epochs=3, lr=3e-3, eval_per_epoch=1, num_beams=20,
        save_path=os.path.join(root, "out"), compute_dtype="float32",
        dp_size=1, log_every=1, length_buckets=(64,), debug=True,
    ).validate()
    trainer = Trainer(cfg)
    trainer.prepare_data()
    trainer.fit()
    results = trainer.test()
    assert results, "test() must return accuracy dicts"
    acc = results[0]
    assert set(acc) == {1, 2, 3, 5, 10, 20}
    # with one decodable template, the gold decode must appear within the
    # top-20 decoded candidates of the ranked edit list
    assert acc[20] >= 0.5, acc
    assert os.path.exists(os.path.join(cfg.save_path, "prediction_test_0.json"))
