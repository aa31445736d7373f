"""Synthetic tiny-dataset fixtures shared across tests."""

import json
import os
import random

import pandas as pd

MOLS = ["CCO", "CCN", "CCC", "c1ccccc1", "CC(=O)O", "CCOC(C)=O", "CC(C)O",
        "C1CCCCC1", "COc1ccccc1", "CC(N)=O", "ClCCl", "BrCCBr"]
CONDS = ["", "C1CCCCC1", "BrBr", "CC(=O)O", "ClCCl"]

TEXT_VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
              "the", "product", "was", "prepared", "from", "compound",
              "##s", "by", "heating", "with", "acid", "solvent", "at",
              "room", "temperature", ".", ",", "(", ")", "0", "1", "2", "3"]


def write_text_vocab(path):
    with open(path, "w") as f:
        f.write("\n".join(TEXT_VOCAB) + "\n")
    return path


def make_condition_data(root, n_train=24, n_val=8, n_test=8, seed=0):
    """Create train/val/test CSVs, a corpus CSV, and nn jsons for the RCR task."""
    rng = random.Random(seed)
    os.makedirs(root, exist_ok=True)
    all_ids = []

    def make_split(name, n, id_offset):
        rows = []
        for i in range(n):
            rid = f"US{id_offset + i:05d}"
            all_ids.append(rid)
            r1, r2, p = rng.choice(MOLS), rng.choice(MOLS), rng.choice(MOLS)
            rows.append({
                "id": rid,
                "canonical_rxn": f"{r1}.{r2}>>{p}",
                "catalyst1": rng.choice(CONDS),
                "solvent1": rng.choice(CONDS),
                "solvent2": rng.choice(CONDS),
                "reagent1": rng.choice(CONDS),
                "reagent2": rng.choice(CONDS),
                "year": rng.randrange(1990, 2016),
            })
        df = pd.DataFrame(rows)
        df.to_csv(os.path.join(root, f"{name}.csv"), index=False)
        return df

    train_df = make_split("train", n_train, 0)
    val_df = make_split("val", n_val, 1000)
    test_df = make_split("test", n_test, 2000)

    corpus_rows = []
    for rid in all_ids:
        corpus_rows.append({
            "id": rid,
            "heading_text": f"example {rid}",
            "paragraph_text": f"the product was prepared from compound {rid} "
                              f"by heating with acid at room temperature.",
        })
    pd.DataFrame(corpus_rows).to_csv(os.path.join(root, "corpus.csv"), index=False)

    train_ids = train_df["id"].tolist()
    for name, df in [("train", train_df), ("val", val_df), ("test", test_df)]:
        nn = []
        for rid in df["id"]:
            cands = [rid] if name == "train" else []
            others = [t for t in train_ids if t != rid]
            rng.shuffle(others)
            cands += others[:10]
            nn.append({"id": rid, "nn": cands})
        with open(os.path.join(root, f"{name}_nn.json"), "w") as f:
            json.dump(nn, f)

    write_text_vocab(os.path.join(root, "text_vocab.txt"))
    return root


def make_retro_data(root, n_train=16, n_val=6, n_test=6, seed=0):
    """Create train/valid/test CSVs + corpus + nn for template-free retro."""
    rng = random.Random(seed)
    os.makedirs(root, exist_ok=True)
    all_ids = []

    def make_split(name, n, id_offset):
        rows = []
        for i in range(n):
            rid = f"RX{id_offset + i:05d}"
            all_ids.append(rid)
            prod = rng.choice(MOLS)
            reac = ".".join(sorted({rng.choice(MOLS), rng.choice(MOLS)}))
            rows.append({"id": rid, "product_smiles": prod,
                         "reactant_smiles": reac,
                         "year": rng.randrange(1990, 2016)})
        df = pd.DataFrame(rows)
        df.to_csv(os.path.join(root, f"{name}.csv"), index=False)
        return df

    train_df = make_split("train", n_train, 0)
    make_split("valid", n_val, 1000)
    make_split("test", n_test, 2000)

    # vary paragraph wording with in-vocab tokens so different neighbors
    # produce different token ids even under the tiny test vocab
    variants = ["prepared from compound", "prepared by heating with acid",
                "prepared with solvent at room temperature",
                "prepared by heating ( 0 1 2 )"]
    corpus_rows = [{"id": rid, "heading_text": "",
                    "paragraph_text": f"compound {i % 4} was {variants[i % len(variants)]}."}
                   for i, rid in enumerate(all_ids)]
    pd.DataFrame(corpus_rows).to_csv(os.path.join(root, "corpus.csv"), index=False)

    train_ids = train_df["id"].tolist()
    for name in ["train", "valid", "test"]:
        df = pd.read_csv(os.path.join(root, f"{name}.csv"))
        nn = []
        for rid in df["id"]:
            others = [t for t in train_ids if t != rid]
            rng.shuffle(others)
            nn.append({"id": rid, "nn": ([rid] if name == "train" else []) + others[:8]})
        with open(os.path.join(root, f"{name}_nn.json"), "w") as f:
            json.dump(nn, f)
    write_text_vocab(os.path.join(root, "text_vocab.txt"))
    return root
