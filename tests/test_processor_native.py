"""TemplateProcessor end-to-end on the native engine: synthetic mapped
reactions -> extract pass -> label pass -> CSV artifacts -> gold-label
decode through evaluation.template_decode (the exact artifact contract
data/templates.py and the eval pipeline consume; reference
get_templates.py:140-406 + evaluate.py:47-64)."""

import ast
import os

import pandas as pd
import pytest

from textreact_tpu.chem import canonical_smiles, parse_smiles
from textreact_tpu.evaluation.template_decode import decode_template_predictions
from textreact_tpu.templates.native_extractor import demapped_canonical
from textreact_tpu.templates.processor import TemplateProcessor

ESTERS = [
    "[CH3:1][C:2](=[O:3])[OH:4].[CH3:5][OH:6]>>"
    "[CH3:1][C:2](=[O:3])[O:6][CH3:5]",
    "[CH3:1][CH2:7][C:2](=[O:3])[OH:4].[CH3:5][OH:6]>>"
    "[CH3:1][CH2:7][C:2](=[O:3])[O:6][CH3:5]",
    "[CH3:1][C:2](=[O:3])[OH:4].[CH3:8][CH2:5][OH:6]>>"
    "[CH3:1][C:2](=[O:3])[O:6][CH2:5][CH3:8]",
]
AMIDES = [
    "[CH3:1][C:2](=[O:3])[OH:4].[NH2:5][CH3:6]>>"
    "[CH3:1][C:2](=[O:3])[NH:5][CH3:6]",
    "[CH3:1][CH2:7][C:2](=[O:3])[OH:4].[NH2:5][CH3:6]>>"
    "[CH3:1][CH2:7][C:2](=[O:3])[NH:5][CH3:6]",
    "[CH3:1][C:2](=[O:3])[OH:4].[NH2:5][CH2:6][CH3:7]>>"
    "[CH3:1][C:2](=[O:3])[NH:5][CH2:6][CH3:7]",
]
SN2 = [
    "[Br:9][CH2:1][CH3:2].[NH2:3][CH3:4]>>[CH2:1]([CH3:2])[NH:3][CH3:4]",
    "[Br:9][CH2:1][CH2:5][CH3:2].[NH2:3][CH3:4]>>"
    "[CH2:1]([CH2:5][CH3:2])[NH:3][CH3:4]",
    "[Br:9][CH2:1][CH3:2].[NH2:3][CH2:4][CH3:6]>>"
    "[CH2:1]([CH3:2])[NH:3][CH2:4][CH3:6]",
]
ELIMINATIONS = [
    "[CH3:1][CH:2]([OH:5])[CH3:3]>>[CH3:1][CH:2]=[CH2:3]",
    "[CH3:1][CH2:6][CH:2]([OH:5])[CH3:3]>>[CH3:1][CH2:6][CH:2]=[CH2:3]",
    "[CH3:1][CH:2]([OH:5])[CH2:3][CH3:6]>>[CH3:1][CH:2]=[CH:3][CH3:6]",
]

TRAIN = ESTERS + AMIDES + SN2 + ELIMINATIONS
VAL = [
    "[CH3:1][CH2:9][C:2](=[O:3])[OH:4].[CH3:8][CH2:5][OH:6]>>"
    "[CH3:1][CH2:9][C:2](=[O:3])[O:6][CH2:5][CH3:8]",
    "[Br:9][CH2:1][CH3:2].[NH2:3][CH2:4][CH2:6][CH3:7]>>"
    "[CH2:1]([CH3:2])[NH:3][CH2:4][CH2:6][CH3:7]",
]
TEST = [
    "[CH3:1][CH2:10][C:2](=[O:3])[OH:4].[NH2:5][CH3:6]>>"
    "[CH3:1][CH2:10][C:2](=[O:3])[NH:5][CH3:6]",
    "[CH3:1][CH:2]([OH:5])[CH2:3][CH2:6][CH3:7]>>"
    "[CH3:1][CH:2]=[CH:3][CH2:6][CH3:7]",
]


def _write_split(path, rxns):
    pd.DataFrame({"id": range(len(rxns)), "rxn_smiles": rxns}).to_csv(
        path, index=False)


@pytest.fixture(scope="module")
def processed(tmp_path_factory):
    root = tmp_path_factory.mktemp("tpl")
    for name, rxns in [("train", TRAIN), ("val", VAL), ("test", TEST)]:
        _write_split(os.path.join(root, f"{name}.csv"), rxns)
    proc = TemplateProcessor(
        os.path.join(root, "train.csv"), os.path.join(root, "val.csv"),
        os.path.join(root, "test.csv"), str(root / "out"))
    assert proc.engine == "native"  # no RDKit in this image
    proc.check_data_format()
    proc.run()
    return str(root / "out")


def test_processor_artifacts(processed):
    for fn in ("template_infos.csv", "atom_templates.csv",
               "bond_templates.csv", "labeled_data.csv",
               "simulate_output.txt"):
        assert os.path.exists(os.path.join(processed, fn)), fn
    atom = pd.read_csv(os.path.join(processed, "atom_templates.csv"))
    bond = pd.read_csv(os.path.join(processed, "bond_templates.csv"))
    # eliminations are atom (A) edits; ester/amide/SN2 are broken bonds
    assert len(atom) >= 1
    assert len(bond) >= 3
    # class ids are 1-based positions (reference get_templates.py:215-217)
    assert sorted(atom["Class"]) == list(range(1, len(atom) + 1))
    assert sorted(bond["Class"]) == list(range(1, len(bond) + 1))


def test_processor_template_dedup(processed):
    """Substrate variation within a family must collapse to one template
    (frequency = family size), proving string-level canonicalization."""
    infos = pd.read_csv(os.path.join(processed, "template_infos.csv"))
    freqs = sorted(infos["Frequency"], reverse=True)
    assert freqs[:4] == [3, 3, 3, 3], freqs


def test_processor_full_train_coverage(processed):
    df = pd.read_csv(os.path.join(processed, "preprocessed_train.csv"))
    labels = [ast.literal_eval(v) for v in df["Labels"]]
    assert all(labels), "every synthetic train reaction must be labeled"
    freqs = df["Frequency"].tolist()
    assert all(f >= 1 for f in freqs)


def test_processor_gold_label_decode(processed):
    """Decoding each test row's gold (site, class) labels through the real
    eval machinery must reproduce the reaction's reactants."""
    df = pd.read_csv(os.path.join(processed, "preprocessed_test.csv"))
    prediction = {}
    rows = []
    for i in df.index:
        labels = ast.literal_eval(df["Labels"][i])
        a2c = ast.literal_eval(df["ProductAtomIdx2CanonIdx"][i])
        assert labels, df["Products"][i]
        preds, scores = [], []
        for kind, site, cls in labels:
            if kind == "a":
                preds.append((kind, a2c[site], cls))
            else:
                preds.append((kind, (a2c[site[0]], a2c[site[1]]), cls))
            scores.append(1.0)
        prediction[len(rows)] = {"prediction": preds, "score": scores}
        rows.append({
            "product_smiles": df["ProductCanonSmiles"][i],
            "gold": demapped_canonical(parse_smiles(df["Reactants"][i])),
        })
    data_df = pd.DataFrame(rows)
    decoded = decode_template_predictions(prediction, data_df, processed,
                                          top_k=3)
    for i, row in data_df.iterrows():
        assert row["gold"] in decoded[i], (row["product_smiles"], decoded[i])


def test_processor_skips_overlong_edits(tmp_path):
    """max_edit_n gates labeling (reference get_templates.py:316-320):
    with max_edit_n=0 nothing can be labeled, Frequency stays 0."""
    root = tmp_path
    for name, rxns in [("train", TRAIN[:2]), ("val", VAL[:1]),
                       ("test", TEST[:1])]:
        _write_split(os.path.join(root, f"{name}.csv"), rxns)
    proc = TemplateProcessor(
        os.path.join(root, "train.csv"), os.path.join(root, "val.csv"),
        os.path.join(root, "test.csv"), str(root / "out"),
        settings={"max_edit_n": 0})
    proc.run()
    df = pd.read_csv(os.path.join(root / "out", "preprocessed_train.csv"))
    assert all(not ast.literal_eval(v) for v in df["Labels"])
