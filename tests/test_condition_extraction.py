"""CML extraction + condition filtering pipeline tests (stdlib XML)."""

import pandas as pd
import pytest

from textreact_tpu.preprocess.aides import extract_non_smiles, merge_name_to_smiles
from textreact_tpu.preprocess.condition_extraction import (
    SPLIT_TOKEN, filter_and_split_conditions, merge_and_dedup,
    parse_cml_reactions, split_condition_slots)

CML = """<?xml version="1.0"?>
<reactionList xmlns="http://www.xml-cml.org/schema"
              xmlns:dl="http://bitbucket.org/dan2097">
  <reaction>
    <dl:source>
      <dl:documentId>US07654321</dl:documentId>
      <dl:headingText>Example 1</dl:headingText>
      <dl:paragraphText>The mixture was stirred overnight.</dl:paragraphText>
    </dl:source>
    <dl:reactionSmiles>CCO.CC(=O)O&gt;&gt;CC(=O)OCC</dl:reactionSmiles>
    <spectatorList>
      <spectator role="solvent">
        <identifier dictRef="cml:smiles" value="ClCCl"/>
      </spectator>
      <spectator role="catalyst">
        <identifier dictRef="cml:smiles" value="OS(=O)(=O)O"/>
      </spectator>
    </spectatorList>
  </reaction>
  <reaction>
    <dl:source>
      <dl:documentId>US07654321</dl:documentId>
      <dl:paragraphText>Second paragraph.</dl:paragraphText>
    </dl:source>
    <dl:reactionSmiles>CC&gt;&gt;CO</dl:reactionSmiles>
    <spectatorList>
      <spectator role="reagent">
        <identifier dictRef="cml:smiles" value="[Na+].[OH-]"/>
      </spectator>
    </spectatorList>
  </reaction>
</reactionList>
"""


def test_parse_cml(tmp_path):
    path = tmp_path / "2005" / "rxn.xml"
    path.parent.mkdir()
    path.write_text(CML)
    cond, corpus, info = parse_cml_reactions(str(path))
    assert len(cond) == 2 and len(corpus) == 2
    assert cond[0]["id"] == "US07654321_0"
    assert cond[1]["id"] == "US07654321_1"
    assert cond[0]["solvent"] == "ClCCl"
    assert cond[0]["catalyst"] == "OS(=O)(=O)O"
    assert cond[1]["reagent"] == "[Na+].[OH-]"
    assert cond[0]["rxn_smiles"] == "CCO.CC(=O)O>>CC(=O)OCC"
    assert corpus[0]["heading_text"] == "Example 1"
    assert info["US07654321"]["year"] == 2005


def test_merge_dedup_and_filter():
    rows = []
    for i in range(120):
        rows.append({"canonical_rxn": f"r{i}", "remapped_rxn": f"m{i}",
                     "catalyst": "Pd", "solvent": "CCO", "reagent": "O"})
    rows.append(dict(rows[0]))  # exact duplicate
    rows.append({"canonical_rxn": "special", "remapped_rxn": "ms",
                 "catalyst": "RareCat", "solvent": "CCO", "reagent": "O"})
    rows.append({"canonical_rxn": "excess", "remapped_rxn": "me",
                 "catalyst": "Pd.Pt", "solvent": "CCO", "reagent": "O"})
    db, freqs = merge_and_dedup([pd.DataFrame(rows)])
    assert len(db) == 122  # duplicate dropped
    assert freqs["catalyst"].iloc[0]["smiles"] == "Pd"
    out = filter_and_split_conditions(db, freqs, remove_threshold=100)
    # rare catalyst filtered; multi-catalyst row filtered
    assert "RareCat" not in set(out["catalyst"])
    assert "Pd.Pt" not in set(out["catalyst"])
    slots = split_condition_slots(out)
    assert (slots["catalyst1"] == "Pd").all()
    assert (slots["solvent1"] == "CCO").all()
    assert (slots["solvent2"] == "").all()


def test_mol_charge_classes():
    from textreact_tpu.preprocess.ionic import mol_charge
    assert mol_charge("CCO") == ("Neutral", False)
    assert mol_charge("[Na+]") == ("Positive", False)
    assert mol_charge("[O-]S(=O)(=O)[O-]") == ("Negative", False)
    # inner salt: both signs present, net zero -> Neutral with neutralization
    assert mol_charge("C[N+](C)(C)CC([O-])=O") == ("Neutral", True)
    # both signs, net positive
    assert mol_charge("[Mg+2].[Cl-]") == ("Positive", True)


def test_ionic_strip_and_split():
    """Reference utils.py __main__ example: LiAlH4 + NaOH + water strips to
    water (neutral) plus two table entries; charged leftovers are unknown."""
    from textreact_tpu.preprocess.ionic import (IonicCompoundTable,
                                                split_reagent_combination)
    table = IonicCompoundTable.load()
    known, unknown = split_reagent_combination(
        "O.[Al+3].[H-].[H-].[H-].[H-].[Li+].[Na+].[OH-]", table)
    assert known == ["O", "[Na+].[OH-]", "[Al+3].[H-].[H-].[H-].[H-].[Li+]"]
    assert unknown == []
    # a bare cation with no matching salt is unknown -> row would die
    known, unknown = split_reagent_combination("[Na+]", table)
    assert known == [] and unknown == ["[Na+]"]
    # unknown fragments are dropped but known parts keep the row
    known, unknown = split_reagent_combination("CCO.[Na+]", table)
    assert known == ["CCO"] and unknown == ["[Na+]"]
    # repeated salt occurrences strip repeatedly, recorded once
    known, unknown = split_reagent_combination(
        "[Na+].[OH-].[Na+].[OH-].CCO", table)
    assert known == ["CCO", "[Na+].[OH-]"] and unknown == []
    # NaN reagent keeps the row with an empty known slot (3.0:96-98)
    known, unknown = split_reagent_combination(float("nan"), table)
    assert known == [""] and unknown == []
    # unparseable fragment (chemical name) classifies as unknown, not crash
    known, unknown = split_reagent_combination("CCO.someName", table)
    assert known == ["CCO"] and unknown == ["someName"]


def test_filter_ionic_reagents_stage3():
    """Stage-3 fixture: reagent splitting drives row survival + excess."""
    rows = []
    for i in range(120):  # frequent neutral reagent, survives
        rows.append({"canonical_rxn": f"r{i}", "remapped_rxn": f"m{i}",
                     "catalyst": "", "solvent": "CCO",
                     "reagent": "O.[Na+].[OH-]"})
    for i in range(120):  # bare ion reagent: known empty -> rows dropped
        rows.append({"canonical_rxn": f"s{i}", "remapped_rxn": f"n{i}",
                     "catalyst": "", "solvent": "CCO", "reagent": "[Na+]"})
    for i in range(120):  # >2 known components -> excess-removed
        rows.append({"canonical_rxn": f"t{i}", "remapped_rxn": f"o{i}",
                     "catalyst": "", "solvent": "CCO",
                     "reagent": "O.CCO.CCN"})
    db, freqs = merge_and_dedup([pd.DataFrame(rows)])
    out = filter_and_split_conditions(db, freqs, remove_threshold=100)
    assert set(out["canonical_rxn"]) == {f"r{i}" for i in range(120)}
    assert (out["reagent_split"] == f"O{SPLIT_TOKEN}[Na+].[OH-]").all()
    slots = split_condition_slots(out)
    assert (slots["reagent1"] == "O").all()
    assert (slots["reagent2"] == "[Na+].[OH-]").all()


def test_split_token_two_solvents():
    db = pd.DataFrame({
        "catalyst_split": [""],
        "solvent_split": [f"CCO{SPLIT_TOKEN}ClCCl"],
        "reagent_split": ["O"]})
    slots = split_condition_slots(db)
    assert slots["solvent1"][0] == "CCO"
    assert slots["solvent2"][0] == "ClCCl"
    assert slots["reagent1"][0] == "O"
    assert slots["reagent2"][0] == ""


def test_assign_conditions_requires_all_fragments():
    from textreact_tpu.preprocess.aides import assign_conditions
    roles = {"c1": ["Pd", "[Na+].[OH-]"], "s1": ["CCO", "ClCCl"],
             "r1": ["O"]}
    got = assign_conditions({"Pd", "CCO", "O", "[Na+]"}, roles)
    # [Na+].[OH-] needs BOTH fragments present; only [Na+] is
    assert got == {"c1": ["Pd"], "s1": ["CCO"], "r1": ["O"]}


def test_extract_non_smiles_and_merge_names():
    vals = ["CCO", "tetrahydrofuran", "CCO", "tetrahydrofuran", "not smiles("]
    names = extract_non_smiles(vals)
    assert "tetrahydrofuran" in names
    assert "CCO" not in names
    df = pd.DataFrame({"catalyst1": ["tetrahydrofuran"], "solvent1": ["CCO"],
                       "solvent2": [""], "reagent1": [""], "reagent2": [""]})
    out = merge_name_to_smiles(df, {"tetrahydrofuran": "C1CCOC1"})
    assert out["catalyst1"][0] == "C1CCOC1"


def test_preprocess_cli_condition_split(tmp_path):
    import random
    from textreact_tpu.preprocess.cli import main as preprocess_main
    rng = random.Random(0)
    rows = []
    for i in range(150):
        rows.append({"id": f"P{i % 10}_{i}", "source": f"P{i % 10}",
                     "canonical_rxn": f"r{i}>>p{i}", "remapped_rxn": f"m{i}",
                     "catalyst": "Pd", "solvent": "CCO.ClCCl", "reagent": "O"})
    inp = tmp_path / "conditions.csv"
    pd.DataFrame(rows).to_csv(inp, index=False)
    info = {f"P{i}": {"year": 2010 + i} for i in range(10)}
    info_path = tmp_path / "patent_info.json"
    import json
    info_path.write_text(json.dumps(info))
    out = tmp_path / "out"
    preprocess_main(["condition-split", "--input", str(inp),
                     "--output_path", str(out), "--patent_info", str(info_path),
                     "--remove_threshold", "10"])
    split = pd.read_csv(out / "USPTO_condition.csv", keep_default_na=False)
    assert {"catalyst1", "solvent1", "solvent2", "reagent1", "reagent2",
            "dataset"} <= set(split.columns)
    assert (split["solvent1"] == "CCO").all()
    assert (split["solvent2"] == "ClCCl").all()
    vocab = (out / "vocab_condition.txt").read_text().split("\n")
    assert vocab[0] == "[PAD]" and "Pd" in vocab
    assert (out / "year_split" / "USPTO_condition_test.csv").exists()


def test_preprocess_cli_dedup(tmp_path):
    from textreact_tpu.preprocess.cli import main as preprocess_main
    df = pd.DataFrame({"id": ["a", "b", "c"], "heading_text": ["", "", ""],
                       "paragraph_text": ["x", "x", "y"]})
    inp = tmp_path / "corpus.csv"
    df.to_csv(inp, index=False)
    out = tmp_path / "out"
    preprocess_main(["dedup-corpus", "--input", str(inp),
                     "--output_path", str(out)])
    dedup = pd.read_csv(out / "corpus_dedup.csv")
    assert len(dedup) == 2
