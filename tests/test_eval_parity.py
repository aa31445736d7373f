"""Evaluation-protocol parity on hand-computed fixtures.

These encode the reference's exact metric semantics (evaluate.py:15-24 for
RCR, 27-71 for retro): dict shapes, top-k keys, hit rules, missing-beam and
canonicalization behavior.
"""

import pandas as pd

from textreact_tpu.evaluation import (evaluate_reaction_condition,
                                      evaluate_retrosynthesis)
from textreact_tpu.evaluation.retro import NO_MATCH, compare_pred_and_gold


def test_condition_metric_fixture():
    data_df = pd.DataFrame({
        "catalyst1": ["", "Pd", ""],
        "solvent1": ["CCO", "C1CCOC1", ""],
        "solvent2": ["", "", ""],
        "reagent1": ["O", "", "BrBr"],
        "reagent2": ["", "", ""],
    })
    gold = lambda i: data_df.loc[i, ["catalyst1", "solvent1", "solvent2",
                                     "reagent1", "reagent2"]].tolist()
    prediction = {
        # example 0: hit at rank 1
        0: {"prediction": [gold(0), ["x"] * 5], "score": [0.0, -1.0]},
        # example 1: hit at rank 4 (counts for top-5/10/15 only)
        1: {"prediction": [["a"] * 5, ["b"] * 5, ["c"] * 5, gold(1)],
            "score": [0, 0, 0, 0]},
        # example 2: never hits
        2: {"prediction": [["z"] * 5] * 15, "score": [0] * 15},
    }
    acc = evaluate_reaction_condition(prediction, data_df)
    assert acc == {1: 1 / 3, 3: 1 / 3, 5: 2 / 3, 10: 2 / 3, 15: 2 / 3}


def test_condition_metric_requires_exact_5_tuple():
    data_df = pd.DataFrame({
        "catalyst1": [""], "solvent1": ["CCO"], "solvent2": [""],
        "reagent1": [""], "reagent2": [""]})
    # 4-token prediction (truncated beam) must NOT match
    prediction = {0: {"prediction": [["", "CCO", "", ""]], "score": [0]}}
    assert evaluate_reaction_condition(prediction, data_df)[1] == 0.0


def test_retro_rank_and_canonicalization():
    # gold written non-canonically; predictions in different but equivalent
    # SMILES forms — canonicalization must align them
    assert compare_pred_and_gold(["CCC"], "CCO") == NO_MATCH  # different mols
    from textreact_tpu.chem import canonical_smiles
    gold_canon = canonical_smiles("C(C)O")           # ethanol, odd form
    assert compare_pred_and_gold(["CC", "C(C)O"], gold_canon) == 1
    assert compare_pred_and_gold(["CCO"], gold_canon) == 0


def test_retro_metric_fixture():
    data_df = pd.DataFrame({
        "reactant_smiles": ["CCO.CC(=O)O", "CCN", "c1ccccc1"],
    })
    prediction = {
        # example 0: equivalent form at rank 2 (0-based 1)
        0: {"prediction": ["CCC", "OCC.OC(C)=O"], "score": [0, 0]},
        # example 1: exact at rank 1
        1: {"prediction": ["CCN"], "score": [0]},
        # example 2: no match ever
        2: {"prediction": ["C1CCCCC1"], "score": [0]},
    }
    acc = evaluate_retrosynthesis(prediction, data_df, top_k=20)
    assert set(acc.keys()) == {1, 2, 3, 5, 10, 20}
    assert acc[1] == 1 / 3
    assert acc[2] == 2 / 3
    assert acc[20] == 2 / 3


def test_retro_unparseable_gold_falls_back_to_string_match():
    # reference canonical_smiles returns the input on parse failure
    data_df = pd.DataFrame({"reactant_smiles": ["not_a_smiles"]})
    prediction = {0: {"prediction": ["not_a_smiles"], "score": [0]}}
    acc = evaluate_retrosynthesis(prediction, data_df, top_k=20)
    assert acc[1] == 1.0
