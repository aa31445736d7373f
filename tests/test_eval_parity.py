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


def test_condition_metric_nan_slot_never_hits():
    """Reference reads gold labels verbatim (evaluate.py:18): a NaN cell
    from the CSV can never equal a decoded string tuple."""
    import numpy as np
    data_df = pd.DataFrame({
        "catalyst1": [np.nan], "solvent1": ["CCO"], "solvent2": [""],
        "reagent1": [""], "reagent2": [""]})
    prediction = {0: {"prediction": [["", "CCO", "", "", ""],
                                     ["nan", "CCO", "", "", ""]],
                      "score": [0, -1]}}
    acc = evaluate_reaction_condition(prediction, data_df)
    assert acc == {1: 0.0, 3: 0.0, 5: 0.0, 10: 0.0, 15: 0.0}


def test_condition_metric_missing_prediction_counts_in_denominator():
    """Denominator is len(data_df) (evaluate.py:21-23); an example absent
    from the prediction dict just never hits."""
    data_df = pd.DataFrame({
        "catalyst1": ["", ""], "solvent1": ["CCO", "CCN"],
        "solvent2": ["", ""], "reagent1": ["", ""], "reagent2": ["", ""]})
    prediction = {1: {"prediction": [["", "CCN", "", "", ""]], "score": [0]}}
    acc = evaluate_reaction_condition(prediction, data_df)
    assert acc[1] == 0.5


def test_retro_duplicate_beams_first_match_rank():
    """_compare_pred_and_gold returns the FIRST matching index
    (evaluate.py:35-40): duplicate beams don't double-count, and a later
    duplicate can't improve the rank."""
    data_df = pd.DataFrame({"reactant_smiles": ["CCO"]})
    prediction = {0: {"prediction": ["CCC", "OCC", "CCO", "CCO"],
                      "score": [0, 0, 0, 0]}}
    acc = evaluate_retrosynthesis(prediction, data_df, top_k=20)
    assert acc[1] == 0.0 and acc[2] == 1.0 and acc[3] == 1.0


def test_retro_kekule_prediction_matches_aromatic_gold():
    """Canonicalization must align kekulé predictions with aromatic gold
    (RDKit sanitization parity; own chem kit aromaticity perception)."""
    data_df = pd.DataFrame({"reactant_smiles": ["c1ccccc1O"]})
    prediction = {0: {"prediction": ["OC1=CC=CC=C1"], "score": [0]}}
    acc = evaluate_retrosynthesis(prediction, data_df, top_k=20)
    assert acc[1] == 1.0


def test_each_neighbor_aggregation_then_metric():
    """test_each_neighbor mode: expanded indices i map to example
    i // num_neighbors with list-concatenated predictions (utils.py:55-64),
    evaluated as one example against len(data_df)."""
    from textreact_tpu.evaluation import gather_prediction_each_neighbor
    data_df = pd.DataFrame({
        "catalyst1": [""], "solvent1": ["CCO"], "solvent2": [""],
        "reagent1": [""], "reagent2": [""]})
    gold = ["", "CCO", "", "", ""]
    expanded = {
        0: {"prediction": [["x"] * 5], "score": [0.0]},
        1: {"prediction": [gold], "score": [-1.0]},
    }
    merged = gather_prediction_each_neighbor(expanded, 2)
    assert merged[0]["prediction"] == [["x"] * 5, gold]
    assert merged[0]["score"] == [0.0, -1.0]
    acc = evaluate_reaction_condition(merged, data_df)
    assert acc[1] == 0.0 and acc[3] == 1.0


def test_retro_unparseable_gold_falls_back_to_string_match():
    # reference canonical_smiles returns the input on parse failure
    data_df = pd.DataFrame({"reactant_smiles": ["not_a_smiles"]})
    prediction = {0: {"prediction": ["not_a_smiles"], "score": [0]}}
    acc = evaluate_retrosynthesis(prediction, data_df, top_k=20)
    assert acc[1] == 1.0


def test_retro_metric_pooled_matches_serial_and_is_fast():
    """VERDICT r3 item 5: USPTO-50K-scale scoring (5k examples x 20 beams)
    must finish well under 30 s and the pooled path must produce the
    identical accuracy dict to the serial path (reference pools exactly
    this step, evaluate.py:67)."""
    import random
    import time

    rng = random.Random(0)
    frags = ["CCO", "CC(=O)O", "c1ccccc1Br", "CCN(CC)CC", "CC(C)O",
             "C1CCOC1", "CC(=O)Nc1ccccc1", "COC(=O)c1ccccc1"]
    n, beams = 5000, 20
    golds, prediction = [], {}
    for i in range(n):
        gold = ".".join(rng.sample(frags, 2))
        golds.append(gold)
        rank = rng.randrange(beams + 5)  # some examples never match
        preds = [".".join(rng.sample(frags, 2)) for _ in range(beams)]
        if rank < beams:
            preds[rank] = gold
        prediction[i] = {"prediction": preds, "score": [0.0] * beams}
    data_df = pd.DataFrame({"reactant_smiles": golds})

    dt = float("inf")
    for _ in range(2):  # best-of-2: robust to transient host load spikes
        t0 = time.time()
        pooled = evaluate_retrosynthesis(prediction, data_df, top_k=beams,
                                         num_workers=8)
        dt = min(dt, time.time() - t0)
        if dt < 30:
            break
    serial = evaluate_retrosynthesis(prediction, data_df, top_k=beams)
    assert pooled == serial
    assert dt < 30, f"pooled retro scoring took {dt:.1f}s"
