"""Native C++ chem kernel: bit-identical to the python implementation."""

import numpy as np
import pytest

from textreact_tpu.chem import morgan_fingerprint, reaction_difference_fingerprint
from textreact_tpu.chem.native import (native_available, native_morgan_batch,
                                       native_morgan_fingerprint,
                                       native_reaction_fingerprint)

SMILES = [
    "C", "CCO", "c1ccccc1", "CC(=O)Oc1ccccc1C(=O)O", "N#Cc1ccccc1",
    "[Na+].[Cl-]", "Clc1ccc(Br)cc1", "O=S(=O)(O)O", "[13CH3][NH3+]",
    "C[C@H](N)C(=O)O", "c1cnc2[nH]ccc2c1", "CC(C)Cc1ccc(cc1)C(C)C(=O)O",
    "COc1ccc2[nH]c3ccccc3c2c1", "[O-][n+]1ccccc1", "C1CC2CCC1CC2",
    # kekulé spellings: aromaticity perception must match python exactly
    "C1=CC=CC=C1", "CC1=CC=CC=C1C", "C1=CC=CN1", "O=C1C=CC=CN1",
    "O=C1C=CC(=O)C=C1", "C1=CC2=CC=CC=C2N1", "[O+]1=CC=CC=C1",
    "C1=CC=CC=CC=C1", "C1CCC=CC1",
    "not_a_smiles", "",
]

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="no C++ toolchain available")


def test_native_morgan_matches_python():
    for smi in SMILES:
        py = morgan_fingerprint(smi)
        cc = native_morgan_fingerprint(smi)
        assert np.array_equal(py, cc), smi


def test_native_morgan_counts_match_python():
    for smi in SMILES:
        py = morgan_fingerprint(smi, counts=True)
        cc = native_morgan_fingerprint(smi, counts=True)
        assert np.array_equal(py, cc), smi


def test_native_reaction_fp_matches_python():
    for rxn in ["CCO.CC(=O)O>>CC(=O)OCC", "CCO>>CCO",
                "CC(=O)OCC>>CCO.CC(=O)O",
                "Clc1ccccc1.CN>>CNc1ccccc1"]:
        py = reaction_difference_fingerprint(rxn)
        cc = native_reaction_fingerprint(rxn)
        assert np.array_equal(py, cc), rxn


def test_native_batch():
    valid = [s for s in SMILES if s]
    batch = native_morgan_batch(valid)
    assert batch.shape == (len(valid), 1024)
    for i, smi in enumerate(valid):
        assert np.array_equal(batch[i], morgan_fingerprint(smi).astype(np.int8)), smi


def test_native_canonical_smiles_matches_python():
    import random
    from textreact_tpu.chem import canonical_smiles_strict, random_smiles
    from textreact_tpu.chem.native import native_canonical_smiles
    from test_chem_fuzz import DRUGS
    rng = random.Random(0)
    for smi in DRUGS:
        assert native_canonical_smiles(smi) == canonical_smiles_strict(smi), smi
        for _ in range(5):
            shuffled, _ = random_smiles(smi, rng)
            assert native_canonical_smiles(shuffled) == \
                canonical_smiles_strict(shuffled), shuffled


def test_native_canonical_matches_python_on_golden_groups():
    """Every spelling in the vendored canon goldens canonicalizes to the
    same string in C++ and python (incl. kekulé → aromatic perception)."""
    import json
    import os
    from textreact_tpu.chem import canonical_smiles_strict
    from textreact_tpu.chem.native import native_canonical_smiles
    path = os.path.join(os.path.dirname(__file__), "golden",
                        "canon_groups.json")
    with open(path) as f:
        groups = json.load(f)["groups"]
    for g in groups:
        for smi in g["smiles"]:
            assert native_canonical_smiles(smi) == \
                canonical_smiles_strict(smi), (g["name"], smi)


def test_native_canonical_fallback():
    from textreact_tpu.chem.native import native_canonical_smiles
    assert native_canonical_smiles("garbage(((") == "garbage((("
    assert native_canonical_smiles("garbage(((", fallback="X") == "X"


def test_native_canonical_batch_matches_single():
    from textreact_tpu.chem.native import (native_canonical_batch,
                                           native_canonical_smiles)
    from test_chem_fuzz import DRUGS
    mixed = list(DRUGS[:20]) + ["garbage(((", "", "CCO.CC(=O)O"]
    batch = native_canonical_batch(mixed)
    assert len(batch) == len(mixed)
    for smi, got in zip(mixed, batch):
        assert got == native_canonical_smiles(smi), smi
    assert native_canonical_batch([]) == []
