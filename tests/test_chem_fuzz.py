"""Canonicalizer stress tests on drug-like molecules: random-reorder
invariance, idempotence, fingerprint stability."""

import random

import numpy as np
import pytest

from textreact_tpu.chem import (canonical_smiles_strict, morgan_fingerprint,
                                parse_smiles, random_smiles)

DRUGS = [
    # aspirin, ibuprofen, paracetamol, caffeine
    "CC(=O)Oc1ccccc1C(=O)O",
    "CC(C)Cc1ccc(cc1)C(C)C(=O)O",
    "CC(=O)Nc1ccc(O)cc1",
    "Cn1cnc2c1c(=O)n(C)c(=O)n2C",
    # naproxen (chiral), salbutamol, atenolol
    "COc1ccc2cc(ccc2c1)[C@@H](C)C(=O)O",
    "CC(C)(C)NCC(O)c1ccc(O)c(CO)c1",
    "CC(C)NCC(O)COc1ccc(CC(N)=O)cc1",
    # nicotine (chiral pyrrolidine), quinine fragment
    "CN1CCC[C@H]1c1cccnc1",
    "COc1ccc2nccc(C(O)C3CC4CCN3CC4C=C)c2c1",
    # diazepam, sildenafil-like fragment
    "CN1c2ccc(Cl)cc2C(=NCC1=O)c1ccccc1",
    "CCCc1nn(C)c2c1nc([nH]c2=O)-c1cc(ccc1OCC)S(=O)(=O)N1CCN(C)CC1",
    # sugars / multi-stereo
    "OC[C@H]1OC(O)[C@H](O)[C@@H](O)[C@@H]1O",
    "C[C@@H](O)[C@@H](N)C(=O)O",
    # polycyclic: adamantane, cubane-ish, norbornane, naphthalene, indole
    "C1C2CC3CC1CC(C2)C3",
    "C1CC2CCC1C2",
    "c1ccc2ccccc2c1",
    "c1ccc2[nH]ccc2c1",
    # spiro + fused heterocycles
    "O=C1NC(=O)C2(CCCC2)C(=O)N1",
    "c1cnc2c(c1)ccc1cccnc12",
    # charged / salts / organometallic-ish
    "[O-]S(=O)(=O)[O-].[Na+].[Na+]",
    "C[N+](C)(C)CCO.[Cl-]",
    "[O-][n+]1ccccc1",
    # ring-closure digits >9
    "C1CCC2(CC1)CCC1(CC2)CCCCC1",
    # isotopes / maps
    "[13C]1([2H])CCCCC1",
    "[CH3:1][C:2](=[O:3])[OH:4]",
]


@pytest.mark.parametrize("smi", DRUGS)
def test_reorder_invariance(smi):
    base = canonical_smiles_strict(smi)
    assert canonical_smiles_strict(base) == base  # idempotent
    rng = random.Random(hash(smi) & 0xFFFF)
    for _ in range(10):
        shuffled, order = random_smiles(smi, rng)
        assert sorted(order) == list(range(len(parse_smiles(smi).atoms)))
        assert canonical_smiles_strict(shuffled) == base, shuffled


@pytest.mark.parametrize("smi", DRUGS)
def test_fingerprint_reorder_invariance(smi):
    base = morgan_fingerprint(smi)
    rng = random.Random(1)
    for _ in range(5):
        shuffled, _ = random_smiles(smi, rng)
        assert np.array_equal(morgan_fingerprint(shuffled), base), shuffled


def test_distinct_molecules_distinct_canon():
    canons = {canonical_smiles_strict(s) for s in DRUGS}
    assert len(canons) == len(DRUGS)
