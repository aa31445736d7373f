"""Chemistry kit tests: parser, canonicalization self-consistency, fingerprints."""

import random

import numpy as np
import pytest

from textreact_tpu.chem import (canonical_smiles, canonical_smiles_strict,
                                morgan_fingerprint, parse_smiles, random_smiles,
                                reaction_difference_fingerprint)
from textreact_tpu.chem.mol import SmilesParseError

SIMPLE = [
    "C", "CC", "CCO", "c1ccccc1", "C1CCCCC1", "CC(=O)O", "CC(=O)Oc1ccccc1C(=O)O",
    "N#Cc1ccccc1", "O=C(O)c1ccccc1", "CCN(CC)CC", "C1=CC=CC=C1",
    "[Na+].[Cl-]", "[NH4+]", "CC(C)(C)OC(=O)N1CCC(N)CC1", "Clc1ccc(Br)cc1",
    "O=S(=O)(O)O", "[O-]S(=O)(=O)[O-]", "C/C=C/C", "C/C=C\\C",
    "C[C@H](N)C(=O)O", "C[C@@H](N)C(=O)O", "c1ccc2ccccc2c1", "c1cnc2[nH]ccc2c1",
    "COc1ccc(C=O)cc1", "CC(C)Cc1ccc(cc1)C(C)C(=O)O", "%10 placeholder",
]
SIMPLE.remove("%10 placeholder")


def test_parse_basic_counts():
    mol = parse_smiles("CCO")
    assert len(mol.atoms) == 3
    assert len(mol.bonds) == 2
    assert [a.symbol for a in mol.atoms] == ["C", "C", "O"]
    assert [a.total_h for a in mol.atoms] == [3, 2, 1]


def test_parse_aromatic_hcounts():
    mol = parse_smiles("c1ccccc1")  # benzene
    assert all(a.aromatic for a in mol.atoms)
    assert all(a.total_h == 1 for a in mol.atoms)
    mol = parse_smiles("c1ccncc1")  # pyridine: N has no H
    hs = [a.total_h for a in mol.atoms]
    n_idx = [i for i, a in enumerate(mol.atoms) if a.symbol == "N"][0]
    assert hs[n_idx] == 0
    mol = parse_smiles("c1cc[nH]c1")  # pyrrole
    n = [a for a in mol.atoms if a.symbol == "N"][0]
    assert n.total_h == 1
    mol = parse_smiles("c1ccsc1")  # thiophene: S has no H
    s = [a for a in mol.atoms if a.symbol == "S"][0]
    assert s.total_h == 0


def test_parse_charges_isotopes_maps():
    mol = parse_smiles("[13CH3][NH3+]")
    assert mol.atoms[0].isotope == 13
    assert mol.atoms[0].total_h == 3
    assert mol.atoms[1].charge == 1
    mol = parse_smiles("[CH3:5][OH:2]")
    assert mol.atoms[0].atom_map == 5
    assert mol.atoms[1].atom_map == 2
    mol = parse_smiles("[Fe+2]")
    assert mol.atoms[0].charge == 2


def test_parse_errors():
    for bad in ["C(", "C1CC", "[Xx]", "C)"]:
        with pytest.raises(SmilesParseError):
            parse_smiles(bad)


def test_roundtrip_parses():
    for smi in SIMPLE:
        canon = canonical_smiles_strict(smi)
        # the canonical output itself must parse and re-canonicalize stably
        assert canonical_smiles_strict(canon) == canon, smi


def test_canonical_order_invariance():
    rng = random.Random(0)
    for smi in SIMPLE:
        base = canonical_smiles_strict(smi)
        for _ in range(8):
            shuffled, _ = random_smiles(smi, rng)
            assert canonical_smiles_strict(shuffled) == base, (smi, shuffled)


def test_canonical_fragment_sorting():
    a = canonical_smiles("CCO.[Na+]")
    b = canonical_smiles("[Na+].CCO")
    assert a == b


def test_canonical_smiles_fallback_on_garbage():
    assert canonical_smiles("not_a_smiles($$$") == "not_a_smiles($$$"


def test_random_smiles_atom_order():
    rng = random.Random(1)
    smi = "CC(=O)Oc1ccccc1C(=O)O"
    mol = parse_smiles(smi)
    out, order = random_smiles(smi, rng)
    assert sorted(order) == list(range(len(mol.atoms)))
    assert canonical_smiles_strict(out) == canonical_smiles_strict(smi)


def test_chirality_preserved():
    l_ala = canonical_smiles_strict("C[C@H](N)C(=O)O")
    d_ala = canonical_smiles_strict("C[C@@H](N)C(=O)O")
    assert l_ala != d_ala
    # chirality survives random re-ordering
    rng = random.Random(2)
    for _ in range(10):
        shuffled, _ = random_smiles("C[C@H](N)C(=O)O", rng)
        assert canonical_smiles_strict(shuffled) == l_ala, shuffled


def test_morgan_fingerprint_properties():
    fp = morgan_fingerprint("CCO")
    assert fp.shape == (1024,)
    assert fp.dtype == np.uint8
    assert fp.sum() > 0
    # order invariance
    rng = random.Random(3)
    for smi in ["CC(=O)Oc1ccccc1C(=O)O", "CCN(CC)CC"]:
        base = morgan_fingerprint(smi)
        for _ in range(5):
            shuffled, _ = random_smiles(smi, rng)
            assert np.array_equal(morgan_fingerprint(shuffled), base)
    # distinct molecules -> distinct fps
    assert not np.array_equal(morgan_fingerprint("CCO"), morgan_fingerprint("CCN"))
    # garbage falls back to methane fp (reference retrieve_faiss.py:42-43)
    assert np.array_equal(morgan_fingerprint("zzz"), morgan_fingerprint("C"))


def test_reaction_difference_fingerprint():
    rxn = "CCO.CC(=O)O>>CC(=O)OCC"
    fp = reaction_difference_fingerprint(rxn)
    assert fp.shape == (2048,)
    assert fp.dtype == np.int32
    # identity reaction has zero difference
    fp0 = reaction_difference_fingerprint("CCO>>CCO")
    assert np.all(fp0 == 0)
    # direction matters
    rev = reaction_difference_fingerprint("CC(=O)OCC>>CCO.CC(=O)O")
    assert np.array_equal(fp, -rev)
