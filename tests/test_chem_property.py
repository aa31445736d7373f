"""Property-based canonicalizer fuzzing over randomly generated molecular
graphs: build a random Mol, serialize it with random traversal order, and
require (a) the string parses, (b) canonicalization is order-invariant,
(c) python and C++ engines agree."""

import random

import pytest

from textreact_tpu.chem import canonical_smiles_strict, parse_smiles, write_smiles
from textreact_tpu.chem.mol import Atom, Mol
from textreact_tpu.chem.native import native_available, native_canonical_smiles

ELEMENTS = ["C", "C", "C", "C", "N", "O", "S", "P", "F", "Cl", "Br"]
ORDERS = [1, 1, 1, 2, 3]


def random_mol(rng: random.Random) -> Mol:
    mol = Mol()
    n = rng.randrange(3, 14)
    for i in range(n):
        charge = rng.choice([0, 0, 0, 0, 1, -1])
        atom = Atom(rng.choice(ELEMENTS), charge=charge,
                    isotope=rng.choice([0] * 8 + [13]))
        if charge != 0:
            atom.explicit_h = rng.randrange(0, 2)
        mol.add_atom(atom)
    # random spanning tree keeps it connected
    for i in range(1, n):
        mol.add_bond(rng.randrange(i), i, rng.choice(ORDERS))
    # a few ring-closing extra bonds
    for _ in range(rng.randrange(0, 3)):
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b and mol.bond_between(a, b) is None:
            mol.add_bond(a, b, 1)
    mol.smiles_neighbor_order = {i: mol.neighbors(i) for i in range(n)}
    mol.assign_implicit_h()
    return mol


@pytest.mark.parametrize("seed", range(40))
def test_random_graph_canonical_invariance(seed):
    rng = random.Random(seed)
    mol = random_mol(rng)
    smiles_variants = [write_smiles(mol, rng=random.Random(seed * 31 + t))
                       for t in range(4)]
    canons = set()
    for smi in smiles_variants:
        reparsed = parse_smiles(smi)            # (a) parses
        assert len(reparsed.atoms) == len(mol.atoms)
        canons.add(canonical_smiles_strict(smi))
    assert len(canons) == 1, (smiles_variants, canons)   # (b) invariant
    canon = canons.pop()
    assert canonical_smiles_strict(canon) == canon        # idempotent
    if native_available():                                # (c) C++ agreement
        for smi in smiles_variants:
            assert native_canonical_smiles(smi) == canon, smi
