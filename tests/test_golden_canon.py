"""Vendored chemistry goldens: canonicalization equivalence classes.

The retro metric compares canonical-SMILES strings for equality (reference
evaluate.py:27-40), so the own chem kit's canonicalizer must respect RDKit's
molecule identity: two SMILES canonicalize to the same string exactly when
RDKit parses them to the same molecule. tests/golden/canon_groups.json pins
hand-authored equivalence classes (aromatic/kekule, charges, fragments, E/Z
and tetrahedral stereo, isotopes, traversal order); gen_rdkit_goldens.py
verifies the classes against real RDKit and freezes its canonical strings
when run in an RDKit environment.
"""

import json
import os

import pytest

from textreact_tpu.chem import HAS_RDKIT, canonical_smiles, morgan_fingerprint

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "canon_groups.json")

with open(GOLDEN) as f:
    _DATA = json.load(f)
GROUPS = _DATA["groups"]
FAMILIES = {}
for g in GROUPS:
    FAMILIES.setdefault(g["family"], []).append(g)


@pytest.mark.parametrize("group", GROUPS, ids=[g["name"] for g in GROUPS])
def test_group_members_canonicalize_together(group):
    forms = {canonical_smiles(s) for s in group["smiles"]}
    assert len(forms) == 1, (group["name"], forms)


@pytest.mark.parametrize("family", sorted(FAMILIES),
                         ids=sorted(FAMILIES))
def test_family_groups_canonicalize_apart(family):
    forms = [canonical_smiles(g["smiles"][0]) for g in FAMILIES[family]]
    assert len(set(forms)) == len(forms), (family, forms)


@pytest.mark.parametrize("group", GROUPS, ids=[g["name"] for g in GROUPS])
def test_group_members_fingerprint_together(group):
    """Retrieval fingerprints must also be spelling-invariant."""
    import numpy as np
    fps = [morgan_fingerprint(s) for s in group["smiles"]]
    for fp in fps[1:]:
        assert np.array_equal(fp, fps[0]), group["name"]


def test_distinct_molecules_fingerprint_apart():
    """Constitutionally distinct molecules get distinct Morgan fps; pure
    stereoisomers SHARE one — the reference fingerprints without chirality
    (retrieve_faiss.py:36-44, GetMorganFingerprintAsBitVect default)."""
    import numpy as np
    for family, groups in FAMILIES.items():
        fps = [tuple(np.nonzero(morgan_fingerprint(g["smiles"][0]))[0])
               for g in groups]
        if family.endswith("-stereo"):
            assert len(set(fps)) == 1, family
        else:
            assert len(set(fps)) == len(fps), family


RXN_GROUPS = [
    # esterification spelled with reordered fragments / kekulé / atom order
    ["CCO.CC(=O)O>>CC(=O)OCC",
     "CC(=O)O.CCO>>CC(=O)OCC",
     "OCC.CC(O)=O>>CCOC(C)=O"],
    # aromatic substitution: kekulé vs aromatic ring spelling
    ["c1ccccc1Br.CCN>>c1ccccc1NCC",
     "BrC1=CC=CC=C1.NCC>>C1=CC=CC=C1NCC"],
]


@pytest.mark.parametrize("group", RXN_GROUPS,
                         ids=["esterification", "aromatic-sub"])
def test_reaction_spellings_canonicalize_and_fingerprint_together(group):
    """Reaction-level invariance: same reaction in different spellings must
    share canonical reaction SMILES AND the retrieval difference
    fingerprint (reference retrieve_faiss.py:18-27 — neighbor sets would
    otherwise depend on how the dataset spelled the reaction)."""
    import numpy as np

    from textreact_tpu.chem import (canonical_rxn_smiles,
                                    reaction_difference_fingerprint)
    canons = {canonical_rxn_smiles(r) for r in group}
    assert len(canons) == 1, canons
    fps = [reaction_difference_fingerprint(r) for r in group]
    for fp in fps[1:]:
        assert np.array_equal(fp, fps[0])


@pytest.mark.skipif(not HAS_RDKIT, reason="RDKit not in image")
def test_rdkit_bridge_agrees_with_golden_classes():
    from rdkit import Chem
    for group in GROUPS:
        canon = {Chem.MolToSmiles(Chem.MolFromSmiles(s))
                 for s in group["smiles"]}
        assert len(canon) == 1, (group["name"], canon)
        if group["rdkit_canonical"] is not None:
            assert canon.pop() == group["rdkit_canonical"], group["name"]
