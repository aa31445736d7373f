"""Round-3 golden widening (VERDICT r2 item 6): extend canon_groups.json
with stereo pairs, tautomer-adjacent traps, charged/fused aromatics, and
polycyclic traversal torture. Hand-authored primary spellings; additional
spellings are seeded random re-traversals (writer<->parser invariance),
spot-verified by hand for the stereo groups. Run once:

    python tests/golden/extend_goldens_r3.py

Validates every group (parses, canonicalizes together, families apart)
before writing; refuses to write on any failure so a bad hand-authored
spelling can never be frozen.
"""

import json
import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from textreact_tpu.chem import canonical_smiles_strict, random_smiles  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))

# (name, family, [hand spellings], n_generated_respellings)
NEW = [
    # --- cis/trans stereo pairs (global direction flip = same molecule) ---
    ("maleic-acid", "butenedioic-stereo",
     ["O=C(O)/C=C\\C(=O)O", "O=C(O)\\C=C/C(=O)O"], 1),
    ("fumaric-acid", "butenedioic-stereo",
     ["O=C(O)/C=C/C(=O)O", "O=C(O)\\C=C\\C(=O)O"], 1),
    ("unspec-butenedioic", "butenedioic-stereo", ["O=C(O)C=CC(=O)O"], 1),
    ("E-1-bromopropene", "bromopropene-stereo", ["C/C=C/Br", "Br/C=C/C"], 1),
    ("Z-1-bromopropene", "bromopropene-stereo", ["C/C=C\\Br", "Br/C=C\\C"], 1),
    ("unspec-1-bromopropene", "bromopropene-stereo", ["CC=CBr"], 1),
    ("E-stilbene", "stilbene-stereo", ["c1ccccc1/C=C/c1ccccc1"], 1),
    ("Z-stilbene", "stilbene-stereo", ["c1ccccc1/C=C\\c1ccccc1"], 1),
    # --- tetrahedral stereo (respelling parity derived by hand) ---
    ("S-butan-2-ol", "butan-2-ol-stereo", ["C[C@H](O)CC", "CC[C@H](C)O"], 1),
    ("R-butan-2-ol", "butan-2-ol-stereo", ["C[C@@H](O)CC", "CC[C@@H](C)O"], 1),
    ("rac-butan-2-ol", "butan-2-ol-stereo", ["CC(O)CC", "CCC(C)O"], 1),
    ("R-glyceraldehyde", "glyceraldehyde-stereo", ["OC[C@@H](O)C=O"], 2),
    ("S-glyceraldehyde", "glyceraldehyde-stereo", ["OC[C@H](O)C=O"], 2),
    # --- tautomer-adjacent traps: distinct molecules stay distinct ---
    ("2-hydroxypyridine", "pyridones", ["Oc1ccccn1", "Oc1ncccc1"], 1),
    ("4-pyridone", "pyridones4", ["O=c1cc[nH]cc1"], 1),
    ("4-hydroxypyridine", "pyridones4", ["Oc1ccncc1"], 1),
    ("acetone", "keto-enol", ["CC(C)=O", "O=C(C)C"], 1),
    ("propen-2-ol", "keto-enol", ["C=C(C)O", "OC(C)=C"], 1),
    ("guanidine", "guanidines", ["NC(N)=N", "NC(=N)N"], 1),
    ("methylguanidine", "guanidines", ["CNC(N)=N"], 1),
    # --- charged aromatics / zwitterions ---
    ("imidazolium", "charged-azoles", ["c1c[nH]c[nH+]1", "c1c[nH+]c[nH]1"], 1),
    ("imidazole", "charged-azoles", ["c1c[nH]cn1", "c1cnc[nH]1"], 1),
    ("pyrylium", "charged-oxines", ["c1ccc[o+]c1", "C1=CC=C[O+]=C1"], 1),
    ("phenolate", "charged-benzenes", ["[O-]c1ccccc1", "c1ccc([O-])cc1"], 1),
    ("anilinium", "charged-benzenes", ["[NH3+]c1ccccc1"], 1),
    ("benzoate", "charged-benzenes", ["[O-]C(=O)c1ccccc1",
                                      "O=C([O-])c1ccccc1"], 1),
    ("glycine-zwitterion", "glycine", ["[NH3+]CC(=O)[O-]",
                                       "C([NH3+])C(=O)[O-]"], 1),
    ("glycine-neutral", "glycine", ["NCC(=O)O"], 1),
    # --- fused / polycyclic aromatics (perception + traversal) ---
    ("quinoline", "benzo-azines", ["c1ccc2ncccc2c1",
                                   "C1=CC=C2C(=C1)C=CC=N2"], 1),
    ("isoquinoline", "benzo-azines", ["c1ccc2cnccc2c1",
                                      "C1=CC=C2C=NC=CC2=C1"], 1),
    ("quinoxaline", "benzo-azines", ["c1ccc2nccnc2c1"], 2),
    ("purine", "purines", ["c1ncc2[nH]cnc2n1"], 2),
    ("caffeine", "purines", ["Cn1cnc2c1c(=O)n(C)c(=O)n2C"], 2),
    ("carbazole", "tricyclic-heteroarenes", ["c1ccc2c(c1)[nH]c1ccccc12"], 2),
    ("dibenzofuran", "tricyclic-heteroarenes", ["c1ccc2c(c1)oc1ccccc12"], 2),
    ("acridine", "tricyclic-heteroarenes", ["c1ccc2nc3ccccc3cc2c1"], 2),
    ("benzimidazole", "benzazoles", ["c1ccc2[nH]cnc2c1"], 2),
    ("benzothiophene", "benzazoles", ["c1ccc2c(c1)ccs2"], 2),
    ("benzofuran", "benzazoles", ["c1ccc2c(c1)cco2"], 2),
    # --- five/six-membered heteroaromatics (perception coverage) ---
    ("oxazole", "azole-isomers", ["c1ocnc1"], 2),
    ("isoxazole", "azole-isomers", ["c1ccon1"], 2),
    ("thiazole", "azole-isomers", ["c1cscn1"], 2),
    ("pyrazole", "azole-isomers", ["c1cc[nH]n1"], 2),
    ("tetrazole", "azole-isomers", ["c1nnn[nH]1"], 2),
    ("pyrimidine", "diazines", ["c1cncnc1"], 2),
    ("pyrazine", "diazines", ["c1cnccn1"], 2),
    ("pyridazine", "diazines", ["c1ccnnc1"], 2),
    ("s-triazine", "diazines", ["c1ncncn1"], 2),
    # --- polycyclic alkanes: ring-closure / traversal torture ---
    ("adamantane", "cage-alkanes", ["C1C2CC3CC1CC(C2)C3"], 3),
    ("cubane", "cage-alkanes", ["C12C3C4C1C5C2C3C45"], 3),
    ("norbornane", "bicyclics", ["C1CC2CCC1C2"], 3),
    ("decalin", "bicyclics", ["C1CCC2CCCCC2C1"], 3),
    ("spiro55undecane", "bicyclics", ["C1CCC2(CC1)CCCCC2"], 3),
    # --- isotopes ---
    ("heavy-water", "water-isotopes", ["[2H]O[2H]"], 0),
    ("water", "water-isotopes", ["O"], 0),
    ("15N-ammonia", "ammonia-isotopes", ["[15NH3]"], 0),
    ("ammonia", "ammonia-isotopes", ["N"], 0),
    # --- sulfur/phosphorus oxidation states ---
    ("dimethylsulfone", "sulfur-ox", ["CS(C)(=O)=O"], 1),
    ("methanesulfonic-acid", "sulfur-ox", ["CS(=O)(=O)O"], 1),
    ("methanesulfonamide", "sulfur-ox", ["CS(N)(=O)=O"], 1),
    ("trimethyl-phosphate", "phosphorus", ["COP(=O)(OC)OC"], 2),
    ("triphenylphosphine", "phosphorus",
     ["c1ccc(P(c2ccccc2)c2ccccc2)cc1"], 2),
]


def main():
    path = os.path.join(HERE, "canon_groups.json")
    with open(path) as f:
        data = json.load(f)
    existing = {g["name"] for g in data["groups"]}

    rng = random.Random(20260817)
    failures = []
    added = []
    for name, family, spellings, n_gen in NEW:
        if name in existing:
            continue
        all_spellings = list(spellings)
        try:
            base = canonical_smiles_strict(spellings[0])
        except Exception as e:
            failures.append((name, spellings[0], f"parse: {e}"))
            continue
        for s in spellings[1:]:
            try:
                c = canonical_smiles_strict(s)
            except Exception as e:
                failures.append((name, s, f"parse: {e}"))
                continue
            if c != base:
                failures.append((name, s, f"canon mismatch: {c} != {base}"))
        for _ in range(n_gen):
            alt, _order = random_smiles(spellings[0], rng)
            try:
                c = canonical_smiles_strict(alt)
            except Exception as e:
                failures.append((name, alt, f"respell parse: {e}"))
                continue
            if c != base:
                failures.append((name, alt, f"respell mismatch: {c} != {base}"))
            elif alt not in all_spellings:
                all_spellings.append(alt)
        added.append({"name": name, "family": family,
                      "smiles": all_spellings, "rdkit_canonical": None})

    # family distinctness over the merged set
    groups = data["groups"] + added
    fams = {}
    for g in groups:
        fams.setdefault(g["family"], []).append(g)
    for fam, members in fams.items():
        canons = {}
        for g in members:
            c = canonical_smiles_strict(g["smiles"][0])
            if c in canons:
                failures.append((fam, g["name"],
                                 f"collides with {canons[c]}: {c}"))
            canons[c] = g["name"]

    if failures:
        for f_ in failures:
            print("FAIL:", *f_)
        return 1
    data["groups"] = groups
    with open(path, "w") as f:
        json.dump(data, f, indent=1)
    print(f"wrote {len(groups)} groups (+{len(added)})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
