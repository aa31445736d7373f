"""Round-5 golden widening (VERDICT r4 item 8): charged stereocenters,
stereo multi-fragment salts, ring-fusion stereochemistry, heteroatom
(S/P) stereocenters, deuterated stereocenters, and charged positional
isomers. Same validation discipline as extend_goldens_r3/r4: every group
is checked (members + generated respellings canonicalize together,
families apart) before anything is written; a failure refuses the whole
write. Run once:

    python tests/golden/extend_goldens_r5.py
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
    # --- charged stereocenters (tetrahedral N+; R/S must stay apart) ---
    ("r-ammonium-quat", "ammonium-stereo",
     ["CC[N@+](C)(CCC)CCCC"], 4),
    ("s-ammonium-quat", "ammonium-stereo",
     ["CC[N@@+](C)(CCC)CCCC"], 4),
    # --- zwitterionic amino acid: stereo + two charged sites ---
    ("l-alanine-zwitterion", "alanine-zwitterion-stereo",
     ["C[C@H]([NH3+])C(=O)[O-]", "[NH3+][C@@H](C)C(=O)[O-]"], 3),
    ("d-alanine-zwitterion", "alanine-zwitterion-stereo",
     ["C[C@@H]([NH3+])C(=O)[O-]"], 3),
    # --- stereocenter bearing a charged substituent ---
    ("r-trimethylammonio-butane", "ammonio-stereo",
     ["CC[C@H](C)[N+](C)(C)C"], 3),
    ("s-trimethylammonio-butane", "ammonio-stereo",
     ["CC[C@@H](C)[N+](C)(C)C"], 3),
    # --- multi-fragment salts with stereo (fragment order + counterion) ---
    ("sodium-l-lactate", "lactate-salt-stereo",
     ["C[C@H](O)C(=O)[O-].[Na+]", "[Na+].C[C@H](O)C(=O)[O-]"], 3),
    ("sodium-d-lactate", "lactate-salt-stereo",
     ["C[C@@H](O)C(=O)[O-].[Na+]"], 3),
    ("l-lactic-acid", "lactic-acid",
     ["C[C@H](O)C(=O)O"], 3),
    # --- dependent ring-fusion stereo: RDKit-legacy sanitize DROPS decalin
    # fusion tags (identical ring-arm substituents -> not stereocenters by
    # rank analysis); all tagged spellings collapse to the untagged string.
    # Finding this (tagged respellings canonicalized input-dependently) is
    # what motivated canon.drop_nonstereogenic_tags in round 5.
    ("decalin-any-fusion-tags", "decalins",
     ["C1CCC2CCCCC2C1", "C1CC[C@@H]2CCCC[C@H]2C1",
      "C1CC[C@H]2CCCC[C@H]2C1", "C1CC[C@@H]2CCCC[C@@H]2C1"], 3),
    # ...but NON-equivalent ring arms keep their fusion stereo: the chiral
    # trans-1,2-dimethylcyclohexane pair stays distinct, the achiral cis
    # (meso-like) spellings merge
    ("trans-12-dmch-RR", "dmch-stereo", ["C[C@H]1CCCC[C@@H]1C"], 3),
    ("trans-12-dmch-SS", "dmch-stereo", ["C[C@@H]1CCCC[C@H]1C"], 3),
    ("cis-12-dmch-meso", "dmch-stereo",
     ["C[C@H]1CCCC[C@H]1C", "C[C@@H]1CCCC[C@@H]1C"], 3),
    # --- heteroatom stereocenters: sulfoxide S(=O) keeps its tag ---
    ("r-methylphenyl-sulfoxide", "sulfoxide-stereo",
     ["C[S@](=O)c1ccccc1"], 3),
    ("s-methylphenyl-sulfoxide", "sulfoxide-stereo",
     ["C[S@@](=O)c1ccccc1"], 3),
    # --- phosphine stereocenter (P with 3 substituents + lone pair) ---
    ("r-methylethylphenyl-phosphine", "phosphine-stereo",
     ["CC[P@](C)c1ccccc1"], 3),
    ("s-methylethylphenyl-phosphine", "phosphine-stereo",
     ["CC[P@@](C)c1ccccc1"], 3),
    # --- deuterated stereocenter: isotope makes C a stereocenter ---
    ("r-deuterio-ethanol", "deuterio-stereo",
     ["[2H][C@](C)(O)CC"], 3),
    ("s-deuterio-ethanol", "deuterio-stereo",
     ["[2H][C@@](C)(O)CC"], 3),
    # --- charged positional isomers (collision traps) ---
    ("1,2-dimethylpyridinium", "methylpyridinium-isomers",
     ["Cc1cccc[n+]1C"], 2),
    ("1,3-dimethylpyridinium", "methylpyridinium-isomers",
     ["Cc1ccc[n+](C)c1"], 2),
    ("1,4-dimethylpyridinium", "methylpyridinium-isomers",
     ["Cc1cc[n+](C)cc1"], 2),
    # --- E/Z next to a charged group ---
    ("e-4-ammoniobut-2-enoate", "enoate-ez-stereo",
     ["[NH3+]C/C=C/C(=O)[O-]"], 2),
    ("z-4-ammoniobut-2-enoate", "enoate-ez-stereo",
     ["[NH3+]C/C=C\\C(=O)[O-]"], 2),
    # --- stereo at a ring atom adjacent to a spiro junction ---
    ("r-1-methylspiro44nonan-2-ol", "spiro-stereo",
     ["C[C@H]1CCC2(CCCC2)O1"], 3),
    ("s-1-methylspiro44nonan-2-ol", "spiro-stereo",
     ["C[C@@H]1CCC2(CCCC2)O1"], 3),
]


def main():
    path = os.path.join(HERE, "canon_groups.json")
    with open(path) as f:
        data = json.load(f)
    existing = {g["name"] for g in data["groups"]}

    rng = random.Random(20260819)
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
