"""Round-4 golden widening (VERDICT r3 item 6): bridged/caged ring systems,
bridgehead-nitrogen aromatics, saturated heterocycles, and tautomer-adjacent
trap PAIRS (constitutional isomers that must canonicalize — and fingerprint —
apart). Same validation discipline as extend_goldens_r3.py: every group is
checked (members canonicalize together, families apart) before anything is
written; a failure refuses the whole write. Run once:

    python tests/golden/extend_goldens_r4.py
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
    # --- bridged / caged saturated systems (ring-closure torture) ---
    ("bicyclo222octane", "bicyclics", ["C1CC2CCC1CC2"], 3),
    ("bicyclo111pentane", "bicyclics", ["C1C2CC1C2"], 3),
    ("spiropentane", "bicyclics", ["C1CC12CC2"], 3),
    ("norbornene", "bridged-unsat", ["C1CC2CC1C=C2", "C1=CC2CCC1C2"], 3),
    ("barrelene", "bridged-unsat", ["C1=CC2C=CC1C=C2"], 3),
    ("camphor", "bridged-unsat", ["CC1(C)C2CCC1(C)C(=O)C2"], 3),
    # --- bridgehead-nitrogen / bridged heterocycles ---
    ("quinuclidine", "bridged-hetero", ["C1CN2CCC1CC2"], 3),
    ("dabco", "bridged-hetero", ["C1CN2CCN1CC2"], 3),
    ("7-oxanorbornane", "bridged-hetero", ["C1CC2CCC1O2"], 3),
    # --- saturated heterocycles (perception must NOT aromatize) ---
    ("morpholine", "sat-heterocycles", ["O1CCNCC1", "C1COCCN1"], 2),
    ("piperazine", "sat-heterocycles", ["C1CNCCN1"], 2),
    ("piperidine", "sat-heterocycles", ["C1CCNCC1"], 2),
    ("tetrahydropyran", "sat-heterocycles", ["C1CCOCC1"], 2),
    # --- bridgehead/fused aromatics ---
    ("indolizine", "bridgehead-aromatics", ["c1ccn2ccccc12"], 2),
    ("azulene", "bridgehead-aromatics", ["c1ccc2cccc2cc1"], 2),
    ("biphenylene", "bridgehead-aromatics", ["c1ccc2c(c1)-c1ccccc1-2"], 2),
    # --- tautomer-adjacent traps: constitutional isomers stay DISTINCT ---
    # (2-pyridone joins round-3's '2-hydroxypyridine' in family 'pyridones')
    ("2-pyridone", "pyridones", ["O=c1cccc[nH]1"], 2),
    ("2-aminopyridine", "aminopyridine-taut", ["Nc1ccccn1"], 2),
    ("2-iminopyridine", "aminopyridine-taut", ["N=c1cccc[nH]1"], 2),
    ("cyclohexanone", "cyclohexanone-enol", ["O=C1CCCCC1"], 2),
    ("cyclohexen-1-ol", "cyclohexanone-enol", ["OC1=CCCCC1"], 2),
    ("acetamide", "amide-taut", ["CC(N)=O", "NC(C)=O"], 2),
    ("acetimidic-acid", "amide-taut", ["CC(=N)O"], 2),
    ("2-hydroxypyrimidine", "pyrimidinone-taut", ["Oc1ncccn1"], 2),
    ("2-pyrimidone", "pyrimidinone-taut", ["O=c1nccc[nH]1"], 2),
    ("4-methylimidazole", "methylimidazole-taut", ["Cc1c[nH]cn1"], 2),
    ("5-methylimidazole", "methylimidazole-taut", ["Cc1cnc[nH]1"], 2),
    ("nitrosomethane", "nitroso-oxime", ["CN=O"], 1),
    ("formaldoxime", "nitroso-oxime", ["C=NO"], 1),
    # --- charged azines ---
    ("n-methylpyridinium", "charged-azines", ["C[n+]1ccccc1"], 2),
    ("pyridine-n-oxide", "charged-azines", ["[O-][n+]1ccccc1"], 2),
]


def main():
    path = os.path.join(HERE, "canon_groups.json")
    with open(path) as f:
        data = json.load(f)
    existing = {g["name"] for g in data["groups"]}

    rng = random.Random(20260818)
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
