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


def test_stereo_canonicalization_mirror_invariants():
    """Stereo canonicalization invariants (round-3 meso fix):
    - respelling closure: every random re-traversal of a stereo SMILES
      canonicalizes to the same string;
    - mirror consistency: flipping every tetrahedral tag maps a molecule to
      its enantiomer — a DIFFERENT canonical unless the molecule is meso;
    - meso compounds written from either end canonicalize identically."""
    import random

    from textreact_tpu.chem import canonical_smiles_strict, random_smiles

    rng = random.Random(11)

    def closure(s, n=25):
        canons = {canonical_smiles_strict(s)}
        for _ in range(n):
            alt, _ = random_smiles(s, rng)
            canons.add(canonical_smiles_strict(alt))
        assert len(canons) == 1, (s, canons)
        return canons.pop()

    def mirror(s):
        return (s.replace("@@", "\x00").replace("@", "@@")
                .replace("\x00", "@"))

    chiral = ["N[C@@H](C)C(=O)O", "C[C@H](O)CC", "OC[C@@H](O)C=O",
              "C[C@H](Br)[C@@H](Br)C", "O=C(O)[C@H](O)[C@@H](O)C(=O)O"]
    meso = ["O=C(O)[C@H](O)[C@H](O)C(=O)O", "C[C@H](Br)[C@H](Br)C"]
    for s in chiral:
        assert closure(s) != closure(mirror(s)), s
    for s in meso:
        assert closure(s) == closure(mirror(s)), s


def test_stereo_python_cpp_agreement_fuzz():
    """python vs C++ canonicalizer agreement over random respellings of
    stereo-rich, charged, and fused-aromatic molecules (VERDICT r2 item 6)."""
    import random

    import pytest

    from textreact_tpu.chem import canonical_smiles_strict, random_smiles
    from textreact_tpu.chem.native import native_available

    if not native_available():
        pytest.skip("no C++ toolchain")
    from textreact_tpu.chem.native import native_canonical_smiles

    mols = ["N[C@@H](C)C(=O)O", "O=C(O)[C@H](O)[C@H](O)C(=O)O",
            "O=C(O)[C@H](O)[C@@H](O)C(=O)O", "C[C@H](Br)[C@@H](Br)C",
            "C/C=C/C(=O)O", "C/C=C\\Br", "c1ccc2nc3ccccc3cc2c1",
            "Cn1cnc2c1c(=O)n(C)c(=O)n2C", "[NH3+]CC(=O)[O-]",
            "c1c[nH]c[nH+]1", "c1ccc[o+]c1", "C1C2CC3CC1CC(C2)C3",
            "C12C3C4C1C5C2C3C45", "O[C@@H]1CC[C@H](N)CC1"]
    rng = random.Random(5)
    for s in mols:
        assert native_canonical_smiles(s) == canonical_smiles_strict(s), s
        for _ in range(10):
            alt, _ = random_smiles(s, rng)
            assert native_canonical_smiles(alt) == \
                canonical_smiles_strict(alt), (s, alt)


def test_explicit_h_fold_matches_rdkit_parse_semantics():
    """canonical_smiles folds removable explicit [H] atoms like RDKit's
    MolFromSmiles (removeHs default) — same canonical as the implicit
    spelling, with stereo parity reconciled through the freed slot; kept
    for isotopic/charged/H2 hydrogens (review r3 finding)."""
    from textreact_tpu.chem import canonical_smiles_strict as c

    assert c("[H]OC") == c("OC") == c("CO")
    assert c("C([H])([H])([H])[H]") == c("C")
    # enantiomers stay distinct and fold to the RIGHT side
    assert c("[C@]([H])(N)(O)C") == c("[C@H](N)(O)C")
    assert c("[C@](N)([H])(O)C") == c("[C@@H](N)(O)C")
    assert c("[C@]([H])(N)(O)C") != c("[C@](N)([H])(O)C")
    # not removable: isotope, charge, H-H, atom-mapped
    assert c("[2H]O[2H]") != c("O")
    assert c("[H][H]") == "[H][H]"
    assert "H" in c("[H+].[Cl-]")


# ---------------------------------------------------------------------------
# SMARTS matcher vs brute-force subgraph-isomorphism oracle (VERDICT r3
# item 6). The oracle enumerates EVERY injective query->mol atom mapping
# with itertools.permutations, reusing the matcher's own atom/bond
# predicates — so any disagreement isolates a bug in the backtracking
# search itself (anchor ordering, used-set handling, fragment interleaving),
# the part rdchiral delegates to RDKit's VF2 (reference
# template_extractor.py:517-626 relies on GetSubstructMatches).
# ---------------------------------------------------------------------------

SMARTS_ATOMS = ["C", "N", "O", "c", "[#6]", "[C,N]", "[!O]", "[R]", "[!R]",
                "[D1]", "[D2]", "*", "[C;R]", "[O,N;D1]", "[#7,#8]"]
SMARTS_BONDS = ["", "-", "=", "~", "#"]


def random_smarts(rng: random.Random) -> str:
    """Small random pattern: chain of 2-4 atoms, optional branch, optional
    3-ring closure, optional second fragment ('.')."""
    n = rng.randrange(2, 5)
    atoms = [rng.choice(SMARTS_ATOMS) for _ in range(n)]
    bonds = [rng.choice(SMARTS_BONDS) for _ in range(n - 1)]
    if n >= 3 and rng.random() < 0.3:  # branch off atom 0
        s = atoms[0] + "(" + bonds[0] + atoms[1] + ")"
        rest = "".join(b + a for b, a in zip(bonds[1:], atoms[2:]))
        pat = s + rest
    elif n >= 3 and rng.random() < 0.3:  # close a ring over the whole chain
        pat = atoms[0] + "1" + "".join(
            b + a for b, a in zip(bonds, atoms[1:])) + "1"
    else:
        pat = atoms[0] + "".join(b + a for b, a in zip(bonds, atoms[1:]))
    if rng.random() < 0.25:  # detached second fragment
        pat += "." + rng.choice(SMARTS_ATOMS)
    return pat


def oracle_matches(query, mol):
    """All embeddings by exhaustive injective enumeration."""
    import itertools

    from textreact_tpu.chem.smarts import (_bond_matches, atom_matches,
                                           ring_membership)

    in_ring, _ = ring_membership(mol)
    nq, nm = len(query.atoms), len(mol.atoms)
    found = set()
    for perm in itertools.permutations(range(nm), nq):
        ok = all(atom_matches(query.atoms[q], mol, m, in_ring)
                 for q, m in enumerate(perm))
        if not ok:
            continue
        for qb in query.bonds:
            mb = mol.bond_between(perm[qb.a1], perm[qb.a2])
            if mb is None or not _bond_matches(qb.spec, mb):
                ok = False
                break
        if ok:
            found.add(tuple(perm))
    return found


@pytest.mark.parametrize("seed", range(60))
def test_smarts_matcher_vs_bruteforce_oracle(seed):
    from textreact_tpu.chem.smarts import find_matches, parse_smarts

    rng = random.Random(1000 + seed)
    mol = random_mol(rng)   # <=13 atoms, so the n!/(n-k)! oracle stays cheap
    for _ in range(6):
        pat = random_smarts(rng)
        try:
            query = parse_smarts(pat)
        except Exception:
            continue
        if len(query.atoms) > len(mol.atoms):
            continue
        got = {tuple(m[q] for q in range(len(query.atoms)))
               for m in find_matches(query, mol, max_matches=10 ** 6)}
        want = oracle_matches(query, mol)
        assert got == want, (pat, sorted(got)[:5], sorted(want)[:5])


def test_dependent_ring_fusion_stereo_drops_like_rdkit_legacy():
    """Round-5 finding: decalin fusion carbons have two graph-identical ring
    arms, so no spelling-invariant rule can order them — keeping their tags
    made the 'canonical' string follow input order. RDKit-legacy sanitize
    (which the reference hits on every MolFromSmiles, evaluate.py:27-32)
    drops exactly these tags; canon.drop_nonstereogenic_tags mirrors that.
    Pins: all tagged decalin spellings collapse to the untagged string,
    respelling-invariant; independent stereocenters are untouched (meso
    stays merged, enantiomers stay apart, spiro/fusion with DISTINCT arms
    keeps its tags)."""
    import random as _r

    from textreact_tpu.chem import canonical_smiles_strict as canon
    from textreact_tpu.chem import random_smiles

    untagged = canon("C1CCC2CCCCC2C1")
    spellings = ["C1CC[C@@H]2CCCC[C@H]2C1", "C1CC[C@H]2CCCC[C@H]2C1",
                 "C1CC[C@@H]2CCCC[C@@H]2C1"]
    rng = _r.Random(5)
    for s in spellings:
        assert canon(s) == untagged, (s, canon(s))
        for _ in range(5):
            alt, _ = random_smiles(s, rng)
            assert canon(alt) == untagged, (s, alt, canon(alt))
    # independent stereocenters: trans-1,2-dimethylcyclohexane enantiomers
    # distinct; cis (meso-like) spellings merge; plain enantiomers distinct
    assert canon("C[C@H]1CCCC[C@@H]1C") != canon("C[C@@H]1CCCC[C@H]1C")
    assert canon("C[C@H]1CCCC[C@H]1C") == canon("C[C@@H]1CCCC[C@@H]1C")
    assert canon("C[C@H](N)C(=O)O") != canon("C[C@@H](N)C(=O)O")
    # python <-> C++ agreement on the new rule
    from textreact_tpu.chem.native import native_available, native_canonical_smiles
    if native_available():
        for s in spellings + ["C[C@H]1CCCC[C@@H]1C", "C[C@H]1CCCC[C@H]1C"]:
            assert native_canonical_smiles(s) == canon(s), s
