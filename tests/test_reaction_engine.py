"""Native SMARTS matcher + reaction engine + RDKit-free template decoding.

Hand-authored chemistry (ester hydrolysis, aryl bromide, amide coupling)
with certain expected reactants pins the decode semantics of reference
template_decoder.py without RDKit in the image.
"""

import os

import pandas as pd
import pytest

from textreact_tpu.chem import canonical_smiles, parse_smiles
from textreact_tpu.chem.reaction import mol_fragments_smiles, run_retro_template
from textreact_tpu.chem.smarts import find_matches, parse_smarts
from textreact_tpu.evaluation._own_template_apply import apply_ranked_edits

ESTER_TPL = ("[C:1](=[O:2])-[O;H0;D2;+0:3]>>"
             "[C:1](=[O:2])-[OH;D1;+0:4].[OH;D1;+0:3]")
ESTER_INFO = {"edit_site": {"B": [(1, 3)]},
              "change_H": {1: 0, 2: 0, 3: 1},
              "change_C": {1: 0, 2: 0, 3: 0},
              "change_S": {1: 0, 2: 0, 3: 0}}

AMIDE_TPL = ("[C:1](=[O:2])-[N;H1;D2;+0:3]>>"
             "[C:1](=[O:2])-[OH;D1;+0:4].[NH2;D1;+0:3]")
AMIDE_INFO = {"edit_site": {"B": [(1, 3)]},
              "change_H": {1: 0, 2: 0, 3: 1},
              "change_C": {1: 0, 2: 0, 3: 0},
              "change_S": {1: 0, 2: 0, 3: 0}}

BR_TPL = "[Br;H0;D1;+0:1]-[c:2]>>[Br;H0;D1;+0:1]-[Br;H0;D1;+0:3].[cH:2]"
BR_INFO = {"edit_site": {"B": [(1, 2)]},
           "change_H": {1: 0, 2: 1}, "change_C": {1: 0, 2: 0},
           "change_S": {1: 0, 2: 0}}


def test_smarts_predicates():
    mol = parse_smiles("CC(=O)Oc1ccc(N)cc1")
    assert len(find_matches(parse_smarts("[OH0;D2]"), mol)) == 1  # ester O
    assert len(find_matches(parse_smarts("[NH2;D1;+0]"), mol)) == 1
    assert len(find_matches(parse_smarts("c"), mol)) == 6
    assert len(find_matches(parse_smarts("[c;!H1]"), mol)) == 2  # subst. ring C
    assert len(find_matches(parse_smarts("[#6;A]"), mol)) == 2   # aliphatic C
    assert len(find_matches(parse_smarts("[O,N;D1]"), mol)) == 2  # =O and NH2
    # bond specs: '=' matches only the carbonyl, ':' only ring bonds
    assert len(find_matches(parse_smarts("[C]=[O]"), mol)) == 1
    assert len(find_matches(parse_smarts("c:c"), mol)) == 12     # both dirs
    assert len(find_matches(parse_smarts("[C]#[N]"), mol)) == 0


def test_run_retro_template_ester():
    mol = parse_smiles("CCOC(C)=O")
    outs = run_retro_template(mol, f"({ESTER_TPL.split('>>')[0]})>>"
                                   f"({ESTER_TPL.split('>>')[1]})")
    assert len(outs) == 1
    assert mol_fragments_smiles(outs[0].mol) == canonical_smiles("CC(=O)O.CCO")
    # bookkeeping: map 1 -> ester carbon (idx 3), map 3 -> ester O (idx 2)
    assert outs[0].map_to_product[1] == 3
    assert outs[0].map_to_product[3] == 2


def test_decode_requires_matching_site():
    bond_templates = {1: ESTER_TPL}
    infos = {ESTER_TPL: ESTER_INFO}
    hit = apply_ranked_edits([("b", (3, 2), 1, 0.9)], "CCOC(C)=O", {},
                             bond_templates, infos, 5)
    assert hit == [canonical_smiles("CC(=O)O.CCO")]
    miss = apply_ranked_edits([("b", (0, 1), 1, 0.9)], "CCOC(C)=O", {},
                              bond_templates, infos, 5)
    assert miss == []


def test_decode_walks_ranked_list_and_dedupes():
    bond_templates = {1: ESTER_TPL, 2: AMIDE_TPL}
    infos = {ESTER_TPL: ESTER_INFO, AMIDE_TPL: AMIDE_INFO}
    # paracetamol-like amide: acetanilide CC(=O)Nc1ccccc1 (amide C idx 1, N idx 3)
    preds = [("b", (1, 3), 1, 0.9),   # ester template at amide site: no match
             ("b", (1, 3), 2, 0.8),   # amide template: decodes
             ("b", (1, 3), 2, 0.7)]   # duplicate: deduped
    out = apply_ranked_edits(preds, "CC(=O)Nc1ccccc1", {}, bond_templates,
                             infos, 5)
    assert out == [canonical_smiles("CC(=O)O.Nc1ccccc1")]


def test_decode_aromatic_bromide():
    out = apply_ranked_edits([("b", (0, 1), 1, 0.9)], "Brc1ccccc1", {},
                             {1: BR_TPL}, {BR_TPL: BR_INFO}, 5)
    assert out == [canonical_smiles("BrBr.c1ccccc1")]


def test_decode_rejects_negative_h():
    info = {"edit_site": {"B": [(1, 3)]},
            "change_H": {1: 0, 2: 0, 3: -2},  # ester O has 0 H in product
            "change_C": {1: 0, 2: 0, 3: 0},
            "change_S": {1: 0, 2: 0, 3: 0}}
    out = apply_ranked_edits([("b", (3, 2), 1, 0.9)], "CCOC(C)=O", {},
                             {1: ESTER_TPL}, {ESTER_TPL: info}, 5)
    assert out == []


def test_atom_edit_site():
    info = {"edit_site": {"A": [1]},
            "change_H": {1: 0, 2: 0, 3: 1},
            "change_C": {1: 0, 2: 0, 3: 0},
            "change_S": {1: 0, 2: 0, 3: 0}}
    # atom-type prediction at the ester carbon (idx 3)
    out = apply_ranked_edits([("a", 3, 1, 0.9)], "CCOC(C)=O",
                             {1: ESTER_TPL}, {}, {ESTER_TPL: info}, 5)
    assert out == [canonical_smiles("CC(=O)O.CCO")]
    assert apply_ranked_edits([("a", 0, 1, 0.9)], "CCOC(C)=O",
                              {1: ESTER_TPL}, {}, {ESTER_TPL: info}, 5) == []


@pytest.mark.parametrize("product,tpl,info,expect", [
    # gamma-butyrolactone: hydrolysis OPENS the ring -> single fragment
    ("O=C1CCCO1", ESTER_TPL, ESTER_INFO, "OCCCC(=O)O"),
    # 2-pyrrolidone (lactam) with the amide template
    ("O=C1CCCN1", AMIDE_TPL, AMIDE_INFO, "NCCCC(=O)O"),
])
def test_ring_opening_templates(product, tpl, info, expect):
    mol = parse_smiles(product)
    lhs = tpl.split(">>")[0]
    m = find_matches(parse_smarts(lhs), mol)[0]
    out = apply_ranked_edits([("b", (m[0], m[2]), 1, 0.9)], product, {},
                             {1: tpl}, {tpl: info}, 5)
    assert out == [canonical_smiles(expect)], out


def test_smarts_review_regressions():
    """Pinned fixes from the engine review: '&' conjunction, two-letter
    elements vs a/A/H primitives, any-size ring membership, malformed-ring
    error type."""
    from textreact_tpu.chem.smarts import SmartsParseError

    mol = parse_smiles("CCO")
    assert len(find_matches(parse_smarts("[C&H2:1]"), mol)) == 1
    assert len(find_matches(parse_smarts("[Al]"),
                            parse_smiles("[Al](Cl)(Cl)Cl"))) == 1
    assert len(find_matches(parse_smarts("[As]"),
                            parse_smiles("[AsH3]"))) == 1
    parse_smarts("[Mn]"), parse_smarts("[Sc]"), parse_smarts("[Hg]")
    # ring membership is exact for rings beyond size 7
    assert len(find_matches(parse_smarts("[C;R]"),
                            parse_smiles("C1CCCCCCC1"))) == 8
    assert len(find_matches(parse_smarts("[C;!R]"),
                            parse_smiles("CC1CC1"))) == 1
    with pytest.raises(SmartsParseError):
        parse_smarts("1CC1")
    # advisor r2: unbalanced '(' and truncated %-ring must raise the
    # parser's own error type, not slip through / raise bare ValueError
    with pytest.raises(SmartsParseError):
        parse_smarts("C(C")
    with pytest.raises(SmartsParseError):
        parse_smarts("CC%")
    with pytest.raises(SmartsParseError):
        parse_smarts("CC%1")


def test_uncreatable_rhs_checked_before_matching():
    """Advisor r2: the un-creatable-RHS-atom bailout must not discard
    results accumulated from earlier matches (hoisted above the loop)."""
    from textreact_tpu.chem.reaction import run_retro_template
    mol = parse_smiles("CCOC(C)=O")
    # RHS creates an unmapped wildcard atom: no match can ever be built
    assert run_retro_template(mol, "[C:1]-[O:2]>>[C:1]-[O:2]-[*]") == []
    # sanity: the same LHS with a creatable RHS atom still yields results
    assert run_retro_template(mol, "[C:1]-[O:2]>>[C:1].[O:2]-[CH3]")


def test_rhs_anum_preserves_aromaticity():
    """[#6:n] on the RHS asserts nothing about aromaticity: a ring carbon
    must stay aromatic (RunReactants semantics)."""
    mol = parse_smiles("Cc1ccccc1")
    outs = run_retro_template(mol, "([c:1]-[CH3;D1:2])>>([#6:1]).([CH3:2])")
    assert outs
    ring_atom = outs[0].mol.atoms[outs[0].map_to_new[1]]
    assert ring_atom.aromatic


def test_change_s_minus_one_clears_chirality():
    tpl = "[C:1]-[OH;D1;+0:2]>>[C:1].[OH;D1;+0:2]"
    info = {"edit_site": {"B": [(1, 2)]},
            "change_H": {1: 1, 2: 0}, "change_C": {1: 0, 2: 0},
            "change_S": {1: -1, 2: 0}}
    out = apply_ranked_edits([("b", (1, 2), 1, 0.9)], "C[C@H](O)c1ccccc1",
                             {}, {1: tpl}, {tpl: info}, 5)
    assert out and "@" not in out[0], out


def test_canonical_frag_index_positions():
    from textreact_tpu.evaluation._own_template_apply import \
        _canonical_frag_index
    mol = parse_smiles("CCO.CC(=O)O")
    mapping = _canonical_frag_index(mol)
    # every atom maps to a position within its own fragment
    assert set(mapping) == set(range(len(mol.atoms)))
    assert sorted(mapping[i] for i in range(3)) == [0, 1, 2]      # CCO
    assert sorted(mapping[i] for i in range(3, 7)) == [0, 1, 2, 3]


def test_matcher_selfmatch_fuzz():
    """A molecule's own structure (as explicit SMARTS with element+H+D+charge
    per atom) must match itself exactly at the identity-ish embedding."""
    import random

    from textreact_tpu.chem.smarts import QueryAtom, QueryMol, _Prim
    from textreact_tpu.chem.smarts import B_AROMATIC, B_DOUBLE, B_SINGLE, B_TRIPLE
    from textreact_tpu.chem.mol import DOUBLE, SINGLE, TRIPLE

    mols = ["CCO", "c1ccccc1O", "CC(=O)Nc1ccc(Br)cc1", "C/C=C/C(=O)O",
            "[O-]S(=O)(=O)[O-]", "C1CC2CCC1CC2", "c1cc[nH]c1"]
    for smi in mols:
        mol = parse_smiles(smi)
        q = QueryMol()
        for a in mol.atoms:
            prims = [_Prim("elem", (a.symbol, a.aromatic)),
                     _Prim("H", a.total_h), _Prim("D", mol.degree(a.idx)),
                     _Prim("charge", a.charge)]
            q.add_atom(QueryAtom(clauses=[[prims]]))
        for b in mol.bonds:
            spec = (B_AROMATIC if b.aromatic else
                    {SINGLE: B_SINGLE, DOUBLE: B_DOUBLE,
                     TRIPLE: B_TRIPLE}[b.order])
            q.add_bond(b.a1, b.a2, spec)
        q.fragments = mol.fragment_atom_sets()
        matches = find_matches(q, mol)
        assert any(all(m[i] == i for i in range(len(mol.atoms)))
                   for m in matches), smi


def test_bond_cut_property_fuzz():
    """Property fuzz over realistic molecules: for every non-ring single
    bond, a template generated from the two endpoint atoms must apply at
    exactly that bond and split the molecule into one more fragment,
    preserving the atom count."""
    from test_chem_fuzz import DRUGS

    from textreact_tpu.chem.smarts import ring_membership
    from textreact_tpu.chem.mol import SINGLE

    def atom_spec(mol, idx, mapno):
        a = mol.atoms[idx]
        sym = a.symbol.lower() if a.aromatic else a.symbol
        return f"[{sym}H{a.total_h};{a.charge:+d};D{mol.degree(idx)}:{mapno}]"

    checked = 0
    for smi in DRUGS:
        mol = parse_smiles(smi)
        n_frags = len(mol.fragment_atom_sets())
        _, in_ring_bond = ring_membership(mol)
        for bidx, b in enumerate(mol.bonds):
            if in_ring_bond[bidx] or b.order != SINGLE or b.aromatic:
                continue
            if "H" in (mol.atoms[b.a1].symbol, mol.atoms[b.a2].symbol):
                continue  # explicit-H atoms need [#1] specs in SMARTS
            lhs = f"{atom_spec(mol, b.a1, 1)}-{atom_spec(mol, b.a2, 2)}"
            tpl = f"({lhs})>>({atom_spec(mol, b.a1, 1)}).({atom_spec(mol, b.a2, 2)})"
            outs = run_retro_template(mol, tpl)
            hits = [o for o in outs
                    if o.map_to_product[1] == b.a1
                    and o.map_to_product[2] == b.a2]
            assert hits, (smi, bidx, tpl)
            out = hits[0]
            assert len(out.mol.atoms) == len(mol.atoms)
            assert len(out.mol.fragment_atom_sets()) == n_frags + 1, (smi, bidx)
            assert mol_fragments_smiles(out.mol) is not None, (smi, bidx)
            checked += 1
    assert checked > 80, checked


def test_own_decoder_agrees_with_rdkit_when_available():
    """When RDKit is importable, the native decoder must produce the same
    molecules as the RDKit twin on the fixture templates (canonical forms
    compared through each engine's own canonicalizer)."""
    from textreact_tpu.chem.rdkit_bridge import HAS_RDKIT
    if not HAS_RDKIT:
        pytest.skip("RDKit not in image")
    from textreact_tpu.evaluation import _rdkit_template_apply as rk
    cases = [
        ([("b", (3, 2), 1, 0.9)], "CCOC(C)=O", {}, {1: ESTER_TPL},
         {ESTER_TPL: ESTER_INFO}),
        ([("b", (1, 3), 2, 0.8)], "CC(=O)Nc1ccccc1", {}, {2: AMIDE_TPL},
         {AMIDE_TPL: AMIDE_INFO}),
        ([("b", (0, 1), 1, 0.9)], "Brc1ccccc1", {}, {1: BR_TPL},
         {BR_TPL: BR_INFO}),
    ]
    for preds, product, at, bt, infos in cases:
        own = apply_ranked_edits(preds, product, at, bt, infos, 5)
        ref = rk.apply_ranked_edits(preds, product, at, bt, infos, 5)
        assert len(own) == len(ref), (product, own, ref)
        for o, r in zip(own, ref):
            assert o == canonical_smiles(r), (product, o, r)


@pytest.mark.parametrize("product,expect", [
    ("CCOC(C)=O", "CC(=O)O.CCO"),
    ("COC(=O)c1ccccc1", "CO.O=C(O)c1ccccc1"),
])
def test_retro_metric_with_template_decoding(tmp_path, product, expect):
    """evaluate_retrosynthesis(template_based=True) end-to-end through the
    native engine (reference evaluate.py:47-64)."""
    from textreact_tpu.evaluation import evaluate_retrosynthesis
    pd.DataFrame({"Class": [1], "Template": [ESTER_TPL]}).to_csv(
        tmp_path / "atom_templates.csv", index=False)
    pd.DataFrame({"Class": [1], "Template": [ESTER_TPL]}).to_csv(
        tmp_path / "bond_templates.csv", index=False)
    pd.DataFrame({"Template": [ESTER_TPL],
                  "edit_site": [repr(ESTER_INFO["edit_site"])],
                  "change_H": [repr(ESTER_INFO["change_H"])],
                  "change_C": [repr(ESTER_INFO["change_C"])],
                  "change_S": [repr(ESTER_INFO["change_S"])]}).to_csv(
        tmp_path / "template_infos.csv", index=False)
    mol = parse_smiles(product)
    # locate the ester bond (C(=O)-O-C) for the prediction
    m = find_matches(parse_smarts("[C:1](=[O:2])-[O;H0;D2;+0:3]"), mol)[0]
    site = (m[0], m[2])
    data_df = pd.DataFrame({"product_smiles": [product],
                            "reactant_smiles": [expect]})
    prediction = {0: {"prediction": [["b", list(site), 1]], "score": [0.9]}}
    acc = evaluate_retrosynthesis(prediction, data_df, top_k=20,
                                  template_based=True,
                                  template_path=str(tmp_path))
    assert acc[1] == 1.0
