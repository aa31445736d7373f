"""Native (RDKit-free) template extraction: semantics, round-trips through
the own reaction engine, canonicalization invariance, and the full
TemplateProcessor pass over synthetic mapped reactions.

The round-trip property is the core contract (VERDICT r2 item 1): a
template extracted from a mapped reaction, decoded at the labeled edit
site with the own reaction engine, must reproduce that reaction's
reactants (reference extract_from_reaction ->
template_decoder.decode_localtemplate cycle)."""

import random

import pytest

from textreact_tpu.chem import canonical_smiles, parse_smiles
from textreact_tpu.chem.mol import remove_explicit_hydrogens
from textreact_tpu.evaluation import _own_template_apply as impl
from textreact_tpu.templates.extractor import extract_template
from textreact_tpu.templates.native_extractor import (demapped_canonical,
                                                      mol_to_mapped_smiles)
from textreact_tpu.templates.processor import canonical_product


def _decode_with_gold_edits(result):
    """Decode an extraction result at its own labeled edit sites; returns
    the list of decoded reactant SMILES (own engine)."""
    tpl = result["reaction_smarts"]
    info = {"edit_site": {k: v[2] for k, v in result["edits"].items()},
            "change_H": result["H_change"], "change_C": result["Charge_change"],
            "change_S": result["Chiral_change"]}
    canon_prod, orig2canon = canonical_product(result["products"],
                                               engine="native")
    preds = []
    for kind, payload in result["edits"].items():
        for site in payload[0]:
            if kind in ("A", "R"):
                preds.append(("a", orig2canon[site], 1, 1.0))
            else:
                preds.append(
                    ("b", (orig2canon[site[0]], orig2canon[site[1]]), 1, 1.0))
    return impl.apply_ranked_edits(preds, canon_prod, {1: tpl}, {1: tpl},
                                   {tpl: info}, 5)


def _roundtrip(rxn):
    result = extract_template(rxn, engine="native")
    assert "reaction_smarts" in result, rxn
    assert result["edits"], rxn
    decoded = _decode_with_gold_edits(result)
    gold = demapped_canonical(parse_smiles(result["reactants"]))
    assert gold in decoded, (rxn, result["reaction_smarts"], decoded, gold)
    return result


REACTIONS = [
    # esterification (acid + alcohol -> ester; OH leaving group)
    "[CH3:1][C:2](=[O:3])[OH:4].[CH3:5][OH:6]>>"
    "[CH3:1][C:2](=[O:3])[O:6][CH3:5]",
    # amide coupling (acid + amine)
    "[CH3:1][C:2](=[O:3])[OH:4].[NH2:5][CH3:6]>>"
    "[CH3:1][C:2](=[O:3])[NH:5][CH3:6]",
    # amine alkylation (SN2 on bromide)
    "[Br:7][CH2:1][CH3:2].[NH2:3][CH3:4]>>[CH2:1]([CH3:2])[NH:3][CH3:4]",
    # Williamson ether synthesis
    "[CH3:1][O:2][H:8].[Br:9][CH2:3][c:4]1[cH:5][cH:6][cH:7][cH:10][cH:11]1"
    ">>[CH3:1][O:2][CH2:3][c:4]1[cH:5][cH:6][cH:7][cH:10][cH:11]1",
    # aromatic bromination retro (H -> Br on the ring carbon)
    "[Br:1][Br:8].[cH:2]1[cH:3][cH:4][cH:5][cH:6][cH:7]1>>"
    "[Br:1][c:2]1[cH:3][cH:4][cH:5][cH:6][cH:7]1",
    # elimination retro: alkene from alcohol dehydration
    "[CH3:1][CH:2]([OH:5])[CH3:3]>>[CH3:1][CH:2]=[CH2:3]",
    # hydrogenation retro: pure bond-order change, no neighbor-set change
    "[CH3:1][CH:2]=[CH:3][CH3:4]>>[CH3:1][CH2:2][CH2:3][CH3:4]",
    # lactone hydrolysis retro (intramolecular ester closes a ring)
    "[OH:1][C:2](=[O:3])[CH2:4][CH2:5][CH2:6][OH:7]>>"
    "[C:2]1(=[O:3])[CH2:4][CH2:5][CH2:6][O:7]1",
    # carboxylate alkylation (charge change on O)
    "[CH3:1][C:2](=[O:3])[O-:4].[Br:7][CH3:5]>>"
    "[CH3:1][C:2](=[O:3])[O:4][CH3:5]",
]


@pytest.mark.parametrize("rxn", REACTIONS)
def test_native_extract_roundtrip(rxn):
    _roundtrip(rxn)


def test_native_extract_ester_details():
    """Un-gated twin of the former RDKit-only ester test: the extracted
    template must cut the ester C-O bond and carry the +1 H delta for the
    recovered alcohol oxygen."""
    result = _roundtrip(REACTIONS[0])
    lhs, rhs = result["reaction_smarts"].split(">>")
    assert lhs.count("[") == 2          # product side: C and O strict atoms
    assert "." in rhs                   # reactant side splits in two
    assert "[OH]" in rhs                # the leaving hydroxyl, fully specified
    (_idxs, _maps, temps) = result["edits"]["B"]
    assert len(temps) == 1              # one broken bond
    assert set(result["H_change"].values()) == {0, 1}


def test_native_extract_elimination_labels_grow_atom():
    """Dehydration retro: the carbinol carbon gains a neighbor (the OH
    leaving group) -> an 'A' edit; the reference marks grow atoms before
    changed bonds, so no 'C' edit is emitted for the same atoms
    (template_extract_utils.py:105-117)."""
    result = _roundtrip(REACTIONS[5])
    assert result["edits"]["A"][0], result["edits"]
    assert not result["edits"]["B"][0]


def test_native_extract_hydrogenation_is_changed_bond():
    """Alkene hydrogenation retro: neighbor sets are unchanged, only the
    bond order differs -> a 'C' (changed-bond) edit."""
    result = _roundtrip(REACTIONS[6])
    assert result["edits"]["C"][2], result["edits"]
    assert not result["edits"]["A"][0]
    assert not result["edits"]["B"][0]


def test_native_extract_intramolecular_flag():
    result = extract_template(REACTIONS[7], engine="native")
    assert result["intra_only"] is True


def test_native_extract_charge_change():
    result = _roundtrip(REACTIONS[8])
    assert -1 in result["Charge_change"].values()


def test_native_extract_spectators_become_reagents():
    """A fully unmapped reactant is a spectator: recorded as a necessary
    reagent, absent from the template (reference extract_from_reaction
    reagent rerouting, template_extractor.py:526-534)."""
    rxn = ("[CH3:1][C:2](=[O:3])[OH:4].[CH3:5][OH:6].CCN(CC)CC>>"
           "[CH3:1][C:2](=[O:3])[O:6][CH3:5]")
    result = extract_template(rxn, engine="native")
    assert "reaction_smarts" in result
    assert canonical_smiles("CCN(CC)CC") in result["necessary_reagent"]
    assert "N" not in result["reaction_smarts"]


def test_native_extract_template_map_invariant():
    """The canonical template string must not depend on the input's atom-map
    numbering or SMILES spelling (template classes dedupe across the
    dataset on the string)."""
    variants = [
        "[CH3:1][C:2](=[O:3])[OH:4].[CH3:5][OH:6]>>"
        "[CH3:1][C:2](=[O:3])[O:6][CH3:5]",
        # renumbered maps
        "[CH3:9][C:8](=[O:7])[OH:6].[CH3:5][OH:4]>>"
        "[CH3:9][C:8](=[O:7])[O:4][CH3:5]",
        # respelled SMILES (different atom order)
        "[OH:4][C:2]([CH3:1])=[O:3].[OH:6][CH3:5]>>"
        "[O:6]([CH3:5])[C:2]([CH3:1])=[O:3]",
    ]
    templates = set()
    for rxn in variants:
        result = extract_template(rxn, engine="native")
        templates.add(result["reaction_smarts"])
    assert len(templates) == 1, templates


def test_native_extract_unchanged_reaction_fails_cleanly():
    rxn = "[CH3:1][OH:2]>>[CH3:1][OH:2]"
    result = extract_template(rxn, engine="native")
    assert "reaction_smarts" not in result
    assert result["reaction_id"] == 0


def test_remove_explicit_hydrogens():
    mol = parse_smiles("[CH3:1][C:2](=[O:3])[O:4][H]")
    out = remove_explicit_hydrogens(mol)
    assert len(out.atoms) == 4
    o4 = [a for a in out.atoms if a.atom_map == 4][0]
    assert o4.total_h == 1
    # kept: charged, mapped, and H-H cases
    assert len(remove_explicit_hydrogens(parse_smiles("[H+].[Cl-]")).atoms) == 2
    assert len(remove_explicit_hydrogens(parse_smiles("[H][H]")).atoms) == 2
    assert len(remove_explicit_hydrogens(parse_smiles("[CH3:1][H:2]")).atoms) == 2


def test_native_extract_bond_cut_fuzz():
    """Property fuzz: for realistic molecules, synthesize a hydrogenolysis
    retro reaction at every non-ring single bond (cut + H on both ends) and
    require extraction + gold-edit decode to reproduce the fragments."""
    from test_chem_fuzz import DRUGS

    from textreact_tpu.chem.mol import SINGLE
    from textreact_tpu.chem.smarts import ring_membership

    rng = random.Random(7)
    checked = 0
    for smi in DRUGS:
        mol = parse_smiles(smi)
        if any(a.chirality for a in mol.atoms):
            continue  # chirality-at-cut semantics covered elsewhere
        for i, a in enumerate(mol.atoms):
            a.atom_map = i + 1
        _, in_ring = ring_membership(mol)
        cuttable = [bi for bi, b in enumerate(mol.bonds)
                    if b.order == SINGLE and not b.aromatic and not in_ring[bi]
                    and b.direction == 0
                    and mol.atoms[b.a1].symbol != "H"
                    and mol.atoms[b.a2].symbol != "H"]
        rng.shuffle(cuttable)
        for bi in cuttable[:3]:
            bond = mol.bonds[bi]
            cut = parse_smiles(mol_to_mapped_smiles(mol))  # fresh copy
            # find the same bond by map numbers in the copy
            m1, m2 = (mol.atoms[bond.a1].atom_map, mol.atoms[bond.a2].atom_map)
            idx = {a.atom_map: a.idx for a in cut.atoms}
            target = None
            for bj, b in enumerate(cut.bonds):
                if {cut.atoms[b.a1].atom_map, cut.atoms[b.a2].atom_map} == {m1, m2}:
                    target = bj
                    break
            b = cut.bonds[target]
            for end in (b.a1, b.a2):
                cut.atoms[end].explicit_h = cut.atoms[end].total_h + 1
            # rebuild without the bond
            from textreact_tpu.chem.mol import Mol, Atom
            frag = Mol()
            for a in cut.atoms:
                frag.add_atom(Atom(symbol=a.symbol, aromatic=a.aromatic,
                                   charge=a.charge, isotope=a.isotope,
                                   explicit_h=a.explicit_h,
                                   atom_map=a.atom_map))
            for bj, bb in enumerate(cut.bonds):
                if bj != target:
                    frag.add_bond(bb.a1, bb.a2, bb.order, bb.aromatic,
                                  bb.direction)
            frag.assign_implicit_h()
            if len(frag.fragment_atom_sets()) != 2:
                continue
            reactants = mol_to_mapped_smiles(frag)
            product = mol_to_mapped_smiles(mol)
            rxn = f"{reactants}>>{product}"
            try:
                result = extract_template(rxn, engine="native")
            except Exception:
                # mapped-H label loss etc.: the reference extractor raises
                # on these too; the processor catches per reaction
                continue
            if "reaction_smarts" not in result:
                # valence-noise molecules may legitimately fail; count below
                continue
            decoded = _decode_with_gold_edits(result)
            gold = demapped_canonical(parse_smiles(result["reactants"]))
            assert gold in decoded, (smi, rxn, result["reaction_smarts"],
                                     decoded, gold)
            checked += 1
    assert checked > 25, checked


def test_native_forward_labeling():
    """Forward-synthesis edit labeling (retro=False): the esterification
    FORMS the C-O bond — an 'A' (formed-bond) edit pointing at the bond,
    with the broken C-OH absorbed (reference label_foward_edit_site,
    template_extract_utils.py:133-244)."""
    from textreact_tpu.templates.native_labeling import (
        label_forward_edit_sites)
    reactants = "[CH3:1][C:2](=[O:3])[OH:4].[CH3:5][O:6]"
    products = "[CH3:1][C:2](=[O:3])[O:6][CH3:5]"
    formed, broken, changed, remote = label_forward_edit_sites(
        reactants, products, [2, 4, 6])
    assert (2, 6) in formed or (6, 2) in formed, (formed, broken, changed)
    # the O:4 hydroxyl leaves: broken bond (4 has no product counterpart,
    # so only the surviving endpoint 2 is recorded as acceptor)
    assert any(4 in b for b in broken), broken


def test_native_extract_use_symbol_false():
    """use_symbol=False emits generic [A:n] atom queries; the template must
    still parse with the own SMARTS engine and keep its edit labels."""
    result = extract_template(REACTIONS[0], engine="native",
                              settings={"use_symbol": False})
    assert "reaction_smarts" in result
    lhs = result["reaction_smarts"].split(">>")[0]
    assert "[A:" in lhs, lhs
    from textreact_tpu.chem.smarts import parse_smarts
    for side in result["reaction_smarts"].split(">>"):
        assert parse_smarts(side).atoms
    assert result["edits"]["B"][2]


@pytest.mark.parametrize("ptag,rtag", [("@", "@@"), ("@@", "@"),
                                       ("@", "@"), ("@@", "@@")])
def test_native_extract_stereocenter_roundtrip(ptag, rtag):
    """SN2-at-a-stereocenter in every tag combination: the Chiral_change
    code extracted from the canonicalized mapped strings must compose with
    the decoder's tag patching so the decoded reactant is the RIGHT
    enantiomer (the raw tags are spelling-relative; only the composition
    is meaningful — reference label_CHS_change + fix_reactant_atoms)."""
    rxn = (f"[Br:9][C{rtag}H:1]([CH3:2])[CH2:3][CH3:4].[NH2:5][CH3:6]>>"
           f"[C{ptag}H:1]([CH3:2])([CH2:3][CH3:4])[NH:5][CH3:6]")
    result = extract_template(rxn, engine="native")
    decoded = _decode_with_gold_edits(result)
    gold = demapped_canonical(parse_smiles(result["reactants"]))
    assert gold in decoded, (rxn, decoded, gold)
    # the two input spellings per physical reaction must agree on the gold
    mirror = demapped_canonical(
        parse_smiles(result["reactants"])).replace("@@", "X").replace(
        "@", "@@").replace("X", "@")
    assert gold != canonical_smiles(mirror) or "@" not in gold
