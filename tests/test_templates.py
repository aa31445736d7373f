"""Template machinery tests. The pure-string SMARTS canonicalization runs
everywhere; graph extraction tests are RDKit-gated (skipped in this image,
exercised in RDKit-equipped environments)."""

import pytest

from textreact_tpu.chem.rdkit_bridge import HAS_RDKIT
from textreact_tpu.templates import (count_atoms, enumerate_label_orders,
                                     fragment_permutations, invert_chain,
                                     reassign_atom_maps, reorder_sides,
                                     template_score)
from textreact_tpu.templates.processor import full_template


def test_count_atoms_strict_smarts():
    assert count_atoms("[C:1]-[O:2]") == 2
    assert count_atoms("[CH3:1]-[NH:2]-[CH2]") == 3


def test_template_score_bond_weights():
    props = {}
    assert template_score("[C:1]-[O:2]", props) < template_score("[C:1]=[O:2]", props)
    assert template_score("[C:1]#[N:2]", props) > template_score("[C:1]=[O:2]", props)


def test_invert_chain():
    # forward-numbered chains unchanged
    assert invert_chain("[C:1]-[O:2]") == "[C:1]-[O:2]"
    # backward-numbered 2-atom chain reversed
    assert invert_chain("[O:2]-[C:1]") == "[C:1]-[O:2]"
    # rings untouched
    assert invert_chain("[C:2]1-[O:1]1") == "[C:2]1-[O:1]1"


def test_fragment_permutations_symmetry():
    # symmetric bonds + labels -> both orders allowed
    perms = fragment_permutations("[C:1]-[C:2]")
    assert len(perms) == 2
    # asymmetric bond pattern -> single order
    perms = fragment_permutations("[C:1]-[C:2]=[C:3]")
    assert len(perms) == 1


def test_enumerate_label_orders():
    orders = enumerate_label_orders("[C:1]-[C:2]>>[C:1]-[C:2]")
    assert len(orders) == 4  # 2 sides x 2 symmetric orders
    assert all(len(o) == 4 for o in orders)


def test_reorder_sides_sorts_fragments():
    out = reorder_sides("([O:2]).([C:1])")
    assert out == "([C:1]).([O:2])"


def test_reassign_atom_maps_renumbers():
    template, mapping = reassign_atom_maps("([C:7]-[O:9])>>([C:7].[O:9])", {})
    assert ":7]" not in template and ":9]" not in template
    assert set(mapping.keys()) == {"7", "9"}
    assert sorted(mapping.values()) == ["1", "2"]
    # deterministic: renumbering twice is stable
    again, _ = reassign_atom_maps("([C:7]-[O:9])>>([C:7].[O:9])", {})
    assert again == template


def test_full_template_encoding():
    key = full_template("[C:1]>>[C:1]", {1: 0}, {1: 0}, {})
    assert key == "[C:1]>>[C:1]_0_0"
    key = full_template("[C:1]>>[C:1]", {1: 1}, {1: -1}, {1: 2})
    assert key == "[C:1]>>[C:1]_1_-1_2"


@pytest.mark.parametrize("engine", [
    "native",
    pytest.param("rdkit", marks=pytest.mark.skipif(
        not HAS_RDKIT, reason="rdkit engine needs rdkit")),
])
def test_extract_template_simple_ester(engine):
    from textreact_tpu.templates.extractor import extract_template
    rxn = "[CH3:1][C:2](=[O:3])[OH:4].[CH3:5][OH:6]>>" \
          "[CH3:1][C:2](=[O:3])[O:6][CH3:5]"
    result = extract_template(rxn, engine=engine)
    assert "reaction_smarts" in result
    assert ">>" in result["reaction_smarts"]
    assert result["edits"]
