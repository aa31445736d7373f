"""Edit-ranking parity: rank_edits vs a dense-grid oracle implementing the
reference algorithm (utils.py:69-108) literally."""

import numpy as np

from textreact_tpu.evaluation.edit_rank import rank_edits


def _oracle_combined_edit(atom_out, bond_out, bonds, top_num):
    """Reference semantics on dense grids: flatten+argsort descending,
    filter template-0 (and non-bonds for the bond grid), merge by prob."""
    def output2edit(out, edit_type, bonds=None):
        num_atoms, class_n = out.shape[-2:]
        flat = out.reshape(-1)
        order = np.argsort(flat, kind="stable")[::-1]
        edits, probs = [], []
        for r in order:
            template = int(r % class_n)
            if edit_type == "a":
                idx = int(r // class_n)
            else:
                idx = (int(r // class_n // num_atoms), int(r // class_n % num_atoms))
            if (bonds is None or idx in bonds) and template != 0:
                edits.append((idx, template))
                probs.append(float(flat[r]))
                if len(edits) == top_num:
                    break
        return edits, probs

    ea, pa = output2edit(atom_out, "a")
    eb, pb = output2edit(bond_out, "b", bonds=bonds)
    edits = [("a", *e) for e in ea] + [("b", *e) for e in eb]
    probs = pa + pb
    order = np.argsort(probs, kind="stable")[::-1][:top_num]
    return [edits[r] for r in order], [probs[r] for r in order]


def test_rank_edits_matches_dense_oracle():
    rng = np.random.default_rng(0)
    A, n_a, n_b = 6, 5, 4
    bonds = [(0, 1), (1, 0), (1, 2), (2, 1), (3, 4), (4, 3)]
    atom_probs = rng.random((A, n_a))
    dense_bond = np.zeros((A, A, n_b))
    pair_bond = np.zeros((len(bonds), n_b))
    for m, (i, j) in enumerate(bonds):
        row = rng.random(n_b)
        dense_bond[i, j] = row
        pair_bond[m] = row

    for top in (1, 3, 10, 50):
        ref_edits, ref_probs = _oracle_combined_edit(atom_probs, dense_bond,
                                                     bonds, top)
        got_edits, got_probs = rank_edits(atom_probs, pair_bond, bonds,
                                          top_num=top)
        # convert reference tuples: ('a', idx, t) / ('b', (i,j), t)
        assert got_edits == ref_edits, (top, got_edits, ref_edits)
        np.testing.assert_allclose(got_probs, ref_probs)


def test_rank_edits_filters_template_zero():
    atom_probs = np.array([[0.9, 0.1], [0.8, 0.2]])  # template 0 dominates
    edits, probs = rank_edits(atom_probs, np.zeros((1, 2)), [(0, 1)], top_num=10)
    assert all(t != 0 for _, _, t in edits)
