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


def test_device_topk_matches_host_rank_edits():
    """device_topk_edits + edits_from_topk == rank_edits, including padded
    atom rows (zero prob, still ranked), padded bond rows (excluded), 0.0
    ties (host tie order: larger flat index first), and k > candidates."""
    import jax.numpy as jnp

    from textreact_tpu.evaluation.edit_rank import (device_topk_edits,
                                                    edits_from_topk)

    rng = np.random.default_rng(7)
    B, A, n_a1, MB, n_b1 = 3, 6, 5, 8, 4
    bonds_per_ex = [[(0, 1), (1, 0), (2, 3)], [(1, 2)] * 1, []]
    atom_probs = rng.random((B, A, n_a1)).astype(np.float32)
    atom_probs[:, 4:, :] = 0.0  # padded atoms: zeroed but still candidates
    atom_probs[0, 1, :] = 0.0   # interior zero row: exercises 0.0 ties
    bond_probs = np.zeros((B, MB, n_b1), dtype=np.float32)
    row_valid = np.zeros((B, MB), dtype=bool)
    for b, bonds in enumerate(bonds_per_ex):
        for m in range(len(bonds)):
            bond_probs[b, m] = rng.random(n_b1)
            row_valid[b, m] = True
    bond_probs[0, 2, :] = 0.0  # a real bond row that is all zeros

    for k in (1, 3, 10, 200):
        av, ai, bv, bi = device_topk_edits(jnp.asarray(atom_probs),
                                           jnp.asarray(bond_probs),
                                           jnp.asarray(row_valid), k)
        av, ai, bv, bi = map(np.asarray, (av, ai, bv, bi))
        for b, bonds in enumerate(bonds_per_ex):
            want = rank_edits(atom_probs[b], bond_probs[b], bonds, top_num=k)
            got = edits_from_topk(av[b], ai[b], bv[b], bi[b],
                                  n_a1, n_b1, bonds, top_num=k)
            assert got[0] == want[0], (k, b, got[0], want[0])
            np.testing.assert_allclose(got[1], want[1])


def test_rank_edits_filters_template_zero():
    atom_probs = np.array([[0.9, 0.1], [0.8, 0.2]])  # template 0 dominates
    edits, probs = rank_edits(atom_probs, np.zeros((1, 2)), [(0, 1)], top_num=10)
    assert all(t != 0 for _, _, t in edits)
