"""Template edit ranking: merge atom/bond probabilities into a ranked list.

Parity target: reference textreact/utils.py:69-108 (get_id_template /
output2edit / combined_edit). Differences in representation only: the model
emits bond probabilities at explicit bond pairs (B, MB, n_b+1) rather than a
dense (A, A, n_b+1) grid, so the reference's "filter non-bonds" step
(utils.py:87) is already satisfied by construction; template class 0 (the
background) is still filtered here. The ranked output format matches:
[('a', atom_idx, template), ('b', (i, j), template), ...] with probabilities
descending.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

Edit = Tuple  # ('a', int, int) | ('b', (int, int), int)


def rank_edits(atom_probs: np.ndarray, bond_probs: np.ndarray,
               bond_pairs: Sequence[Tuple[int, int]],
               top_num: Optional[int] = None) -> Tuple[List[Edit], List[float]]:
    """atom_probs: (A, n_a+1) with padded/ignored entries zeroed;
    bond_probs: (MB, n_b+1) likewise; bond_pairs: MB (i, j) tuples."""
    edits: List[Edit] = []
    probs: List[float] = []

    # atom edits, template 0 excluded (utils.py:87-88)
    a_flat = atom_probs.reshape(-1)
    order = np.argsort(a_flat, kind="stable")[::-1]
    n_a = atom_probs.shape[1]
    atom_edits, atom_probs_out = [], []
    for r in order:
        template = int(r % n_a)
        if template == 0:
            continue
        atom_edits.append(("a", int(r // n_a), template))
        atom_probs_out.append(float(a_flat[r]))
        if top_num is not None and len(atom_edits) == top_num:
            break

    n_b = bond_probs.shape[1]
    nb_real = len(bond_pairs)
    b_flat = bond_probs[:nb_real].reshape(-1)
    order = np.argsort(b_flat, kind="stable")[::-1]
    bond_edits, bond_probs_out = [], []
    for r in order:
        template = int(r % n_b)
        if template == 0:
            continue
        pair = bond_pairs[int(r // n_b)]
        bond_edits.append(("b", (int(pair[0]), int(pair[1])), template))
        bond_probs_out.append(float(b_flat[r]))
        if top_num is not None and len(bond_edits) == top_num:
            break

    # merged rank (utils.py:96-108)
    all_edits = atom_edits + bond_edits
    all_probs = atom_probs_out + bond_probs_out
    merge = np.argsort(np.asarray(all_probs), kind="stable")[::-1]
    if top_num is not None:
        merge = merge[:top_num]
    return [all_edits[r] for r in merge], [all_probs[r] for r in merge]
