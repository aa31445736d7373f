"""Edit-site labeling for extracted templates (RDKit-gated).

Reimplements reference preprocess/template_extraction/
template_extract_utils.py: classify each changed atom/bond as a
leaving-group attachment (A), broken bond (B), changed bond (C) or remote
participant (R), map atom-map numbers to atom indices and renumbered
template positions, and record per-atom H/charge/chirality deltas.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Set, Tuple

from ..chem.rdkit_bridge import HAS_RDKIT

if HAS_RDKIT:
    from rdkit import Chem
    from rdkit.Chem.rdchem import ChiralType

    CHIRAL_INT = {ChiralType.CHI_UNSPECIFIED: 0,
                  ChiralType.CHI_TETRAHEDRAL_CW: 1,
                  ChiralType.CHI_TETRAHEDRAL_CCW: 2}

_BOND_SYM = {"SINGLE": "-", "DOUBLE": "=", "TRIPLE": "#", "AROMATIC": "@"}


def _bond_desc(bond) -> str:
    ends = []
    for a in (bond.GetBeginAtom(), bond.GetEndAtom()):
        label = str(a.GetAtomicNum())
        if a.HasProp("molAtomMapNumber"):
            label += a.GetProp("molAtomMapNumber")
        ends.append(label)
    ends.sort()
    return f"{ends[0]}{_BOND_SYM[str(bond.GetBondType())]}{ends[1]}"


def _map_to_idx(mol) -> Dict[int, int]:
    return {a.GetAtomMapNum(): a.GetIdx() for a in mol.GetAtoms()}


def _bond_changed(b1, b2) -> bool:
    return b1 is not None and b2 is not None and _bond_desc(b1) != _bond_desc(b2)


def label_retro_edit_sites(product_smiles: str, reactant_smiles: str,
                           edit_maps: Sequence[int]):
    """(grow atoms, broken bonds, changed bonds, remote atoms) over atom-map
    numbers (reference label_retro_edit_site,
    template_extract_utils.py:74-131)."""
    edit_maps = [int(m) for m in edit_maps]
    pmol = Chem.MolFromSmiles(product_smiles)
    rmol = Chem.MolFromSmiles(reactant_smiles)
    pmap, rmap = _map_to_idx(pmol), _map_to_idx(rmol)
    used: Set[int] = set()
    grow_atoms: List[int] = []
    broken_bonds: List[Tuple[int, int]] = []
    changed_bonds: List[Tuple[int, int]] = []

    for a in edit_maps:
        for b in edit_maps:
            if a >= b:
                continue
            pb = pmol.GetBondBetweenAtoms(pmap[a], pmap[b])
            rb = rmol.GetBondBetweenAtoms(rmap[a], rmap[b])
            if pb is not None and rb is None:  # bond broken in retro
                broken_bonds.append((a, b))
                used.update((a, b))

    for a in edit_maps:
        if a in used:
            continue
        patom = pmol.GetAtomWithIdx(pmap[a])
        ratom = rmol.GetAtomWithIdx(rmap[a])
        p_nbrs = sorted(n.GetAtomMapNum() for n in patom.GetNeighbors())
        r_nbrs = sorted(n.GetAtomMapNum() for n in ratom.GetNeighbors())
        if p_nbrs != r_nbrs:  # leaving group attaches here
            used.add(a)
            grow_atoms.append(a)

    for a in edit_maps:
        for b in edit_maps:
            if a >= b:
                continue
            pb = pmol.GetBondBetweenAtoms(pmap[a], pmap[b])
            rb = rmol.GetBondBetweenAtoms(rmap[a], rmap[b])
            if _bond_changed(pb, rb) and a not in used and b not in used:
                changed_bonds.append((a, b))
                changed_bonds.append((b, a))

    involved = set(grow_atoms) | {x for bond in broken_bonds + changed_bonds
                                  for x in bond}
    remote: List[int] = []
    for a in edit_maps:
        if a in involved:
            continue
        atom = rmol.GetAtomWithIdx(rmap[a])
        nbr_maps = [n.GetAtomMapNum() for n in atom.GetNeighbors()]
        if any(b in nbr_maps for b in involved):
            continue
        # one remote entry per neighbor (reference weights by degree,
        # template_extract_utils.py:121-130)
        remote.extend(a for _ in nbr_maps)
    return grow_atoms, broken_bonds, changed_bonds, remote


def label_forward_edit_sites(reactant_smiles: str, product_smiles: str,
                             edit_maps: Sequence[int]):
    """Forward-synthesis labeling (reference label_foward_edit_site,
    template_extract_utils.py:133-244). Kept for forward-template support."""
    edit_maps = [int(m) for m in edit_maps]
    rmol = Chem.MolFromSmiles(reactant_smiles)
    pmol = Chem.MolFromSmiles(product_smiles)
    rmap, pmap = _map_to_idx(rmol), _map_to_idx(pmol)

    def pbond(a, b):
        try:
            return pmol.GetBondBetweenAtoms(pmap[a], pmap[b])
        except KeyError:
            return None

    formed, broken, changed = [], [], []
    acceptors1: Set[int] = set()
    acceptors2: Set[int] = set()
    symmetric = True

    for a in edit_maps:
        for b in edit_maps:
            if a >= b:
                continue
            pb, rb = pbond(a, b), rmol.GetBondBetweenAtoms(rmap[a], rmap[b])
            if rb is not None and pb is None:
                if a in pmap:
                    broken.append((a, b))
                    acceptors1.add(a)
                if b in pmap:
                    broken.append((b, a))
                    acceptors1.add(b)

    for a in edit_maps:
        for b in edit_maps:
            if a >= b:
                continue
            pb, rb = pbond(a, b), rmol.GetBondBetweenAtoms(rmap[a], rmap[b])
            if _bond_changed(rb, pb):
                changed.append((a, b))
                changed.append((b, a))
                acceptors2.update((a, b))

    for a in edit_maps:
        for b in edit_maps:
            if a >= b:
                continue
            pb, rb = pbond(a, b), rmol.GetBondBetweenAtoms(rmap[a], rmap[b])
            if rb is None and pb is not None:
                in1 = (a in acceptors1, b in acceptors1)
                in2 = (a in acceptors2, b in acceptors2)
                if not any(in1) and not any(in2):
                    formed.append((a, b))
                    formed.append((b, a))
                elif all(in1):
                    symmetric = False
                    formed.append((a, b))
                    formed.append((b, a))
                else:
                    symmetric = False
                    if in1[0]:
                        formed.append((b, a))
                    elif in2[0] and not in1[1]:
                        formed.append((b, a))
                    if in1[1]:
                        formed.append((a, b))
                    elif in2[1] and not in1[0]:
                        formed.append((a, b))

    if not symmetric:
        new_changed = []
        acceptors = {bond[1] for bond in formed} | acceptors1
        for atom in acceptors:
            new_changed.extend(b for b in changed if b[0] == atom)
        donors = {bond[0] for bond in formed}
        for atom in donors:
            new_changed.extend(b for b in changed if b[1] == atom)
        changed = list(set(new_changed))

    involved = {x for bond in formed + broken + changed for x in bond}
    remote_bonds = []
    for a in edit_maps:
        if a in involved:
            continue
        atom = rmol.GetAtomWithIdx(rmap[a])
        nbr_maps = [n.GetAtomMapNum() for n in atom.GetNeighbors()]
        if any(b in nbr_maps for b in involved):
            continue
        remote_bonds.extend((a, n) for n in nbr_maps)
    return formed, broken, changed, remote_bonds


def chs_changes(smiles1: str, smiles2: str, edit_maps: Sequence[int],
                replacement: Dict[int, int], use_stereo: bool):
    """Per-template-position H/charge/chirality deltas (reference
    label_CHS_change, template_extract_utils.py:246-270)."""
    mol1, mol2 = Chem.MolFromSmiles(smiles1), Chem.MolFromSmiles(smiles2)
    map1, map2 = _map_to_idx(mol1), _map_to_idx(mol2)
    h, c, s = {}, {}, {}
    for m in (int(x) for x in edit_maps):
        if m not in map2:
            continue
        a1 = mol1.GetAtomWithIdx(map1[m])
        a2 = mol2.GetAtomWithIdx(map2[m])
        h[replacement[m]] = a2.GetNumExplicitHs() - a1.GetNumExplicitHs()
        c[replacement[m]] = int(a2.GetFormalCharge()) - int(a1.GetFormalCharge())
        s1, s2 = CHIRAL_INT[a1.GetChiralTag()], CHIRAL_INT[a2.GetChiralTag()]
        s[replacement[m]] = 0 if (s2 == s1 or not use_stereo) else s2
    return map1, h, c, s


def _bonds_to_positions(bond_maps, idx_of: Dict[int, int],
                        pos_of: Dict[int, int], sort: bool = False,
                        remote: bool = False):
    """(atom-idx pairs, map pairs, template-position pairs) per bond
    (reference bondmap2idx, template_extract_utils.py:272-294)."""
    idxs = [(idx_of[a], idx_of[b]) for a, b in bond_maps]
    if remote:
        temps = list({(pos_of[a], -1) for a, _ in bond_maps})
        return idxs, list(bond_maps), temps
    temps = [(pos_of[a], pos_of[b]) for a, b in bond_maps]
    if not sort:
        return idxs, list(bond_maps), temps
    s_idx, s_map, s_tmp = [], [], []
    for i, m, t in zip(idxs, bond_maps, temps):
        if t[0] < t[1]:
            s_idx.append(i)
            s_map.append(m)
            s_tmp.append(t)
        else:
            s_idx.append(tuple(i[::-1]))
            s_map.append(tuple(m[::-1]))
            s_tmp.append(tuple(t[::-1]))
    return s_idx, s_map, s_tmp


def _atoms_to_positions(atom_maps, idx_of, pos_of):
    return ([idx_of[m] for m in atom_maps], list(atom_maps),
            [pos_of[m] for m in atom_maps])


def match_label(reactants: str, products: str, replacement_dict: Dict,
                edit_maps: Sequence[str], retro: bool = True,
                remote: bool = True, use_stereo: bool = True):
    """Full labeling of one extracted reaction (reference match_label,
    template_extract_utils.py:301-326)."""
    smiles1, smiles2 = (products, reactants) if retro else (reactants, products)
    replacement = {int(k): int(v) for k, v in replacement_dict.items()}
    idx_of, h_change, charge_change, chiral_change = chs_changes(
        smiles1, smiles2, edit_maps, replacement, use_stereo)
    if retro:
        grow, broken, changed, remote_atoms = label_retro_edit_sites(
            smiles1, smiles2, edit_maps)
        edits = {"A": _atoms_to_positions(grow, idx_of, replacement),
                 "B": _bonds_to_positions(broken, idx_of, replacement, True),
                 "C": _bonds_to_positions(changed, idx_of, replacement)}
        if remote:
            edits["R"] = _atoms_to_positions(remote_atoms, idx_of, replacement)
    else:
        formed, broken, changed, remote_bonds = label_forward_edit_sites(
            smiles1, smiles2, edit_maps)
        edits = {"A": _bonds_to_positions(formed, idx_of, replacement),
                 "B": _bonds_to_positions(broken, idx_of, replacement),
                 "C": _bonds_to_positions(changed, idx_of, replacement)}
        if remote:
            edits["R"] = _bonds_to_positions(remote_bonds, idx_of, replacement,
                                             False, True)
    return edits, h_change, charge_change, chiral_change


def bonds_from_smiles(smiles: str) -> Set[Tuple[int, int]]:
    """All directed bonded atom-index pairs of a molecule (reference
    get_bonds_from_smiles, template_extract_utils.py:328-340)."""
    mol = Chem.MolFromSmiles(smiles)
    out: Set[Tuple[int, int]] = set()
    for atom in mol.GetAtoms():
        for bond in atom.GetBonds():
            other = bond.GetEndAtomIdx() if bond.GetBeginAtomIdx() == atom.GetIdx() \
                else bond.GetBeginAtomIdx()
            out.add((atom.GetIdx(), other))
    return out
