"""RDKit-backed local-template application (template-based retro decoding).

Implements the LocalRetro-style decode the reference performs in
textreact/template_decoder.py: run the retro template at the predicted edit
site, keep only reactant sets whose matched atoms line up with the
prediction, patch hydrogen counts / formal charges / chiral tags using the
template info table, and emit demapped canonical reactant SMILES.

Only imported when RDKit is available (template_decode.py gates on
HAS_RDKIT).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

from rdkit import Chem, RDLogger
from rdkit.Chem import rdChemReactions

RDLogger.DisableLog("rdApp.*")

_CHIRAL_TO_INT = {
    Chem.ChiralType.CHI_UNSPECIFIED: -1,
    Chem.ChiralType.CHI_TETRAHEDRAL_CW: 1,
    Chem.ChiralType.CHI_TETRAHEDRAL_CCW: 2,
}
_INT_TO_CHIRAL = {v: k for k, v in _CHIRAL_TO_INT.items()}


def apply_ranked_edits(template_preds: Sequence[Tuple], product: str,
                       atom_templates: Dict[int, str],
                       bond_templates: Dict[int, str],
                       template_infos: Dict[str, Dict],
                       top_k: int) -> List[str]:
    """Walk the ranked edit list, decoding each until top_k distinct valid
    reactant SMILES are collected."""
    results: List[str] = []
    for pred in template_preds:
        decoded = _try_decode(pred, product, atom_templates, bond_templates,
                              template_infos)
        if decoded is None or decoded in results:
            continue
        results.append(decoded)
        if len(results) >= top_k:
            break
    return results


def _canonical_frag_index(mol) -> Dict[int, int]:
    """Atom idx in the whole product -> atom idx within its own fragment
    (needed when a template's product side has multiple fragments)."""
    for atom in mol.GetAtoms():
        atom.SetAtomMapNum(atom.GetIdx())
    mapping: Dict[int, int] = {}
    for frag_smiles in Chem.MolToSmiles(mol).split("."):
        frag = Chem.MolFromSmiles(frag_smiles)
        if frag is None:
            continue
        for atom in frag.GetAtoms():
            mapping[atom.GetAtomMapNum()] = atom.GetIdx()
    return mapping


def _try_decode(pred, product: str, atom_templates, bond_templates,
                template_infos) -> Optional[str]:
    try:
        if len(pred) < 4:
            return None
        edit_type, site, template_class, _score = pred
        mol = Chem.MolFromSmiles(product)
        if mol is None:
            return None
        table = atom_templates if edit_type == "a" else bond_templates
        template = table[template_class]
        info = template_infos[template]
        multi_frag = len(template.split(">>")[0].split(".")) > 1
        if multi_frag:
            frag_idx = _canonical_frag_index(Chem.MolFromSmiles(product))
            site = (frag_idx[site] if edit_type == "a"
                    else (frag_idx[site[0]], frag_idx[site[1]]))
        for atom in mol.GetAtoms():
            atom.SetAtomMapNum(atom.GetIdx())
        local = ">>".join(f"({part})" for part in
                          template.split("_")[0].split(">>"))
        return _run_template(mol, site, local, info)
    except Exception:
        return None


def _site_maps(site, info) -> List[Dict[int, int]]:
    """Candidate {template atom-map -> product atom idx} bindings for the
    predicted edit site."""
    out = []
    if isinstance(site, int):
        for kind, edits in info["edit_site"].items():
            if kind in ("A", "R"):
                out.extend({e: site} for e in edits)
    else:
        for kind, edits in info["edit_site"].items():
            if kind in ("B", "C"):
                out.extend({e: s for e, s in zip(edit, site)}
                           for edit in edits)
    return out


def _run_template(product, site, template: str, info) -> Optional[str]:
    candidates = _site_maps(site, info)
    if not candidates:
        return None
    rxn = rdChemReactions.ReactionFromSmarts(template)
    for reactants in rxn.RunReactants([product]):
        if reactants is None:
            continue
        found: Dict[int, int] = {}
        for mol in reactants:
            for atom in mol.GetAtoms():
                if atom.HasProp("old_mapno") and atom.HasProp("react_atom_idx"):
                    found[int(atom.GetProp("old_mapno"))] = int(
                        atom.GetProp("react_atom_idx"))
        if not any(cand.items() <= found.items() for cand in candidates):
            continue
        fixed = _patch_atoms(product, reactants, found, info)
        if fixed is not None:
            return fixed
    return None


def _patch_atoms(product, reactants, matched: Dict[int, int], info
                 ) -> Optional[str]:
    """Apply the template's H/charge/chirality deltas to matched atoms, then
    demap and canonicalize; None if any patch is inconsistent."""
    patched = []
    for mol in reactants:
        for atom in mol.GetAtoms():
            if not atom.HasProp("old_mapno"):
                continue
            mapno = int(atom.GetProp("old_mapno"))
            if mapno not in matched:
                return None
            src = product.GetAtomWithIdx(matched[mapno])
            h = (src.GetNumExplicitHs() + src.GetNumImplicitHs()
                 + info["change_H"][mapno])
            if h < 0:
                return None
            atom.SetNumExplicitHs(h)
            atom.SetFormalCharge(src.GetFormalCharge() + info["change_C"][mapno])
            s_after = info["change_S"][mapno]
            if s_after != 0:
                atom.SetChiralTag(_INT_TO_CHIRAL[s_after])
        _fix_aromatic(mol)
        patched.append(mol)
    smiles = []
    for mol in patched:
        for atom in mol.GetAtoms():
            atom.SetAtomMapNum(0)
        remol = Chem.MolFromSmiles(Chem.MolToSmiles(mol))
        if remol is None:
            return None
        smiles.append(Chem.MolToSmiles(remol))
    return ".".join(sorted(smiles))


def _fix_aromatic(mol) -> None:
    """Clear aromatic flags that RunReactants leaves on ring-opened atoms."""
    for atom in mol.GetAtoms():
        if not atom.IsInRing() and atom.GetIsAromatic():
            atom.SetIsAromatic(False)
    for bond in mol.GetBonds():
        if not bond.IsInRing():
            bond.SetIsAromatic(False)
            if bond.GetBondType() == Chem.BondType.AROMATIC:
                bond.SetBondType(Chem.BondType.SINGLE)
