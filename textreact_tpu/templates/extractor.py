"""Retro template extraction from atom-mapped reactions (RDKit engine).

Reimplements the rdchiral-lineage extractor the reference vendors
(reference preprocess/template_extraction/template_extractor.py:517-626,
itself derived from the public rdchiral project): find atoms whose local
environment changes between product and reactants, cut strict SMARTS
fragments around them (leaving groups fully included on the reactant side),
and canonicalize the resulting transform with smarts_canon.

Offline preprocessing path — requires RDKit's graph machinery, like the
reference. Settings mirror the reference dict (use_stereo/use_symbol=True
for the TextReact pipeline, get_templates.py:130-132).
"""

from __future__ import annotations

import re
from copy import deepcopy
from typing import Dict, List, Optional, Tuple

from ..chem.rdkit_bridge import HAS_RDKIT
from .labeling import match_label
from .smarts_canon import reassign_atom_maps, reorder_sides

if HAS_RDKIT:
    from rdkit import Chem
    from rdkit.Chem import AllChem

DEFAULT_SETTINGS = {
    "verbose": False, "use_stereo": True, "use_symbol": True,
    "max_unmap": 5, "retro": True, "remote": True, "least_atom_num": 2,
}


def _require_rdkit():
    if not HAS_RDKIT:
        raise NotImplementedError(
            "template extraction is offline preprocessing that runs on "
            "RDKit's graph machinery (as in the reference); install rdkit")


# ---------------------------------------------------------------------------
# helpers over mapped molecules
# ---------------------------------------------------------------------------

def _mapped_atoms(mols):
    atoms, tags = [], []
    for mol in mols:
        for atom in mol.GetAtoms():
            if atom.HasProp("molAtomMapNumber"):
                atoms.append(atom)
                tags.append(atom.GetProp("molAtomMapNumber"))
    return atoms, tags


def _neighbor_maps(atom) -> List[int]:
    return sorted(n.GetAtomMapNum() for n in atom.GetNeighbors())


def _bond_signature(bond) -> str:
    """Order-independent bond descriptor incl. endpoint map numbers
    (reference bond_to_smarts, template_extractor.py:467-481)."""
    ends = []
    for a in (bond.GetBeginAtom(), bond.GetEndAtom()):
        label = str(a.GetAtomicNum())
        if a.HasProp("molAtomMapNumber"):
            label += a.GetProp("molAtomMapNumber")
        ends.append(label)
    ends.sort()
    sym = bond.GetSmarts() or "-"
    return f"{ends[0]}{sym}{ends[1]}"


def _atom_changed(prod_atom, reac_atom, remote: bool) -> bool:
    """Local-environment difference test
    (reference atoms_are_different, template_extractor.py:71-90)."""
    if prod_atom.GetAtomicNum() != reac_atom.GetAtomicNum():
        return True
    if prod_atom.GetNumRadicalElectrons() != reac_atom.GetNumRadicalElectrons():
        return True
    if remote:
        if prod_atom.GetFormalCharge() != reac_atom.GetFormalCharge():
            return True
        if prod_atom.GetTotalNumHs() != reac_atom.GetTotalNumHs():
            return True
    if _neighbor_maps(prod_atom) != _neighbor_maps(reac_atom):
        return True
    bonds1 = sorted(_bond_signature(b) for b in prod_atom.GetBonds())
    bonds2 = sorted(_bond_signature(b) for b in reac_atom.GetBonds())
    return bonds1 != bonds2


def changed_atoms(reactants, products, remote: bool = True
                  ) -> Tuple[list, List[str]]:
    """Mapped atoms whose environment differs between sides, plus reactant
    atoms with no product counterpart (leaving groups)
    (reference get_changed_atoms, template_extractor.py:145-196)."""
    prod_atoms, prod_tags = _mapped_atoms(products)
    reac_atoms, reac_tags = _mapped_atoms(reactants)
    atoms, tags = [], []
    for i, ptag in enumerate(prod_tags):
        for j, rtag in enumerate(reac_tags):
            if rtag != ptag or rtag in tags:
                continue
            if _atom_changed(prod_atoms[i], reac_atoms[j], remote):
                atoms.append(reac_atoms[j])
                tags.append(rtag)
                break
            if prod_tags.count(rtag) > 1:  # stoichiometry > 1
                atoms.append(reac_atoms[j])
                tags.append(rtag)
                break
    for j, rtag in enumerate(reac_tags):
        if rtag not in tags and rtag not in prod_tags:
            atoms.append(reac_atoms[j])
            tags.append(rtag)
    # reference clears isotope labels after detection (clear_isotope,
    # template_extractor.py:186-187) so fragments are isotope-free
    for mol in list(reactants) + list(products):
        for atom in mol.GetAtoms():
            atom.SetIsotope(0)
    return atoms, tags


# ---------------------------------------------------------------------------
# fragment SMARTS
# ---------------------------------------------------------------------------

def _strict_atom_smarts(atom, use_symbol: bool) -> str:
    """Strictest per-atom SMARTS label (reference
    get_strict_smarts_for_atom, template_extractor.py:355-375)."""
    if use_symbol:
        symbol = f"[{atom.GetSymbol()}:{atom.GetAtomMapNum()}]"
        if "H" in symbol and "Hg" not in symbol:
            symbol = symbol.replace("H", "")
        if atom.GetIsAromatic():
            symbol = symbol.lower()
    else:
        symbol = f"[A:{atom.GetAtomMapNum()}]"
    if atom.GetSymbol() == "H":
        symbol = "[#1]"
    if "[" not in symbol:
        symbol = f"[{symbol}]"
    return symbol


def fragments_for_changed_atoms(mols, tags: List[str], category: str,
                                settings: Dict) -> Tuple[str, bool, bool]:
    """Strict SMARTS fragments around changed atoms; reactant-side fragments
    absorb their unmapped atoms (leaving groups)
    (reference get_fragments_for_changed_atoms, template_extractor.py:377-424)."""
    retro = settings["retro"]
    fragments = ""
    mols_changed = []
    for mol in mols:
        replacements = []
        atoms_to_use = []
        for atom in mol.GetAtoms():
            smarts = atom.GetSmarts()
            if ":" not in smarts:
                continue
            if smarts.split(":")[1][:-1] not in tags:
                continue
            atoms_to_use.append(atom.GetIdx())
            symbol = _strict_atom_smarts(atom, settings["use_symbol"])
            if (category == "product" and retro) or \
                    (category == "reactant" and not retro):
                symbol = symbol.replace("@", "")
            if symbol != smarts:
                replacements.append((atom.GetIdx(), symbol))
        if category == "reactant" and atoms_to_use and retro:
            for atom in mol.GetAtoms():
                if not atom.HasProp("molAtomMapNumber"):
                    atoms_to_use.append(atom.GetIdx())
        if not atoms_to_use:
            continue
        symbols = [a.GetSmarts() for a in mol.GetAtoms()]
        for i, symbol in replacements:
            symbols[i] = symbol
        mol_copy = deepcopy(mol)
        for a in mol_copy.GetAtoms():
            a.ClearProp("molAtomMapNumber")
        frag = AllChem.MolFragmentToSmiles(
            mol_copy, atoms_to_use, atomSymbols=symbols, allHsExplicit=True,
            isomericSmiles=settings["use_stereo"], allBondsExplicit=True)
        fragments += f"({frag})."
        demapped = Chem.MolFromSmiles(Chem.MolToSmiles(mol, True))
        for a in demapped.GetAtoms():
            if a.HasProp("molAtomMapNumber"):
                a.ClearProp("molAtomMapNumber")
        mols_changed.append(Chem.MolToSmiles(demapped, True))
    intra_only = len(mols_changed) == 1
    dimer_only = len(set(mols_changed)) == 1 and len(mols_changed) == 2
    return fragments[:-1], intra_only, dimer_only


def canonicalize_smarts(smarts: str, use_symbol: bool) -> str:
    """Round-trip a labeled SMARTS through SMILES for a more canonical
    string (reference canonicalize_smarts, template_extractor.py:253-266)."""
    if use_symbol:
        return smarts
    preserved = {f"[#0:{a.split(':')[-1].split(']')[0]}]": a
                 for a in re.findall(r"\[.*?]", smarts)}
    try:
        smiles = Chem.MolToSmiles(Chem.MolFromSmarts(smarts))
        canon = Chem.MolToSmarts(Chem.MolFromSmiles(smiles))
    except Exception:
        return smarts
    if "(" not in canon:
        smarts = canon
        for k, v in preserved.items():
            smarts = smarts.replace(k, v)
    return smarts


# ---------------------------------------------------------------------------
# reaction preparation
# ---------------------------------------------------------------------------

def _replace_deuterated(smiles: str) -> str:
    return re.sub(r"\[2H\]", "[H]", smiles)


def split_reagents(reactant_str: str, product_str: str, least_atom_num: int
                   ) -> Tuple[List[str], List[str], List[str]]:
    """Drop trivial product fragments and move shared fragments to reagents
    (reference split_reagents, template_extractor.py:510-515)."""
    rs = _replace_deuterated(reactant_str).split(".")
    ps = _replace_deuterated(product_str).split(".")
    candidates = [Chem.MolFromSmiles(s).GetNumAtoms() for s in ps if s not in rs]
    least = min(max(candidates), least_atom_num) if candidates else least_atom_num
    ps = [s for s in ps if Chem.MolFromSmiles(s).GetNumAtoms() >= least]
    reagents = [s for s in rs if s in ps]
    return ([r for r in rs if r not in reagents],
            [p for p in ps if p not in reagents], reagents)


def _demap_except(smiles_list: List[str], keep_maps) -> list:
    """Strip atom maps not in keep_maps, re-canonicalize, sort by size desc
    (reference clean_map_and_sort, template_extractor.py:29-40)."""
    mols = []
    for smiles in smiles_list:
        if not smiles:
            continue
        mol = Chem.MolFromSmiles(smiles)
        for atom in mol.GetAtoms():
            if atom.GetAtomMapNum() not in keep_maps:
                atom.SetAtomMapNum(0)
        mols.append(Chem.MolFromSmiles(Chem.MolToSmiles(mol)))
    return sorted(mols, key=lambda m: m.GetNumAtoms(), reverse=True)


def extract_template(rxn_smiles_or_dict, settings: Optional[Dict] = None,
                     engine: str = "auto") -> Dict:
    """Extract a canonical retro template + edit labels from one mapped
    reaction (reference extract_from_reaction, template_extractor.py:517-626).

    Returns a dict with reaction_smarts / edits / H_change / Charge_change /
    Chiral_change / replacement_dict etc., or just {'reaction_id'} when the
    reaction cannot be processed.

    `engine`: 'rdkit' reproduces the reference's template strings (requires
    RDKit); 'native' runs the same pipeline on the own chem kit; 'auto'
    picks rdkit when importable, else native — keeping extraction and
    decoding (evaluation/template_decode.py) on the same engine.
    """
    if engine == "auto":
        engine = "rdkit" if HAS_RDKIT else "native"
    if engine == "native":
        from .native_extractor import extract_template_native
        return extract_template_native(rxn_smiles_or_dict, settings)
    _require_rdkit()
    settings = {**DEFAULT_SETTINGS, **(settings or {})}
    if isinstance(rxn_smiles_or_dict, str):
        parts = rxn_smiles_or_dict.split(">>")
        reaction = {"reactants": parts[0], "products": parts[1], "_id": 0}
    else:
        reaction = rxn_smiles_or_dict
    failure = {"reaction_id": reaction["_id"]}

    try:
        reactant_list, product_list, reagent_list = split_reagents(
            reaction["reactants"], reaction["products"],
            settings["least_atom_num"])
        product_maps = [a.GetAtomMapNum() for p in product_list
                        for a in Chem.MolFromSmiles(p).GetAtoms()]
        products = _demap_except(product_list, set(product_maps))
        reactants = []
        for mol in _demap_except(reactant_list, set(product_maps)):
            # fully unmapped reactants are spectators in retro mode
            if all(a.GetAtomMapNum() == 0 for a in mol.GetAtoms()):
                reagent_list.append(Chem.MolToSmiles(mol))
            else:
                reactants.append(mol)
        if None in reactants or None in products:
            return failure
        for i in range(len(reactants)):
            reactants[i] = AllChem.RemoveHs(reactants[i])
        for i in range(len(products)):
            products[i] = AllChem.RemoveHs(products[i])
        for mol in reactants + products:
            Chem.SanitizeMol(mol)
            mol.UpdatePropertyCache()
    except Exception:
        return failure

    atoms, tags = changed_atoms(reactants, products, settings["remote"])
    if not tags:
        return failure

    try:
        reactant_frags, intra_only, dimer_only = fragments_for_changed_atoms(
            reactants, tags, "reactant", settings)
        product_frags, _, _ = fragments_for_changed_atoms(
            products, tags, "product", settings)
    except ValueError:
        return failure

    transform = reactant_frags + ">>" + product_frags
    atom_props = {str(a.GetAtomMapNum()): {"charge": a.GetFormalCharge(),
                                           "Hs": a.GetNumExplicitHs()}
                  for a in atoms}
    canon_hook = (None if settings["use_symbol"]
                  else lambda s: canonicalize_smarts(s, settings["use_symbol"]))
    transform = ">>".join(reorder_sides(x) for x in transform.split(">>"))
    canonical, replacement_dict = reassign_atom_maps(
        transform, atom_props, retro=settings["retro"],
        canonicalize_smarts=canon_hook)

    reactants_string, products_string = canonical.split(">>")
    products_smiles = ".".join(Chem.MolToSmiles(p) for p in products)
    reactants_smiles = ".".join(Chem.MolToSmiles(r) for r in reactants)
    try:
        products_string = canonicalize_smarts(products_string,
                                              settings["use_symbol"])
        reactants_string = canonicalize_smarts(reactants_string,
                                               settings["use_symbol"])
    except Exception:
        pass

    if settings["retro"]:
        canonical_template = products_string + ">>" + reactants_string
    else:
        canonical_template = reactants_string + ">>" + products_string

    edits, h_change, charge_change, chiral_change = match_label(
        reactants_smiles, products_smiles, replacement_dict, tags,
        retro=settings["retro"], remote=settings["remote"],
        use_stereo=settings["use_stereo"])

    rxn = AllChem.ReactionFromSmarts(canonical_template)
    if rxn.Validate()[1] != 0:
        return failure

    return {
        "products": products_smiles,
        "reactants": reactants_smiles,
        "necessary_reagent": [Chem.MolToSmiles(m)
                              for m in _demap_except(reagent_list, set())],
        "reaction_smarts": canonical_template,
        "intra_only": intra_only,
        "dimer_only": dimer_only,
        "reaction_id": reaction["_id"],
        "replacement_dict": replacement_dict,
        "change_atoms": tags,
        "edits": edits,
        "H_change": h_change,
        "Charge_change": charge_change,
        "Chiral_change": chiral_change,
    }
