"""Template application: predicted (edit site, template class) -> reactants.

Role of reference textreact/template_decoder.py (get_pred_smiles_from_templates
-> RunReactants -> fix H/charge/chirality -> demap). Applying a retro
template requires SMARTS substructure matching and graph rewriting: with
RDKit importable the bridge twin (_rdkit_template_apply) runs the
reference's exact engine for bit-parity; otherwise the native engine
(chem/smarts.py + chem/reaction.py via _own_template_apply) decodes with
the same semantics, so template-based retro evaluation works in RDKit-less
environments too."""

from __future__ import annotations

import os
from typing import Any, Dict, List

import pandas as pd

from ..chem.rdkit_bridge import HAS_RDKIT


def load_template_infos(template_path: str) -> Dict[str, Dict]:
    import ast
    df = pd.read_csv(os.path.join(template_path, "template_infos.csv"))
    return {df["Template"][i]: {
        "edit_site": ast.literal_eval(df["edit_site"][i]),
        "change_H": ast.literal_eval(df["change_H"][i]),
        "change_C": ast.literal_eval(df["change_C"][i]),
        "change_S": ast.literal_eval(df["change_S"][i]),
    } for i in df.index}


def decode_template_predictions(prediction: Dict[int, Dict[str, Any]],
                                data_df: pd.DataFrame, template_path: str,
                                top_k: int, num_workers: int = 0
                                ) -> List[List[str]]:
    """Per-example list of decoded reactant SMILES (reference
    evaluate.py:47-64)."""
    atom_df = pd.read_csv(os.path.join(template_path, "atom_templates.csv"))
    bond_df = pd.read_csv(os.path.join(template_path, "bond_templates.csv"))
    atom_templates = dict(zip(atom_df["Class"], atom_df["Template"]))
    bond_templates = dict(zip(bond_df["Class"], bond_df["Template"]))
    template_infos = load_template_infos(template_path)

    args = []
    for i in range(len(data_df)):
        pred = prediction[i]
        pred_prob = [(*p, s) for p, s in zip(pred["prediction"], pred["score"])]
        args.append((pred_prob, data_df["product_smiles"][i]))

    if num_workers > 1:
        import multiprocessing
        from functools import partial
        fn = partial(_decode_one_star, atom_templates=atom_templates,
                     bond_templates=bond_templates,
                     template_infos=template_infos, top_k=top_k)
        with multiprocessing.Pool(num_workers) as p:
            return p.map(fn, args)
    return [_decode_one(pp, prod, atom_templates, bond_templates,
                        template_infos, top_k) for pp, prod in args]


def _decode_one_star(arg, **kw):
    return _decode_one(*arg, **kw)


def _decode_one(template_preds, product, atom_templates, bond_templates,
                template_infos, top_k) -> List[str]:
    """Apply ranked edits until top_k distinct valid reactant sets are found
    (reference template_decoder.py:20-37)."""
    if HAS_RDKIT:
        from . import _rdkit_template_apply as impl
    else:
        from . import _own_template_apply as impl
    return impl.apply_ranked_edits(template_preds, product, atom_templates,
                                   bond_templates, template_infos, top_k)
