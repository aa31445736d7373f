"""Retrosynthesis metric: top-k canonical-SMILES match rank.

Bit-faithful port target: reference textreact/evaluate.py:27-71
(canonical_smiles / _compare_pred_and_gold / evaluate_retrosynthesis):
canonicalize gold reactants, canonicalize each beam prediction, rank of the
first exact string match; top-k accuracy for k in {1,2,3,5,10,20}.

Canonicalization goes through chem.canonical_smiles (own canonicalizer, or
RDKit bit-parity when importable — rdkit_bridge).
"""

from __future__ import annotations

import multiprocessing
from typing import Any, Dict, List, Optional, Sequence

import pandas as pd

from ..chem import canonical_smiles
from ..chem.rdkit_bridge import HAS_RDKIT, rdkit_canonical_smiles

TOP_KS = (1, 2, 3, 5, 10, 20)
NO_MATCH = 100000


def _canon(smiles: str) -> str:
    if HAS_RDKIT:
        return rdkit_canonical_smiles(smiles)
    from ..chem.native import native_available
    if native_available():
        from ..chem.native import native_canonical_smiles
        return native_canonical_smiles(smiles)
    return canonical_smiles(smiles)


def compare_pred_and_gold(pred: Sequence[str], gold: str) -> int:
    """Rank (0-based) of the first prediction whose canonical form equals
    the canonical gold; NO_MATCH if none (reference evaluate.py:35-40).

    Without RDKit, the whole beam list is canonicalized in one C++ call
    (one ctypes crossing) when the native kernel is available."""
    if not HAS_RDKIT:
        from ..chem.native import native_available
        if native_available():
            from ..chem.native import native_canonical_batch
            for i, smiles in enumerate(native_canonical_batch(list(pred))):
                if smiles == gold:
                    return i
            return NO_MATCH
    for i, smiles in enumerate(_canon(s) for s in pred):
        if smiles == gold:
            return i
    return NO_MATCH


def evaluate_retrosynthesis(prediction: Dict[int, Dict[str, Any]],
                            data_df: pd.DataFrame, top_k: int,
                            template_based: bool = False,
                            template_path: Optional[str] = None,
                            num_workers: int = 0) -> Dict[int, float]:
    num_example = len(data_df)
    golds = list(data_df["reactant_smiles"])
    if num_workers > 1:
        with multiprocessing.Pool(num_workers) as p:
            gold_list = p.map(_canon, golds)
    else:
        gold_list = [_canon(g) for g in golds]

    if template_based:
        from .template_decode import decode_template_predictions
        pred_list = decode_template_predictions(
            prediction, data_df, template_path, top_k, num_workers=num_workers)
    else:
        pred_list = [prediction[i]["prediction"] for i in range(num_example)]

    # per-example prediction canonicalization + compare is the slow link at
    # USPTO-50K scale (num_beams x N strings): pooled like the reference
    # (evaluate.py:67, p.starmap(_compare_pred_and_gold, ...))
    if num_workers > 1:
        with multiprocessing.Pool(num_workers) as p:
            indices: List[int] = p.starmap(
                compare_pred_and_gold, zip(pred_list, gold_list),
                chunksize=max(1, num_example // (num_workers * 4)))
    else:
        indices = [compare_pred_and_gold(p, g)
                   for p, g in zip(pred_list, gold_list)]
    return {x: sum(i < x for i in indices) / num_example for x in TOP_KS}
