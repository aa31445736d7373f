"""Evaluation: metric parity with the reference + edit ranking/aggregation."""

from typing import Any, Dict

from .condition import evaluate_reaction_condition
from .edit_rank import device_topk_edits, edits_from_topk, rank_edits
from .retro import compare_pred_and_gold, evaluate_retrosynthesis

__all__ = ["evaluate_reaction_condition", "evaluate_retrosynthesis",
           "compare_pred_and_gold", "rank_edits", "device_topk_edits",
           "edits_from_topk", "gather_prediction_each_neighbor"]


def gather_prediction_each_neighbor(prediction: Dict[int, Dict[str, Any]],
                                    num_neighbors: int) -> Dict[int, Dict[str, Any]]:
    """Merge per-neighbor test predictions: expanded index i maps to example
    i // num_neighbors, concatenating prediction/score lists
    (reference utils.py:55-64)."""
    results: Dict[int, Dict[str, Any]] = {}
    for i, pred in sorted(prediction.items()):
        idx = i // num_neighbors
        if i % num_neighbors == 0:
            results[idx] = dict(pred)
        else:
            for key in results[idx]:
                results[idx][key] = results[idx][key] + pred[key]
    return results
