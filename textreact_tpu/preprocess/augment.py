"""Training-set augmentation for USPTO-Condition.

Role of reference preprocess/uspto_script/get_aug_condition_data.py:
replicate each train reaction N times with randomized SMILES (fragment
order + atom order), keeping the condition labels.
"""

from __future__ import annotations

import random

import pandas as pd

from ..data.datasets import random_shuffle_reaction_smiles


def augment_condition_train(df: pd.DataFrame, n: int = 5,
                            seed: int = 0,
                            rxn_col: str = "canonical_rxn") -> pd.DataFrame:
    """Each row becomes n rows: the original + (n-1) randomized variants."""
    rng = random.Random(seed)
    rows = []
    for _, row in df.iterrows():
        rows.append(row)
        for _ in range(n - 1):
            aug = row.copy()
            aug[rxn_col] = random_shuffle_reaction_smiles(row[rxn_col], rng, p=1.0)
            rows.append(aug)
    return pd.DataFrame(rows).reset_index(drop=True)
