"""Data pipeline: corpus IO, neighbor selection, MLM, datasets, collation."""

from .collate import IGNORE_INDEX, Batch, Collator
from .corpus import (CONDITION_COLS, generate_train_label_corpus, read_corpus,
                     read_neighbors)
from .datasets import (DATASET_CLS, BaseDataset, ConditionDataset,
                       RetrosynthesisDataset, random_shuffle_reaction_smiles)
from .loader import DataLoader, example_rng
from .mlm import apply_span_mlm, reorder_masked_first
from .neighbors import (deduplicate_by_text, format_neighbor_text,
                        select_neighbor_texts, window_neighbor_texts)
from .templates import (TemplateTables, load_preprocessed_labels,
                        load_template_tables)

__all__ = [
    "IGNORE_INDEX", "Batch", "Collator", "CONDITION_COLS",
    "generate_train_label_corpus", "read_corpus", "read_neighbors",
    "DATASET_CLS", "BaseDataset", "ConditionDataset", "RetrosynthesisDataset",
    "random_shuffle_reaction_smiles", "DataLoader", "example_rng",
    "apply_span_mlm", "reorder_masked_first", "deduplicate_by_text",
    "format_neighbor_text", "select_neighbor_texts", "window_neighbor_texts",
    "TemplateTables", "load_preprocessed_labels", "load_template_tables",
]
