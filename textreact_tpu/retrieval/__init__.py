"""TPU-native exact retrieval engine (FAISS-flat parity)."""

from .convert import convert_tevatron_jsonl
from .engine import CORPUS_AXIS, FlatIndex, build_neighbor_file
from .fingerprints import (brute_force_rank, count_tanimoto_similarities,
                           molecule_fingerprints, reaction_fingerprints,
                           tanimoto_similarities)

__all__ = ["CORPUS_AXIS", "FlatIndex", "build_neighbor_file",
           "convert_tevatron_jsonl", "molecule_fingerprints",
           "reaction_fingerprints", "tanimoto_similarities",
           "count_tanimoto_similarities", "brute_force_rank"]
