"""TPU-native exact retrieval engine (FAISS-flat parity)."""

from .engine import CORPUS_AXIS, FlatIndex, build_neighbor_file

__all__ = ["CORPUS_AXIS", "FlatIndex", "build_neighbor_file"]
