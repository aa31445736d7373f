"""Pallas TPU kernels."""

from .topk import (corpus_norms_padded, exact_topk_l2, numpy_reference_topk,
                   pad_matrix)

__all__ = ["exact_topk_l2", "numpy_reference_topk", "pad_matrix",
           "corpus_norms_padded"]
