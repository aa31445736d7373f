"""Template preprocessing (offline, RDKit-gated): extraction + labeling.

Pure-string SMARTS canonicalization (smarts_canon) is RDKit-free; the graph
passes (extractor/labeling/processor) require RDKit, like the reference's
preprocess/template_extraction pipeline.
"""

from .smarts_canon import (count_atoms, enumerate_label_orders,
                           fragment_permutations, invert_chain,
                           invert_template, reassign_atom_maps, reorder_sides,
                           sort_fragments, template_score)

__all__ = [
    "count_atoms", "enumerate_label_orders", "fragment_permutations",
    "invert_chain", "invert_template", "reassign_atom_maps", "reorder_sides",
    "sort_fragments", "template_score", "extract_template",
    "TemplateProcessor",
]


def __getattr__(name):
    # lazy: the graph layers import-check RDKit availability at call time
    if name == "extract_template":
        from .extractor import extract_template
        return extract_template
    if name == "TemplateProcessor":
        from .processor import TemplateProcessor
        return TemplateProcessor
    raise AttributeError(name)
