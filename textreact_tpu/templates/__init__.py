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
    "sort_fragments", "template_score",
]
