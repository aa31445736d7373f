"""Template preprocessing (offline): extraction + labeling, dual engine.

Pure-string SMARTS canonicalization (smarts_canon) is engine-free. The
graph passes run on either engine: the RDKit engine (extractor.py /
labeling.py) reproduces the reference's preprocess/template_extraction
strings byte-for-byte when RDKit is importable; the native engine
(native_extractor.py / native_labeling.py) runs the same pipeline on the
own chem kit, so template extraction works in RDKit-less environments and
its templates round-trip through the own reaction engine.
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
