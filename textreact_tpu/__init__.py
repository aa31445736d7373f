"""textreact_tpu — a TPU-native retrieval-augmented predictive-chemistry framework.

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capabilities of the
TextReact system (EMNLP 2023): SMILES→text retrieval plus text-augmented
reaction-condition recommendation and retrosynthesis prediction.

Layers (mirroring reference layer map, SURVEY.md §1):
  chem/        host-side chemistry kit (own SMILES parser/canonicalizer/fingerprints)
  tokenizers/  condition, SMILES-regex, WordPiece text, and joint tokenizers
  data/        corpus/neighbor/MLM pipeline producing fixed-shape batches
  models/      flax transformer encoder-decoder + template heads
  ops/         Pallas TPU kernels (retrieval matmul+top-k, ...)
  retrieval/   sharded exact nearest-neighbor engine (FAISS-flat parity)
  parallel/    mesh construction and sharding rules
  train/       pjit train step, optimizer, checkpointing, trainer loop
  inference/   jit greedy/beam decoding
  evaluation/  metric parity with reference evaluate.py
  cli/         entrypoint mirroring the reference flag surface
"""

__version__ = "0.1.0"
