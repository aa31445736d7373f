"""Trained-like decode latency: beams that emit EOS early exercise the
while_loop early exit + window segmentation (untrained worst case runs all
160 steps). EOS is induced by biasing the LM head's EOS logit."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), '..'))
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ablate_beam import B, K, L, T, build, timeit
from textreact_tpu.inference.predictor import Generator

if __name__ == "__main__":
    eos_bias = float(sys.argv[1]) if len(sys.argv) > 1 else 4.0
    module, params, batch = build()
    eos = module.decoder_config.eos_token_id
    bias = params["params"]["decoder"]["lm_head"]["bias"]
    params["params"]["decoder"]["lm_head"]["bias"] = bias.at[eos].add(eos_bias)
    gen = Generator(module, params, num_beams=K, max_length=T)
    t, seqs, scores = timeit(gen, batch)
    lens = (np.asarray(seqs) != module.decoder_config.pad_token_id).sum(-1)
    print(f"early-EOS decode (bias {eos_bias}): {t*1e3:.0f} ms/batch "
          f"({B/t:.0f} ex/s), mean seq len {lens.mean():.1f}", flush=True)
