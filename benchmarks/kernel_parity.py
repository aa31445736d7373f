"""On-chip parity check of the fused grouped decode attention kernel."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), '..'))
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "tests")
from test_decode_attention import _ancestry_bias, _reference  # noqa: E402

from textreact_tpu.ops.decode_attention import grouped_decode_attention  # noqa: E402

rng = np.random.default_rng(0)
B, G, H, D, T, cur = 2, 20, 12, 64, 160, 100
q = jnp.asarray(rng.standard_normal((B, G, H, D)), jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((B, H, D, T, G)), jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((B, H, D, T, G)), jnp.bfloat16)
bias = _ancestry_bias(rng, B, G, T, cur)
scale = 1.0 / np.sqrt(D)
ref = np.asarray(_reference(q, k, v, bias, scale), np.float32)
got = np.asarray(grouped_decode_attention(q, k, v, bias, jnp.int32(cur),
                                          scale, interpret=False), np.float32)
print("max abs diff:", np.abs(got - ref).max())
np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)
print("TPU kernel parity OK at retro scale")
