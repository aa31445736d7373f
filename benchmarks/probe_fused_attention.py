
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), '..'))
import jax, jax.numpy as jnp, numpy as np
from textreact_tpu.ops.fused_attention import fused_dropout_attention
assert jax.default_backend() != "cpu"
B, L, H, D = 4, 512, 12, 64
rng = np.random.default_rng(0)
q = jnp.asarray(rng.normal(size=(B, L, H, D)), jnp.bfloat16)
k = jnp.asarray(rng.normal(size=(B, L, H, D)), jnp.bfloat16)
v = jnp.asarray(rng.normal(size=(B, L, H, D)), jnp.bfloat16)
mask = jnp.asarray(np.concatenate([np.ones((B, 400)), np.zeros((B, 112))], 1), jnp.int32)
scale = 1.0 / np.sqrt(D)

def ref_attn(q, k, v):
    s = jnp.einsum("blhd,bmhd->bhlm", q, k, preferred_element_type=jnp.float32) * scale
    s = s + jnp.where(mask[:, None, None, :] > 0, 0.0, -1e9)
    p = jax.nn.softmax(s, -1)
    return jnp.einsum("bhlm,bmhd->blhd", p.astype(jnp.bfloat16), v,
                      preferred_element_type=jnp.float32).astype(jnp.bfloat16)

out0 = np.asarray(fused_dropout_attention(q, k, v, mask, 0.0, None, scale).astype(jnp.float32))
ref = np.asarray(ref_attn(q, k, v).astype(jnp.float32))
print("p=0 max err:", np.abs(out0 - ref).max())

key = jax.random.PRNGKey(3)
f = jax.jit(lambda r: fused_dropout_attention(q, k, v, mask, 0.1, r, scale))
outs = np.stack([np.asarray(f(jax.random.fold_in(key, i)).astype(jnp.float32)) for i in range(50)])
mean = outs.mean(0)
print("dropout mean err:", np.abs(mean - ref)[:, :400].max(), "(|ref| max:", np.abs(ref).max(), ")")
zero_frac = (outs[0] == 0).mean()
print("deterministic:", np.array_equal(outs[0], np.asarray(f(jax.random.fold_in(key, 0)).astype(jnp.float32))))
print("distinct across keys:", not np.array_equal(outs[0], outs[1]))
# empirical drop rate via linear probe: attention of one-hot v columns? cheap check:
# fraction of (prob-weighted) zeros isn't directly measurable; rely on mean test.
# grads run
g = jax.grad(lambda q: (fused_dropout_attention(q, k, v, mask, 0.1, key, scale).astype(jnp.float32) ** 2).sum())(q)
print("grad finite:", bool(jnp.isfinite(g.astype(jnp.float32)).all()))
