
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), '..'))
import time
import jax, jax.numpy as jnp, numpy as np
import optax
from ablate_train import make, batch_for, B
from textreact_tpu.train.optim import make_optimizer
from textreact_tpu.train.step import TrainState, make_loss_fn

module, cfg = make()
batch = batch_for()
params = module.init(jax.random.PRNGKey(0),
                     input_ids=batch["input_ids"], attention_mask=batch["attention_mask"],
                     decoder_input_ids=batch["decoder_input_ids"],
                     decoder_attention_mask=batch["decoder_attention_mask"], mlm_prefix_len=64)
loss_fn = make_loss_fn(module, cfg, dec_pad_id=0)
key = jax.random.key(1, impl="unsafe_rbg")

@jax.jit
def fwd(params):
    loss, _ = loss_fn(params, batch, key)
    return loss

@jax.jit
def fwdbwd(params):
    (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch, key)
    return loss, optax.global_norm(grads)

def t(f, *a, reps=10):
    o = f(*a); np.asarray(jax.tree.leaves(o)[0])
    t0 = time.perf_counter()
    for _ in range(reps): o = f(*a)
    np.asarray(jax.tree.leaves(o)[0])
    return (time.perf_counter() - t0) / reps

print(f"fwd: {t(fwd, params)*1e3:.1f} ms")
print(f"fwd+bwd: {t(fwdbwd, params)*1e3:.1f} ms")
