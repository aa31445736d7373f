"""Parallelism correctness on the fake 8-device CPU mesh: TP-sharded and
DP-sharded training steps must reproduce single-device numerics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from textreact_tpu.config import ExperimentConfig
from textreact_tpu.models import BERT_L6_DECODER, SCIBERT_BASE, EncoderDecoder
from textreact_tpu.parallel.mesh import batch_sharding, make_mesh
from textreact_tpu.parallel.sharding import (ensure_mesh_placement,
                                             param_spec, shard_params)
from textreact_tpu.train.optim import make_optimizer
from textreact_tpu.train.step import TrainState, make_train_step

ENC = SCIBERT_BASE.replace(vocab_size=128, hidden_size=64,
                           num_hidden_layers=2, num_attention_heads=4,
                           intermediate_size=128, max_position_embeddings=64,
                           type_vocab_size=1)
DEC = BERT_L6_DECODER.replace(vocab_size=64, hidden_size=64,
                              num_hidden_layers=2, num_attention_heads=4,
                              intermediate_size=128,
                              max_position_embeddings=32)


def _setup(dp, tp, B=8):
    module = EncoderDecoder(encoder_config=ENC, decoder_config=DEC,
                            dtype=jnp.float32)
    cfg = ExperimentConfig(task="condition", compute_dtype="float32")
    rng = np.random.default_rng(0)
    batch = {
        "input_ids": jnp.asarray(rng.integers(1, 128, (B, 32)), jnp.int32),
        "attention_mask": jnp.ones((B, 32), jnp.int32),
        "decoder_input_ids": jnp.asarray(rng.integers(1, 64, (B, 8)), jnp.int32),
        "decoder_attention_mask": jnp.ones((B, 8), jnp.int32),
        "example_mask": jnp.ones((B,), jnp.int32),
        "indices": jnp.arange(B, dtype=jnp.int32),
    }
    params = module.init(jax.random.PRNGKey(0),
                         input_ids=batch["input_ids"],
                         attention_mask=batch["attention_mask"],
                         decoder_input_ids=batch["decoder_input_ids"],
                         decoder_attention_mask=batch["decoder_attention_mask"])
    mesh = make_mesh(dp, tp)
    with mesh:
        sharded = shard_params(mesh, params)
        tx = make_optimizer(cfg, 100)
        state = ensure_mesh_placement(mesh, TrainState.create(sharded, tx))
        step = make_train_step(module, cfg, tx, dec_pad_id=0)
        dbatch = {k: jax.device_put(v, batch_sharding(mesh))
                  for k, v in batch.items()}
        new_state, metrics = step(state, dbatch, jax.random.PRNGKey(1))
        loss = float(metrics["train_loss"])
        grad_norm = float(metrics["grad_norm"])
    return loss, grad_norm, new_state


def test_dp_and_tp_match_single_device():
    loss_1, gn_1, state_1 = _setup(dp=1, tp=1)
    loss_dp, gn_dp, _ = _setup(dp=4, tp=1)
    loss_tp, gn_tp, _ = _setup(dp=1, tp=2)
    loss_dptp, gn_dptp, _ = _setup(dp=2, tp=2)
    for loss, gn in [(loss_dp, gn_dp), (loss_tp, gn_tp), (loss_dptp, gn_dptp)]:
        np.testing.assert_allclose(loss, loss_1, rtol=1e-4)
        np.testing.assert_allclose(gn, gn_1, rtol=1e-3)


def test_generation_with_tp_sharded_params_matches_single_device():
    """Beam generation must run unchanged on TP-sharded parameters (the
    trainer calls Generator on the mesh-placed train state): sequences and
    scores equal the replicated single-device result."""
    from textreact_tpu.inference.predictor import Generator

    module = EncoderDecoder(encoder_config=ENC, decoder_config=DEC,
                            dtype=jnp.float32)
    rng = np.random.default_rng(1)
    B = 4
    batch = {
        "input_ids": jnp.asarray(rng.integers(1, 128, (B, 32)), jnp.int32),
        "attention_mask": jnp.ones((B, 32), jnp.int32),
    }
    params = module.init(jax.random.PRNGKey(3),
                         input_ids=batch["input_ids"],
                         attention_mask=batch["attention_mask"],
                         decoder_input_ids=jnp.zeros((B, 4), jnp.int32),
                         decoder_attention_mask=jnp.ones((B, 4), jnp.int32))
    ref_seqs, ref_scores = Generator(module, params, num_beams=3,
                                     max_length=8).generate(batch)
    mesh = make_mesh(2, 4)
    with mesh:
        sharded = shard_params(mesh, params)
        seqs, scores = Generator(module, sharded, num_beams=3,
                                 max_length=8).generate(batch)
    np.testing.assert_array_equal(seqs, ref_seqs)
    np.testing.assert_allclose(scores, ref_scores, rtol=1e-5, atol=1e-5)


def test_param_spec_rules():
    from jax.tree_util import DictKey
    import numpy as np

    def path(*names):
        return tuple(DictKey(n) for n in names)

    v2 = np.zeros((4, 4))
    v1 = np.zeros((4,))
    assert str(param_spec(path("encoder", "layer_0", "attention", "query", "kernel"), v2)) \
        == "PartitionSpec(None, 'tp')"
    assert str(param_spec(path("encoder", "layer_0", "attention", "output", "kernel"), v2)) \
        == "PartitionSpec('tp', None)"
    assert str(param_spec(path("encoder", "layer_0", "ffn", "intermediate", "kernel"), v2)) \
        == "PartitionSpec(None, 'tp')"
    assert str(param_spec(path("encoder", "layer_0", "ffn", "output", "kernel"), v2)) \
        == "PartitionSpec('tp', None)"
    # embeddings + norms replicated
    assert param_spec(path("embeddings", "word_embeddings", "embedding"), v2) \
        == param_spec(path("layer_0", "attention_norm", "scale"), v1)


def test_zero1_matches_replicated():
    from textreact_tpu.parallel.sharding import zero1_opt_state
    loss_ref, gn_ref, _ = _setup(dp=4, tp=1)

    module = EncoderDecoder(encoder_config=ENC, decoder_config=DEC,
                            dtype=jnp.float32)
    cfg = ExperimentConfig(task="condition", compute_dtype="float32")
    rng = np.random.default_rng(0)
    B = 8
    batch = {
        "input_ids": jnp.asarray(rng.integers(1, 128, (B, 32)), jnp.int32),
        "attention_mask": jnp.ones((B, 32), jnp.int32),
        "decoder_input_ids": jnp.asarray(rng.integers(1, 64, (B, 8)), jnp.int32),
        "decoder_attention_mask": jnp.ones((B, 8), jnp.int32),
        "example_mask": jnp.ones((B,), jnp.int32),
        "indices": jnp.arange(B, dtype=jnp.int32),
    }
    params = module.init(jax.random.PRNGKey(0),
                         input_ids=batch["input_ids"],
                         attention_mask=batch["attention_mask"],
                         decoder_input_ids=batch["decoder_input_ids"],
                         decoder_attention_mask=batch["decoder_attention_mask"])
    mesh = make_mesh(4, 1)
    with mesh:
        sharded = shard_params(mesh, params)
        tx = make_optimizer(cfg, 100)
        state = ensure_mesh_placement(mesh, TrainState.create(sharded, tx))
        state = state.replace(opt_state=zero1_opt_state(mesh, state.opt_state))
        step = make_train_step(module, cfg, tx, dec_pad_id=0)
        dbatch = {k: jax.device_put(v, batch_sharding(mesh))
                  for k, v in batch.items()}
        new_state, metrics = step(state, dbatch, jax.random.PRNGKey(1))
        np.testing.assert_allclose(float(metrics["train_loss"]), loss_ref, rtol=1e-4)
        np.testing.assert_allclose(float(metrics["grad_norm"]), gn_ref, rtol=1e-3)
        # two steps chain fine with sharded moments
        new_state, metrics = step(new_state, dbatch, jax.random.PRNGKey(2))
        assert np.isfinite(float(metrics["train_loss"]))


def test_zero1_checkpoint_roundtrip(tmp_path):
    """ZeRO-1-sharded optimizer state survives an orbax save/restore with
    its dp shardings reattached."""
    from textreact_tpu.parallel.sharding import zero1_opt_state
    from textreact_tpu.train.checkpoint import CheckpointManager
    module = EncoderDecoder(encoder_config=ENC, decoder_config=DEC,
                            dtype=jnp.float32)
    cfg = ExperimentConfig(task="condition", compute_dtype="float32")
    batch_ids = jnp.ones((4, 8), jnp.int32)
    params = module.init(jax.random.PRNGKey(0),
                         input_ids=batch_ids,
                         attention_mask=jnp.ones((4, 8), jnp.int32),
                         decoder_input_ids=batch_ids,
                         decoder_attention_mask=jnp.ones((4, 8), jnp.int32))
    mesh = make_mesh(4, 1)
    with mesh:
        tx = make_optimizer(cfg, 10)
        state = ensure_mesh_placement(
            mesh, TrainState.create(shard_params(mesh, params), tx))
        state = state.replace(opt_state=zero1_opt_state(mesh, state.opt_state))
        mgr = CheckpointManager(str(tmp_path), "val_acc")
        mgr.save("best", state, {"epoch": 3})
        restored, meta = mgr.restore("best", state)
        assert meta["epoch"] == 3
        for a, b in zip(jax.tree.leaves(state.params),
                        jax.tree.leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # shardings preserved on restore
        for a, b in zip(jax.tree.leaves(state.opt_state),
                        jax.tree.leaves(restored.opt_state)):
            if hasattr(a, "sharding"):
                assert a.sharding == b.sharding, (a.sharding, b.sharding)


def _elastic_state(mesh, module, cfg, params, zero1=False):
    """Canonical mesh-placed TrainState exactly as the trainer builds it."""
    from textreact_tpu.parallel.sharding import zero1_opt_state
    with mesh:
        tx = make_optimizer(cfg, 100)
        state = ensure_mesh_placement(
            mesh, TrainState.create(shard_params(mesh, params), tx))
        if zero1:
            state = state.replace(
                opt_state=zero1_opt_state(mesh, state.opt_state))
    return state, tx


@pytest.mark.parametrize("save_shape,load_shape,zero1", [
    ((8, 1), (4, 1), False),   # dp shrink (the classic elasticity path)
    ((4, 2), (2, 2), True),    # dp shrink under ZeRO-1 sharded moments
    ((4, 2), (8, 1), True),    # tp collapse + dp grow
])
def test_checkpoint_elastic_reshard(tmp_path, save_shape, load_shape, zero1):
    """Save on one mesh shape, restore on another (reference gets this free
    from Lightning's rank-agnostic ckpts, main.py:389-397): params must be
    bit-identical, land in the TARGET mesh's shardings, and the next train
    step must produce the same loss as continuing on the original mesh."""
    from textreact_tpu.train.checkpoint import CheckpointManager

    module = EncoderDecoder(encoder_config=ENC, decoder_config=DEC,
                            dtype=jnp.float32)
    cfg = ExperimentConfig(task="condition", compute_dtype="float32")
    rng = np.random.default_rng(0)
    B = 8
    batch = {
        "input_ids": jnp.asarray(rng.integers(1, 128, (B, 32)), jnp.int32),
        "attention_mask": jnp.ones((B, 32), jnp.int32),
        "decoder_input_ids": jnp.asarray(rng.integers(1, 64, (B, 8)), jnp.int32),
        "decoder_attention_mask": jnp.ones((B, 8), jnp.int32),
        "example_mask": jnp.ones((B,), jnp.int32),
        "indices": jnp.arange(B, dtype=jnp.int32),
    }
    params = module.init(jax.random.PRNGKey(0),
                         input_ids=batch["input_ids"],
                         attention_mask=batch["attention_mask"],
                         decoder_input_ids=batch["decoder_input_ids"],
                         decoder_attention_mask=batch["decoder_attention_mask"])
    # host copies: device_put may alias these buffers into state_a, and the
    # donating train step would delete them before the mesh_b placement
    params = jax.tree.map(np.asarray, params)

    # --- train one step on the save mesh, checkpoint the state ---
    mesh_a = make_mesh(*save_shape)
    state_a, tx_a = _elastic_state(mesh_a, module, cfg, params, zero1)
    step_a = make_train_step(module, cfg, tx_a, dec_pad_id=0)
    with mesh_a:
        dbatch_a = {k: jax.device_put(v, batch_sharding(mesh_a))
                    for k, v in batch.items()}
        state_a, _ = step_a(state_a, dbatch_a, jax.random.PRNGKey(1))
        mgr = CheckpointManager(str(tmp_path), "val_acc")
        mgr.save("last", state_a, {"epoch": 0})
        mgr.finalize()
        saved_params = [np.asarray(x) for x in jax.tree.leaves(state_a.params)]
        # reference next-step loss: continue on the save mesh (donates state_a)
        _, m_ref = step_a(state_a, dbatch_a, jax.random.PRNGKey(2))
        loss_ref = float(m_ref["train_loss"])

    # --- restore into the load mesh's canonical shardings ---
    mesh_b = make_mesh(*load_shape)
    target, tx_b = _elastic_state(mesh_b, module, cfg, params, zero1)
    restored, meta = mgr.restore("last", target)
    assert meta["epoch"] == 0
    with mesh_b:
        restored = ensure_mesh_placement(mesh_b, restored)

        # params bit-identical across the reshard
        for a, b in zip(saved_params, jax.tree.leaves(restored.params)):
            np.testing.assert_array_equal(a, np.asarray(b))
        # every leaf landed in the TARGET's shardings (mesh_b, not mesh_a)
        for t, r in zip(jax.tree.leaves(target), jax.tree.leaves(restored)):
            if hasattr(t, "sharding"):
                assert r.sharding == t.sharding, (r.sharding, t.sharding)
                assert r.sharding.mesh.shape == dict(
                    zip(("dp", "tp"), load_shape))

        # one more step on the restored state reproduces the reference loss
        step_b = make_train_step(module, cfg, tx_b, dec_pad_id=0)
        dbatch_b = {k: jax.device_put(v, batch_sharding(mesh_b))
                    for k, v in batch.items()}
        _, m_b = step_b(restored, dbatch_b, jax.random.PRNGKey(2))
        np.testing.assert_allclose(float(m_b["train_loss"]), loss_ref,
                                   rtol=1e-4)
