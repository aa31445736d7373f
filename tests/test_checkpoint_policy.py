"""CheckpointManager best/last policy semantics (reference ModelCheckpoint
monitor/save_top_k=1/save_last, main.py:358-360)."""

import os
import jax.numpy as jnp
import pytest

from textreact_tpu.train.checkpoint import CheckpointManager


def _state(v):
    return {"w": jnp.full((4,), float(v))}


def test_val_acc_mode_keeps_max(tmp_path):
    mgr = CheckpointManager(str(tmp_path), "val_acc")
    best = mgr.save_eval(_state(1), 0.5, None, epoch=0)
    assert best == 0.5
    best = mgr.save_eval(_state(2), 0.4, best, epoch=1)   # worse: best kept
    assert best == 0.5
    best = mgr.save_eval(_state(3), 0.7, best, epoch=2)   # better: replaced
    assert best == 0.7
    restored, meta = mgr.restore("best", _state(0))
    assert float(restored["w"][0]) == 3.0
    assert meta["epoch"] == 2 and meta["val_acc"] == 0.7
    # 'last' always tracks the most recent eval
    last, last_meta = mgr.restore("last", _state(0))
    assert last_meta["epoch"] == 2


def test_val_loss_mode_keeps_min(tmp_path):
    mgr = CheckpointManager(str(tmp_path), "val_loss")
    assert mgr.is_improvement(1.0, None)
    assert mgr.is_improvement(0.5, 1.0)
    assert not mgr.is_improvement(2.0, 1.0)


def test_clear_removes_checkpoints(tmp_path):
    mgr = CheckpointManager(str(tmp_path), "val_acc")
    mgr.save("best", _state(1), {"epoch": 0})
    assert mgr.exists("best")
    mgr.clear()
    assert not mgr.exists("best")


def test_async_save_publishes_atomically(tmp_path):
    """Async saves stay in <name>.ckpt.tmp until a flush point (exists/
    restore/finalize); a crash mid-write never leaves a visible half
    checkpoint, and the published one restores bit-exactly."""
    import jax.numpy as jnp
    import numpy as np
    from textreact_tpu.train.checkpoint import CheckpointManager

    state = {"w": jnp.arange(8, dtype=jnp.float32), "b": jnp.ones((3,))}
    mgr = CheckpointManager(str(tmp_path), "val_acc", async_save=True)
    mgr.save("last", state, {"epoch": 1})
    # published at the flush point, atomically
    assert mgr.exists("last")
    assert not os.path.isdir(os.path.join(str(tmp_path), "last.ckpt.tmp"))
    got, meta = mgr.restore("last", state)
    assert meta == {"epoch": 1}
    np.testing.assert_array_equal(np.asarray(got["w"]), np.arange(8))
    # overwriting save publishes the NEW contents
    state2 = {"w": jnp.arange(8, dtype=jnp.float32) * 2, "b": jnp.ones((3,))}
    mgr.save("last", state2, {"epoch": 2})
    mgr.finalize()
    got2, meta2 = mgr.restore("last", state)
    assert meta2 == {"epoch": 2}
    np.testing.assert_array_equal(np.asarray(got2["w"]), np.arange(8) * 2)
