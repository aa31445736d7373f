"""Checkpointing: best/last semantics on the val metric (orbax).

Parity: reference main.py:358-360 (ModelCheckpoint monitor=val_metric,
save_top_k=1 -> 'best', save_last -> 'last'), main.py:389-397 (resume from
save_path/best|last unless --overwrite), utils.py:47-52 (clear_path).
"""

from __future__ import annotations

import json
import os
import shutil
import threading
from typing import Any, Optional, Tuple

import orbax.checkpoint as ocp

METRIC_MODE = {"val_loss": "min", "val_acc": "max"}


class CheckpointManager:
    def __init__(self, save_path: str, val_metric: str = "val_acc",
                 async_save: bool = True):
        self.save_path = os.path.abspath(save_path)
        self.val_metric = val_metric
        self.mode = METRIC_MODE[val_metric]
        os.makedirs(self.save_path, exist_ok=True)
        # AsyncCheckpointer copies device->host synchronously and writes to
        # disk in the background — safe with the donated train-step state
        # (the device buffers are reused by the next step) while hiding
        # multi-second writes behind training. Completed saves are
        # PUBLISHED (tmp dir renamed + meta written) by a background
        # publisher thread AS SOON AS the disk write completes — a crash
        # mid-write never leaves a visible half checkpoint, and a crash
        # any time after the write completes loses nothing (publishing
        # only at the next save call would leave the previous epoch's
        # finished checkpoint invisible for the whole following epoch).
        self.async_save = async_save
        if async_save:
            self._ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        else:
            self._ckptr = ocp.StandardCheckpointer()
        self._publisher: Optional[threading.Thread] = None
        self._publish_error: Optional[BaseException] = None

    def _publish(self, tmp: str, final: str, meta_path: str, meta: dict) -> None:
        try:
            self._ckptr.wait_until_finished()
            if os.path.isdir(final):
                shutil.rmtree(final)
            os.rename(tmp, final)
            tmp_meta = meta_path + ".tmp"
            with open(tmp_meta, "w") as f:
                json.dump(meta, f)
            os.rename(tmp_meta, meta_path)
        except BaseException as e:  # re-raised at the next flush point
            self._publish_error = e

    def _flush(self) -> None:
        """Wait for the in-flight write+publish (at most one)."""
        if self._publisher is not None:
            self._publisher.join()
            self._publisher = None
        if self._publish_error is not None:
            err, self._publish_error = self._publish_error, None
            raise err

    # --- paths ---
    def _dir(self, name: str) -> str:
        return os.path.join(self.save_path, f"{name}.ckpt")

    def _meta_path(self, name: str) -> str:
        return os.path.join(self.save_path, f"{name}.meta.json")

    def exists(self, name: str) -> bool:
        self._flush()
        return os.path.isdir(self._dir(name))

    def clear(self) -> None:
        """--overwrite: delete stale checkpoints (reference utils.py:47-52)."""
        self._flush()
        for entry in os.listdir(self.save_path):
            if (entry.endswith(".ckpt") or entry.endswith(".meta.json")
                    or entry.endswith(".ckpt.tmp")):
                full = os.path.join(self.save_path, entry)
                shutil.rmtree(full) if os.path.isdir(full) else os.remove(full)

    # --- save/load ---
    def save(self, name: str, state: Any, meta: Optional[dict] = None) -> None:
        self._flush()  # at most one write in flight
        final = self._dir(name)
        tmp = final + ".tmp"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        self._ckptr.save(tmp, state)
        self._publisher = threading.Thread(
            target=self._publish,
            args=(tmp, final, self._meta_path(name), meta or {}),
            daemon=True)
        self._publisher.start()
        if not self.async_save:
            self._flush()

    def restore(self, name: str, target: Any) -> Tuple[Any, dict]:
        """Restore directly into `target`'s shardings by handing orbax an
        abstract target (ShapeDtypeStruct + sharding per leaf) — restoring
        concrete arrays and re-device_put-ing afterwards would double peak
        host memory for large states. Flushes pending writes first (a
        just-saved 'best' must be restorable)."""
        self._flush()
        import jax

        def abstract(t):
            if isinstance(t, jax.Array):
                return jax.ShapeDtypeStruct(t.shape, t.dtype,
                                            sharding=t.sharding)
            return t

        state = self._ckptr.restore(self._dir(name),
                                    jax.tree.map(abstract, target))
        meta = {}
        if os.path.exists(self._meta_path(name)):
            with open(self._meta_path(name)) as f:
                meta = json.load(f)
        return state, meta

    def finalize(self) -> None:
        """Publish any in-flight save (call at the end of training)."""
        self._flush()

    # --- best/last policy ---
    def is_improvement(self, score: float, best: Optional[float]) -> bool:
        if best is None:
            return True
        return score > best if self.mode == "max" else score < best

    def save_eval(self, state: Any, score: float, best_score: Optional[float],
                  epoch: int) -> Optional[float]:
        """Save 'last' always; save 'best' on improvement. Returns the new
        best score (or the old one)."""
        meta = {"epoch": epoch, self.val_metric: score}
        self.save("last", state, meta)
        if self.is_improvement(score, best_score):
            self.save("best", state, meta)
            return score
        return best_score
