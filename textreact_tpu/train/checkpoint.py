"""Checkpointing: best/last semantics on the val metric (orbax).

Parity: reference main.py:358-360 (ModelCheckpoint monitor=val_metric,
save_top_k=1 -> 'best', save_last -> 'last'), main.py:389-397 (resume from
save_path/best|last unless --overwrite), utils.py:47-52 (clear_path).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Optional, Tuple

import orbax.checkpoint as ocp

METRIC_MODE = {"val_loss": "min", "val_acc": "max"}


class CheckpointManager:
    def __init__(self, save_path: str, val_metric: str = "val_acc"):
        self.save_path = os.path.abspath(save_path)
        self.val_metric = val_metric
        self.mode = METRIC_MODE[val_metric]
        os.makedirs(self.save_path, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    # --- paths ---
    def _dir(self, name: str) -> str:
        return os.path.join(self.save_path, f"{name}.ckpt")

    def _meta_path(self, name: str) -> str:
        return os.path.join(self.save_path, f"{name}.meta.json")

    def exists(self, name: str) -> bool:
        return os.path.isdir(self._dir(name))

    def clear(self) -> None:
        """--overwrite: delete stale checkpoints (reference utils.py:47-52)."""
        for entry in os.listdir(self.save_path):
            if entry.endswith(".ckpt") or entry.endswith(".meta.json"):
                full = os.path.join(self.save_path, entry)
                shutil.rmtree(full) if os.path.isdir(full) else os.remove(full)

    # --- save/load ---
    def save(self, name: str, state: Any, meta: Optional[dict] = None) -> None:
        path = self._dir(name)
        if os.path.isdir(path):
            shutil.rmtree(path)
        self._ckptr.save(path, state)
        self._ckptr.wait_until_finished()
        with open(self._meta_path(name), "w") as f:
            json.dump(meta or {}, f)

    def restore(self, name: str, target: Any) -> Tuple[Any, dict]:
        """Restore directly into `target`'s shardings by handing orbax an
        abstract target (ShapeDtypeStruct + sharding per leaf) — restoring
        concrete arrays and re-device_put-ing afterwards would double peak
        host memory for large states."""
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
