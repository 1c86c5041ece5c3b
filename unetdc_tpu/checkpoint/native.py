"""Native checkpointing: msgpack pytree save/load + best-metric gating.

The reference saves only on new-best validation dice and has no resume
(train_DC_focal.py:349-358). We reproduce the best-metric gating and add
cheap resume (optimizer state + epoch counter included), using
flax.serialization msgpack — a single portable file, no torch.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, tree: Any, metadata: Optional[dict] = None):
    """Serialize a pytree (params / full train state) to `path` (msgpack)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    data = serialization.msgpack_serialize(_to_numpy_tree(tree))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    if metadata is not None:
        with open(path + ".meta.json", "w") as f:
            json.dump(metadata, f)


def load_checkpoint(path: str) -> Any:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def load_metadata(path: str) -> Optional[dict]:
    meta = path + ".meta.json"
    if os.path.exists(meta):
        with open(meta) as f:
            return json.load(f)
    return None


class BestMetricCheckpointer:
    """Save-on-new-best with early-stop patience, mirroring the reference
    training loops (best val dice, patience 5 — train_DC_focal.py:229-231).
    """

    def __init__(self, path: str, patience: int = 5, mode: str = "max"):
        self.path = path
        self.patience = patience
        self.mode = mode
        self.best: Optional[float] = None
        self.counter = 0

    def is_improvement(self, value: float) -> bool:
        if self.best is None:
            return True
        return value > self.best if self.mode == "max" else value < self.best

    def update(self, value: float, tree: Any, metadata: Optional[dict] = None
               ) -> bool:
        """Returns True if training should stop (patience exhausted)."""
        if self.is_improvement(value):
            self.best = value
            self.counter = 0
            md = dict(metadata or {})
            md["best_metric"] = float(value)
            save_checkpoint(self.path, tree, md)
            return False
        self.counter += 1
        return self.counter >= self.patience
