"""Orbax checkpointing with best-accuracy pointer and full resume.

Upgrade over the reference (SURVEY.md section 5.4): the reference saved only
``{'epoch', 'state_dict'}`` at best val accuracy (``fusion_train.py:325-332``)
with no optimizer state and no mid-run resume.  Here the full
``TrainState`` (params + batch_stats + opt_state + step) is checkpointed, a
``best`` symlink-style pointer is kept, and ``restore`` resumes training
exactly — the standard discipline for preemptible TPU jobs.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from edrl_tpu.train.trainer import TrainState


class CheckpointManager:
    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def save(self, state: TrainState, name: str = "latest") -> str:
        path = self._path(name)
        self._ckptr.save(path, state, force=True)
        self._ckptr.wait_until_finished()
        return path

    def save_best(self, state: TrainState, epoch: int, accuracy: float) -> str:
        path = self.save(state, "best")
        with open(self._path("best.json"), "w") as f:
            json.dump({"epoch": epoch, "accuracy": accuracy}, f)
        return path

    def best_info(self) -> Optional[dict]:
        meta = self._path("best.json")
        if not os.path.exists(meta):
            return None
        with open(meta) as f:
            return json.load(f)

    def restore(
        self, template: TrainState, name: str = "latest", host_first: bool = True
    ) -> TrainState:
        """Restore into the structure of ``template`` (an abstract or concrete
        TrainState from ``init_state``).

        ``host_first`` restores every leaf to host numpy and ships the whole
        assembled tree with ONE batched ``jax.device_put`` — per-leaf
        device restores dispatch thousands of small synchronous transfers,
        which over a remote-TPU transport took ~10 minutes for the full-size
        state; the batched path is seconds.
        """
        path = self._path(name)
        if not host_first:
            return self._ckptr.restore(path, template)
        host_template = jax.tree_util.tree_map(_to_host_abstract, template)
        restored = self._ckptr.restore(path, host_template)
        return jax.tree_util.tree_map(
            lambda host, like: _device_put_like(host, like), restored, template
        )


def _to_host_abstract(x):
    """Template leaf -> host-side numpy placeholder of the same shape/dtype."""
    if hasattr(x, "shape") and hasattr(x, "dtype"):
        return np.zeros(x.shape, x.dtype)
    return x


def _device_put_like(host, like):
    """Ship a restored host leaf to the device/sharding of the template leaf
    (async dispatch — the caller's first use blocks on the whole batch)."""
    if isinstance(like, jax.Array) and hasattr(like, "sharding"):
        return jax.device_put(host, like.sharding)
    if hasattr(host, "shape"):
        return jax.device_put(host)
    return host
