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

    def restore(self, template: TrainState, name: str = "latest") -> TrainState:
        """Restore into the structure of ``template`` (an abstract or concrete
        TrainState from ``init_state``)."""
        return self._ckptr.restore(self._path(name), template)
