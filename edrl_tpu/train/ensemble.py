"""Deep-ensemble evaluation (``test_ensemble``, ``fusion_train.py:392-502``).

Loads the ``Multi_DE{1..5}_ResNet`` member checkpoints (same late-fusion
architecture, trained at different learning rates), averages their logits per
sample, computes the 10-metric uncertainty suite (Acc/AUC/AURC/EAURC/NLL/
Brier/F1/Recall/Kappa/ECE), and writes ``Metric.txt`` — the reference's
evaluation surface, minus its dependency on the missing ``metrics``/
``metrics2`` modules (rebuilt in ``edrl_tpu.train.metrics``).
"""

from __future__ import annotations

import os
import time
from typing import Dict, List, Sequence

import jax
import numpy as np

from edrl_tpu.config import EDRLConfig
from edrl_tpu.train import metrics as metrics_lib
from edrl_tpu.train.checkpoint import CheckpointManager
from edrl_tpu.train.trainer import TrainState, _normalize_output, init_state


def ensemble_predict(
    cfg: EDRLConfig,
    states: Sequence[TrainState],
    loader,
    model=None,
) -> Dict[str, np.ndarray]:
    """Average member softmax-free logits over the eval set (low-noise view).

    Returns targets, mean probabilities, and per-sample latency stats
    (the reference instrumented per-sample inference time,
    ``fusion_train.py:469-470``).
    """
    from edrl_tpu.train.trainer import make_model

    model = model or make_model(cfg)

    @jax.jit
    def forward(state, fundus, oct_vol, y):
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            fundus,
            oct_vol,
            y,
            train=False,
        )
        return _normalize_output(out)[0]

    targets: List[np.ndarray] = []
    probs: List[np.ndarray] = []
    latencies: List[float] = []
    for batch in loader.epoch(0):
        y = batch["label"]
        t0 = time.perf_counter()
        member_logits = [
            np.asarray(forward(s, batch["fundus_low"], batch["oct_low"], y))
            for s in states
        ]
        latencies.append((time.perf_counter() - t0) / len(y))
        mean_logits = np.mean(member_logits, axis=0)
        e = np.exp(mean_logits - mean_logits.max(axis=1, keepdims=True))
        probs.append(e / e.sum(axis=1, keepdims=True))
        targets.append(np.asarray(y))
    return {
        "targets": np.concatenate(targets),
        "probs": np.concatenate(probs),
        "latency_per_sample": float(np.mean(latencies)),
    }


def evaluate_ensemble(
    cfg: EDRLConfig,
    checkpoint_dirs: Sequence[str],
    loader,
    output_path: str = "Metric.txt",
) -> Dict[str, float]:
    """Load member checkpoints, run the suite, write ``Metric.txt``."""
    states = []
    for directory in checkpoint_dirs:
        _, template = init_state(cfg, 0)
        mgr = CheckpointManager(directory)
        name = "best" if mgr.best_info() is not None else "latest"
        states.append(mgr.restore(template, name))
    pred = ensemble_predict(cfg, states, loader)
    suite = metrics_lib.compute_uncertainty_metrics(pred["targets"], pred["probs"])
    suite["latency_per_sample_s"] = pred["latency_per_sample"]
    os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
    with open(output_path, "w") as f:
        for k, v in suite.items():
            f.write(f"{k}: {v:.6f}\n")
    return suite
