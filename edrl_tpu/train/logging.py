"""Structured metric logging.

CSV columns identical to the reference's ``save_results``
(``fusion_train.py:85-115``): Epoch, Loss, Accuracy, Precision, Recall,
F1 Score, AUC, Specificity — so downstream tooling written against the
reference logs keeps working.  Ledger #9 fix: Loss is the epoch average, not
the last batch's MMD.
"""

from __future__ import annotations

import csv
import os

from edrl_tpu.train.metrics import EpochMetrics

_HEADER = [
    "Epoch",
    "Loss",
    "Accuracy",
    "Precision",
    "Recall",
    "F1 Score",
    "AUC",
    "Specificity",
]


class AverageMeter:
    """Running scalar average (``fusion_train.py:137-153``)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0
        self.avg = 0.0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


class CsvMetricWriter:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        if not os.path.exists(path):
            with open(path, "w", newline="") as f:
                csv.writer(f).writerow(_HEADER)

    def write(self, epoch: int, m: EpochMetrics):
        with open(self.path, "a", newline="") as f:
            csv.writer(f).writerow(
                [
                    epoch,
                    f"{m.loss:.6f}",
                    f"{m.accuracy:.4f}",
                    f"{m.precision:.4f}",
                    f"{m.recall:.4f}",
                    f"{m.f1:.4f}",
                    f"{m.auc:.4f}",
                    f"{m.specificity:.4f}",
                ]
            )
