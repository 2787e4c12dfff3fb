"""Observability plots (reference cross-cutting layer, SURVEY.md section 1).

Rebuilds ``loss_plot`` / ``metrics_plot`` (``fusion_train.py:65-76,120-135``)
and ``visualize_student_t_distributions`` + the epoch PDF dump
(``fusion_net.py:446-479,852-868``).  matplotlib is imported lazily so
headless training never pays for it.
"""

from __future__ import annotations

import os
from typing import Sequence


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def loss_plot(losses: Sequence[float], path: str) -> str:
    plt = _plt()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    plt.figure()
    plt.plot(range(len(losses)), losses, label="loss")
    plt.legend()
    plt.savefig(path)
    plt.close()
    return path


def metrics_plot(series: dict, path: str) -> str:
    """{name: [values per epoch]} -> one figure with a line per metric."""
    plt = _plt()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    plt.figure()
    for name, values in series.items():
        plt.plot(range(len(values)), values, label=name)
    plt.legend()
    plt.savefig(path)
    plt.close()
    return path


def visualize_student_t_distributions(
    mu_pos, sigma_pos, v_pos, mu_neg, sigma_neg, v_neg, title: str, filename: str
) -> str:
    """Grid of positive/negative Student-t pdfs -> PDF file
    (``fusion_net.py:446-479``)."""
    import numpy as np
    from scipy.stats import t as student_t

    plt = _plt()
    n = len(mu_pos)
    cols = 4
    rows = (n + cols - 1) // cols
    x = np.linspace(-0.1, 0.1, 1000)
    fig, axes = plt.subplots(rows, cols, figsize=(20, 12), squeeze=False)
    axes = axes.flatten()
    for i in range(n):
        axes[i].plot(
            x,
            student_t.pdf(x, df=v_pos[i], loc=mu_pos[i], scale=sigma_pos[i]),
            label=f"Positive (v={v_pos[i]:.4f})",
            color="blue",
        )
        axes[i].plot(
            x,
            student_t.pdf(x, df=v_neg[i], loc=mu_neg[i], scale=sigma_neg[i]),
            label=f"Negative (v={v_neg[i]:.4f})",
            color="red",
        )
        axes[i].set_title(f"Sample {i + 1}")
        axes[i].legend()
        axes[i].grid(True)
    for i in range(n, rows * cols):
        fig.delaxes(axes[i])
    fig.suptitle(title)
    plt.tight_layout()
    os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
    plt.savefig(filename, format="pdf")
    plt.close(fig)
    return filename
