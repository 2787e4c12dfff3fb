"""Classification losses.

Rebuilds the label-smoothed cross-entropy assembled inline in
``MedFusion.forward`` (``fusion_net.py:931-939``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def label_smoothing_cross_entropy(
    logits: jax.Array,
    labels: jax.Array,
    smoothing: float = 0.1,
) -> jax.Array:
    """Mean label-smoothed CE over the batch.

    The smoothed target distribution fills every class with
    ``smoothing / (num_classes - 1)`` and the true class with
    ``1 - smoothing`` — exactly the ``fill_ + scatter_`` construction at
    ``fusion_net.py:934-936``.
    """
    logits = logits.astype(jnp.float32)
    num_classes = logits.shape[-1]
    off_value = smoothing / max(num_classes - 1, 1)
    true_dist = jnp.full_like(logits, off_value)
    one_hot = jax.nn.one_hot(labels, num_classes, dtype=logits.dtype)
    true_dist = jnp.where(one_hot > 0, 1.0 - smoothing, true_dist)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    return jnp.mean(jnp.sum(-true_dist * log_probs, axis=-1))
