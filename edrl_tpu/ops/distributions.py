"""Divergences and entropy regularizers over diagonal Gaussians / categoricals.

Rebuilds ``KL_between_normals`` (``fusion_net.py:390-402``), the EPRL entropy
regularizer (``fusion_net.py:127-131``), and the JS divergence used for logit
distillation (``code/MMD.py:76-95``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def kl_between_normals(
    mu_q: jax.Array,
    sigma_q: jax.Array,
    mu_p: jax.Array,
    sigma_p: jax.Array,
    axis: int = 1,
) -> jax.Array:
    """KL(N(mu_q, diag sigma_q^2) || N(mu_p, diag sigma_p^2)) summed over ``axis``.

    Parity: ``fusion_net.py:390-402``.  The reference sums over dim 1 of
    whatever it is given (for EDRL, the ``[B, num_classes, z]`` proxy tensors,
    so the "dimensionality" k is the class axis — preserved as-executed via
    the ``axis`` argument).  Log terms are clamped at 1e-8 as in the
    reference.
    """
    mu_q = mu_q.astype(jnp.float32)
    sigma_q = sigma_q.astype(jnp.float32)
    mu_p = mu_p.astype(jnp.float32)
    sigma_p = sigma_p.astype(jnp.float32)
    k = mu_q.shape[axis]
    mu_diff_sq = jnp.square(mu_p - mu_q)
    logdet_q = jnp.sum(2.0 * jnp.log(jnp.maximum(sigma_q, 1e-8)), axis=axis)
    logdet_p = jnp.sum(2.0 * jnp.log(jnp.maximum(sigma_p, 1e-8)), axis=axis)
    var_p = jnp.square(sigma_p)
    fs = jnp.sum(jnp.square(sigma_q) / var_p, axis=axis) + jnp.sum(
        mu_diff_sq / var_p, axis=axis
    )
    two_kl = fs - k + logdet_p - logdet_q
    return 0.5 * two_kl


def kl_to_standard_normal(mu: jax.Array, sigma: jax.Array, axis: int = 1) -> jax.Array:
    """mean KL(N(mu, sigma) || N(0, I)) — the EDRL information-bottleneck term.

    Parity: ``MedFusion.get_KL_loss`` (``fusion_net.py:838-850``).
    """
    kl = kl_between_normals(
        mu, sigma, jnp.zeros_like(mu), jnp.ones_like(sigma), axis=axis
    )
    return jnp.mean(kl)


def entropy_regularization(logits: jax.Array) -> jax.Array:
    """Mean entropy of softmax(logits) rows (``fusion_net.py:127-131``)."""
    logits = logits.astype(jnp.float32)
    log_p = jax.nn.log_softmax(logits, axis=1)
    p = jnp.exp(log_p)
    return jnp.mean(-jnp.sum(p * log_p, axis=1))


def kl_divergence_categorical(p: jax.Array, q: jax.Array) -> jax.Array:
    """mean_i sum_j p_ij log(p_ij / q_ij)  (``code/MMD.py:92-95``)."""
    p = p.astype(jnp.float32)
    q = q.astype(jnp.float32)
    ratio = jnp.log(jnp.maximum(p, 1e-12)) - jnp.log(jnp.maximum(q, 1e-12))
    return jnp.mean(jnp.sum(p * ratio, axis=1))


def js_divergence(p: jax.Array, q: jax.Array) -> jax.Array:
    """Jensen-Shannon divergence between categorical rows (``code/MMD.py:76-90``)."""
    m = 0.5 * (p + q)
    return 0.5 * (kl_divergence_categorical(p, m) + kl_divergence_categorical(q, m))
