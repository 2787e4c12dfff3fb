"""Pallas TPU kernels for the hot loss math."""

from edrl_tpu.kernels.mmd_pallas import mk_mmd_pallas

__all__ = ["mk_mmd_pallas"]
