"""Pallas kernel tests (interpret mode on the CPU test platform)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edrl_tpu.kernels import mk_mmd_pallas
from edrl_tpu.ops import mk_mmd


class TestMMDPallas:
    def test_matches_xla_path(self, rng):
        s = jnp.asarray(rng.normal(size=(16, 128)).astype(np.float32))
        t = jnp.asarray(rng.normal(size=(16, 128)).astype(np.float32) + 0.3)
        want = float(mk_mmd(s, t))
        got = float(mk_mmd_pallas(s, t, 2.0, 5, True))
        assert got == pytest.approx(want, rel=1e-4)

    def test_edrl_feature_shape(self, rng):
        """The production shape: [2B, 3072] fused features."""
        s = jnp.asarray(rng.normal(size=(32, 3072)).astype(np.float32))
        t = jnp.asarray(rng.normal(size=(32, 3072)).astype(np.float32) + 0.1)
        want = float(mk_mmd(s, t))
        got = float(mk_mmd_pallas(s, t, 2.0, 5, True))
        assert got == pytest.approx(want, rel=1e-3)

    def test_unaligned_falls_back_to_xla(self, rng):
        s = jnp.asarray(rng.normal(size=(5, 60)).astype(np.float32))
        t = jnp.asarray(rng.normal(size=(6, 60)).astype(np.float32))
        got = float(mk_mmd_pallas(s, t, 2.0, 5, True))
        want = float(mk_mmd(s, t))
        assert got == pytest.approx(want, rel=1e-5)

    def test_gradients_match_xla(self, rng):
        s = jnp.asarray(rng.normal(size=(8, 128)).astype(np.float32))
        t = jnp.asarray(rng.normal(size=(8, 128)).astype(np.float32) + 0.2)
        g_pallas = jax.grad(lambda a: mk_mmd_pallas(a, t, 2.0, 5, True))(s)
        g_xla = jax.grad(lambda a: mk_mmd(a, t))(s)
        np.testing.assert_allclose(
            np.asarray(g_pallas), np.asarray(g_xla), rtol=1e-4, atol=1e-6
        )

    def test_jittable(self, rng):
        s = jnp.asarray(rng.normal(size=(8, 128)).astype(np.float32))
        t = jnp.asarray(rng.normal(size=(8, 128)).astype(np.float32))
        f = jax.jit(lambda a, b: mk_mmd_pallas(a, b, 2.0, 5, True))
        assert np.isfinite(float(f(s, t)))
