"""Fused MLP Pallas kernel: value + gradient parity vs XLA references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edrl_tpu.kernels.fused_mlp import fused_mlp, mlp_reference


def _make(rng, m=32, c=16, h=64, dtype=jnp.float32):
    u = jnp.asarray(rng.normal(size=(m, c)).astype(np.float32), dtype)
    w1 = jnp.asarray(rng.normal(size=(c, h)).astype(np.float32)) * 0.3
    b1 = jnp.asarray(rng.normal(size=(h,)).astype(np.float32)) * 0.1
    w2 = jnp.asarray(rng.normal(size=(h, c)).astype(np.float32)) * 0.3
    b2 = jnp.asarray(rng.normal(size=(c,)).astype(np.float32)) * 0.1
    return u, w1, b1, w2, b2


class TestForward:
    def test_matches_reference(self, rng):
        args = _make(rng)
        got = fused_mlp(*args, True)
        want = mlp_reference(*args)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-2, rtol=1e-2
        )

    def test_bf16_io(self, rng):
        args = _make(rng, dtype=jnp.bfloat16)
        got = fused_mlp(*args, True)
        assert got.dtype == jnp.bfloat16
        want = mlp_reference(*args)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=5e-2, rtol=2e-2,
        )

    def test_hidden_blocking(self, rng):
        """Large H forces multiple hidden blocks through the accumulator."""
        from edrl_tpu.kernels import fused_mlp as mod

        args = _make(rng, m=16, c=8, h=32)
        orig = mod._hidden_block
        mod._hidden_block = lambda c, h, budget_bytes=0: h // 4
        try:
            got = fused_mlp(*args, True)
        finally:
            mod._hidden_block = orig
        want = mlp_reference(*args)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-2, rtol=1e-2
        )

    def test_token_blocking(self, rng):
        from edrl_tpu.kernels import fused_mlp as mod

        args = _make(rng, m=64, c=8, h=16)
        orig = mod._pick_block
        mod._pick_block = lambda total, target: min(total, 16)
        try:
            got = fused_mlp(*args, True)
        finally:
            mod._pick_block = orig
        want = mlp_reference(*args)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-2, rtol=1e-2
        )


class TestBackward:
    def _grads(self, fn, args):
        def loss(*a):
            return jnp.sum(jnp.square(fn(*a).astype(jnp.float32)))

        return jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args)

    def test_grads_match_reference(self, rng):
        args = _make(rng)
        gf = self._grads(lambda *a: fused_mlp(*a, True), args)
        gr = self._grads(mlp_reference, args)
        # Tolerances are bf16-quantization-scale relative to the grad
        # magnitudes (the kernel keeps dgelu in f32 where the XLA reference
        # round-trips it through the bf16 activation cast).
        for name, a, b in zip(["du", "dw1", "db1", "dw2", "db2"], gf, gr):
            a, b = np.asarray(a), np.asarray(b)
            scale = max(np.abs(b).max(), 1.0)
            np.testing.assert_allclose(
                a / scale, b / scale, atol=2e-2,
                err_msg=f"grad mismatch for {name}",
            )

    def test_grads_accumulate_over_blocks(self, rng):
        """Token + hidden blocking must not change the weight grads."""
        from edrl_tpu.kernels import fused_mlp as mod

        args = _make(rng, m=48, c=8, h=32)
        g_plain = self._grads(lambda *a: fused_mlp(*a, True), args)
        origs = (mod._pick_block, mod._hidden_block)
        mod._pick_block = lambda total, target: min(total, 16)
        mod._hidden_block = lambda c, h, budget_bytes=0: h // 2
        try:
            g_block = self._grads(lambda *a: fused_mlp(*a, True), args)
        finally:
            mod._pick_block, mod._hidden_block = origs
        for name, a, b in zip(["du", "dw1", "db1", "dw2", "db2"], g_block, g_plain):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-2, rtol=2e-2,
                err_msg=f"blocked grad mismatch for {name}",
            )


class TestModuleIntegration:
    def test_fused_mlp_module_matches_unfused(self, rng):
        """Mlp(use_fused) == the Dense path with transplanted params."""
        from edrl_tpu.models.layers import Mlp

        x = jnp.asarray(rng.normal(size=(2, 24, 128)).astype(np.float32))
        fused = Mlp(hidden_dim=256, out_dim=128, use_fused=True)
        plain = Mlp(hidden_dim=256, out_dim=128, use_fused=False)
        pf = fused.init(jax.random.key(0), x)
        # Transplant fused params into the Dense layout.
        pp = {
            "params": {
                "Dense_0": {
                    "kernel": pf["params"]["w1"],
                    "bias": pf["params"]["b1"],
                },
                "Dense_1": {
                    "kernel": pf["params"]["w2"],
                    "bias": pf["params"]["b2"],
                },
            }
        }
        out_f = fused.apply(pf, x)
        out_p = plain.apply(pp, x)
        np.testing.assert_allclose(
            np.asarray(out_f), np.asarray(out_p), atol=2e-2, rtol=1e-2
        )

    def test_dropout_falls_back(self, rng):
        """dropout > 0 must use the (stochastic-capable) Dense path."""
        from edrl_tpu.models.layers import Mlp

        x = jnp.asarray(rng.normal(size=(2, 8, 128)).astype(np.float32))
        m = Mlp(hidden_dim=256, out_dim=128, dropout=0.1, use_fused=True)
        params = m.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)}, x
        )
        assert "Dense_0" in params["params"], "dropout>0 must take Dense path"
