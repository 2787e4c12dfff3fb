"""Fused LayerNorm Pallas kernel: value + gradient parity vs references."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from edrl_tpu.kernels.layer_norm import fused_layer_norm, layer_norm_reference


def _make(rng, m=32, c=16, dtype=jnp.float32):
    x = jnp.asarray(rng.normal(size=(m, c)).astype(np.float32) * 2.0 + 0.5, dtype)
    g = jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.5 + 1.0)
    b = jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.2)
    return x, g, b


class TestForward:
    def test_matches_reference(self, rng):
        x, g, b = _make(rng)
        got = fused_layer_norm(x, g, b, 1e-6, True)
        want = layer_norm_reference(x, g, b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_matches_flax_layernorm(self, rng):
        """Same params -> same output as nn.LayerNorm (f32 stats path)."""
        x, g, b = _make(rng, m=24, c=32)
        got = fused_layer_norm(x, g, b, 1e-6, True)
        ln = nn.LayerNorm(epsilon=1e-6)
        want = ln.apply({"params": {"scale": g, "bias": b}}, x)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4
        )

    def test_bf16_io(self, rng):
        x, g, b = _make(rng, dtype=jnp.bfloat16)
        got = fused_layer_norm(x, g, b, 1e-6, True)
        assert got.dtype == jnp.bfloat16
        want = layer_norm_reference(x, g, b)
        np.testing.assert_allclose(
            np.asarray(got, np.float32),
            np.asarray(want, np.float32),
            atol=2e-2,
        )

    def test_token_blocking(self, rng):
        from edrl_tpu.kernels import layer_norm as mod

        x, g, b = _make(rng, m=64, c=8)
        orig = mod._pick_block
        mod._pick_block = lambda total, target: min(total, 16)
        try:
            got = fused_layer_norm(x, g, b, 1e-6, True)
        finally:
            mod._pick_block = orig
        want = layer_norm_reference(x, g, b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


class TestBackward:
    def _grads(self, fn, args):
        def loss(*a):
            out = fn(*a).astype(jnp.float32)
            # Non-uniform cotangent exercises every term of the VJP.
            w = jnp.arange(out.size, dtype=jnp.float32).reshape(out.shape)
            return jnp.sum(out * w * 1e-2)

        return jax.grad(loss, argnums=(0, 1, 2))(*args)

    def test_grads_match_reference(self, rng):
        args = _make(rng)
        gf = self._grads(lambda *a: fused_layer_norm(*a, 1e-6, True), args)
        gr = self._grads(lambda *a: layer_norm_reference(*a, 1e-6), args)
        for name, a, b in zip(["dx", "dgamma", "dbeta"], gf, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4,
                err_msg=f"grad mismatch for {name}",
            )

    def test_grads_accumulate_over_blocks(self, rng):
        """Token blocking must not change dgamma/dbeta (grid accumulation)."""
        from edrl_tpu.kernels import layer_norm as mod

        args = _make(rng, m=48, c=8)
        g_plain = self._grads(lambda *a: fused_layer_norm(*a, 1e-6, True), args)
        orig = mod._pick_block
        mod._pick_block = lambda total, target: min(total, 16)
        try:
            g_block = self._grads(
                lambda *a: fused_layer_norm(*a, 1e-6, True), args
            )
        finally:
            mod._pick_block = orig
        for name, a, b in zip(["dx", "dgamma", "dbeta"], g_block, g_plain):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5,
                err_msg=f"blocked grad mismatch for {name}",
            )


class TestModuleIntegration:
    def test_module_fused_matches_unfused(self, rng):
        """FusedLayerNorm(use_fused) == its XLA path with the same params."""
        from edrl_tpu.models.layers import FusedLayerNorm

        x = jnp.asarray(rng.normal(size=(2, 24, 128)).astype(np.float32))
        fused = FusedLayerNorm(use_fused=True)
        plain = FusedLayerNorm(use_fused=False)
        params = fused.init(jax.random.key(0), x)
        out_f = fused.apply(params, x)
        out_p = plain.apply(params, x)
        np.testing.assert_allclose(
            np.asarray(out_f), np.asarray(out_p), atol=1e-5
        )

    def test_param_tree_matches_nn_layernorm(self, rng):
        """Same param names/shapes as nn.LayerNorm (checkpoint-compatible)."""
        from edrl_tpu.models.layers import FusedLayerNorm

        x = jnp.asarray(rng.normal(size=(2, 8, 16)).astype(np.float32))
        pf = FusedLayerNorm(use_fused=False).init(jax.random.key(0), x)
        pl_ = nn.LayerNorm().init(jax.random.key(0), x)
        assert jax.tree_util.tree_structure(pf) == jax.tree_util.tree_structure(
            pl_
        )
        out_f = FusedLayerNorm(use_fused=False).apply(pl_, x)
        out_l = nn.LayerNorm().apply(pl_, x)
        np.testing.assert_allclose(
            np.asarray(out_f), np.asarray(out_l), atol=1e-5, rtol=1e-5
        )

    def test_bf16_default_path_matches_flax_bf16(self, rng):
        """FusedLayerNorm(use_fused=False, dtype=bf16) vs nn.LayerNorm
        (dtype=bf16): the repo path applies scale/bias in f32 and casts
        once, flax applies them in bf16 — a deliberate (slightly more
        precise) choice; this pins the divergence to bf16 rounding order
        (ADVICE r2 #3)."""
        from edrl_tpu.models.layers import FusedLayerNorm

        x = jnp.asarray(
            rng.normal(size=(4, 24, 64)).astype(np.float32), jnp.bfloat16
        )
        params = nn.LayerNorm(epsilon=1e-6, dtype=jnp.bfloat16).init(
            jax.random.key(0), x
        )
        want = nn.LayerNorm(epsilon=1e-6, dtype=jnp.bfloat16).apply(params, x)
        got = FusedLayerNorm(use_fused=False, dtype=jnp.bfloat16).apply(
            params, x
        )
        assert got.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(got, np.float32),
            np.asarray(want, np.float32),
            atol=2e-2,  # one bf16 ulp of the scale/bias application order
            rtol=2e-2,
        )

    def test_non_128_feature_dim_falls_back(self, rng):
        """c % 128 != 0 must take the XLA path (no pallas lane padding)."""
        from edrl_tpu.models.layers import FusedLayerNorm

        x = jnp.asarray(rng.normal(size=(2, 8, 48)).astype(np.float32))
        m = FusedLayerNorm(use_fused=True)
        params = m.init(jax.random.key(0), x)
        out = m.apply(params, x)
        want = nn.LayerNorm(epsilon=1e-6).apply(params, x)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(want), atol=1e-4, rtol=1e-4
        )
