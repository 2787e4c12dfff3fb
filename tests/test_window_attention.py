"""Fused window attention kernel: value + gradient parity vs XLA reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edrl_tpu.kernels.window_attention import (
    window_attention_fused,
    window_attention_reference,
)


@pytest.fixture
def inputs(rng):
    B, W, H, N, D = 2, 4, 2, 16, 8
    q = jnp.asarray(rng.normal(size=(B, W, H, N, D)).astype(np.float32)) * 0.2
    k = jnp.asarray(rng.normal(size=(B, W, H, N, D)).astype(np.float32)) * 0.2
    v = jnp.asarray(rng.normal(size=(B, W, H, N, D)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(W, H, N, N)).astype(np.float32)) * 0.1
    return q, k, v, bias


class TestForward:
    def test_matches_reference(self, inputs):
        q, k, v, bias = inputs
        got = window_attention_fused(q, k, v, bias, True)
        want = window_attention_reference(q, k, v, bias)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_with_shift_mask_semantics(self, inputs):
        """-1e9 bias entries zero the corresponding attention weights."""
        q, k, v, bias = inputs
        bias = bias.at[:, :, :, 0].set(-1e9)  # no one attends to key 0
        got = np.asarray(window_attention_fused(q, k, v, bias, True))
        # output = weighted sum excluding v[..., 0, :]
        want = np.asarray(window_attention_reference(q, k, v, bias))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_bf16_io(self, inputs):
        q, k, v, bias = inputs
        qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
        got = window_attention_fused(qb, kb, vb, bias, True)
        assert got.dtype == jnp.bfloat16
        want = window_attention_reference(qb, kb, vb, bias)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32), atol=3e-2
        )


class TestBackward:
    def test_grads_match_reference(self, inputs):
        q, k, v, bias = inputs

        def loss_fused(q, k, v, bias):
            return jnp.sum(jnp.square(window_attention_fused(q, k, v, bias, True)))

        def loss_ref(q, k, v, bias):
            return jnp.sum(jnp.square(window_attention_reference(q, k, v, bias)))

        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, bias)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
        for name, a, b in zip("qkvb", g_fused, g_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3,
                err_msg=f"grad mismatch for {name}",
            )

    def test_dbias_accumulates_over_batch(self, rng):
        """dbias must sum over the batch dimension (W=1 case isolates it)."""
        B, W, H, N, D = 3, 1, 1, 8, 8
        q = jnp.asarray(rng.normal(size=(B, W, H, N, D)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(B, W, H, N, D)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(B, W, H, N, D)).astype(np.float32))
        bias = jnp.zeros((W, H, N, N), jnp.float32)

        g_full = jax.grad(
            lambda b: jnp.sum(window_attention_fused(q, k, v, b, True)), 0
        )(bias)
        g_sum = sum(
            jax.grad(
                lambda b, i=i: jnp.sum(
                    window_attention_fused(q[i : i + 1], k[i : i + 1], v[i : i + 1], b, True)
                ),
                0,
            )(bias)
            for i in range(B)
        )
        np.testing.assert_allclose(np.asarray(g_full), np.asarray(g_sum), atol=1e-4)


class TestV2TransposeFree:
    def _pack(self, q, k, v, scale):
        """[B,W,H,N,D] triple -> packed [B,W,N,3C] with [3,H,D] column order."""
        B, W, H, N, D = q.shape

        def flat(x):
            return x.transpose(0, 1, 3, 2, 4).reshape(B, W, N, H * D)

        return np.concatenate([flat(q / scale), flat(k), flat(v)], axis=-1)

    def test_matches_reference(self, inputs):
        from edrl_tpu.kernels.window_attention import window_attention_fused_v2

        q, k, v, bias = inputs
        B, W, H, N, D = q.shape
        scale = 0.7
        qkv = jnp.asarray(self._pack(np.asarray(q), np.asarray(k), np.asarray(v), 1.0))
        got = window_attention_fused_v2(qkv, bias, H, scale, True)
        want = window_attention_reference(q * scale, k, v, bias)
        want = np.asarray(want).transpose(0, 1, 3, 2, 4).reshape(B, W, N, H * D)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_grads_match_reference(self, inputs):
        from edrl_tpu.kernels.window_attention import window_attention_fused_v2

        q, k, v, bias = inputs
        B, W, H, N, D = q.shape
        scale = 0.5
        qkv = jnp.asarray(self._pack(np.asarray(q), np.asarray(k), np.asarray(v), 1.0))

        def loss_v2(qkv, bias):
            return jnp.sum(jnp.square(window_attention_fused_v2(qkv, bias, H, scale, True)))

        def loss_ref(qkv, bias):
            c = H * D
            def unflat(x):
                return x.reshape(B, W, N, H, D).transpose(0, 1, 3, 2, 4)
            qq = unflat(qkv[..., :c]) * scale
            kk = unflat(qkv[..., c : 2 * c])
            vv = unflat(qkv[..., 2 * c :])
            return jnp.sum(jnp.square(window_attention_reference(qq, kk, vv, bias)))

        g2 = jax.grad(loss_v2, argnums=(0, 1))(qkv, bias)
        gr = jax.grad(loss_ref, argnums=(0, 1))(qkv, bias)
        np.testing.assert_allclose(np.asarray(g2[0]), np.asarray(gr[0]), atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(g2[1]), np.asarray(gr[1]), atol=2e-4, rtol=1e-3)


class TestV3SelfAttention:
    """v3: bias-free fused self-attention on [B, N, C] column-packed heads."""

    def _make(self, rng, B=4, H=2, N=16, D=8):
        q = rng.normal(size=(B, N, H * D)).astype(np.float32) * 0.3
        k = rng.normal(size=(B, N, H * D)).astype(np.float32) * 0.3
        v = rng.normal(size=(B, N, H * D)).astype(np.float32)
        return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), H, D

    @staticmethod
    def _reference(q, k, v, num_heads, scale):
        from edrl_tpu.models.layers import scaled_dot_attention

        b, n, c = q.shape
        d = c // num_heads

        def split(x):
            return x.reshape(b, n, num_heads, d).transpose(0, 2, 1, 3)

        out = scaled_dot_attention(split(q), split(k), split(v), scale)
        return out.transpose(0, 2, 1, 3).reshape(b, n, c)

    def test_matches_reference(self, rng):
        from edrl_tpu.kernels.window_attention import self_attention_fused

        q, k, v, H, D = self._make(rng)
        scale = D**-0.5
        got = self_attention_fused(q, k, v, H, scale, True)
        want = self._reference(q, k, v, H, scale)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_odd_batch_no_blocking(self, rng):
        from edrl_tpu.kernels.window_attention import self_attention_fused

        q, k, v, H, D = self._make(rng, B=3)
        scale = D**-0.5
        got = self_attention_fused(q, k, v, H, scale, True)
        want = self._reference(q, k, v, H, scale)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_grads_match_reference(self, rng):
        from edrl_tpu.kernels.window_attention import self_attention_fused

        q, k, v, H, D = self._make(rng)
        scale = 0.4

        def loss_fused(q, k, v):
            return jnp.sum(jnp.square(self_attention_fused(q, k, v, H, scale, True)))

        def loss_ref(q, k, v):
            return jnp.sum(jnp.square(self._reference(q, k, v, H, scale)))

        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for name, a, b in zip("qkv", gf, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3,
                err_msg=f"grad mismatch for {name}",
            )

    def test_bf16_io(self, rng):
        from edrl_tpu.kernels.window_attention import self_attention_fused

        q, k, v, H, D = self._make(rng)
        scale = D**-0.5
        qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
        got = self_attention_fused(qb, kb, vb, H, scale, True)
        assert got.dtype == jnp.bfloat16
        want = self._reference(q, k, v, H, scale)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want), atol=3e-2
        )

    def test_multihead_attention_fused_matches_unfused(self, rng):
        """MultiHeadAttention(use_fused) == the XLA path, same params."""
        import flax.linen as nn_

        from edrl_tpu.models.layers import MultiHeadAttention

        x = jnp.asarray(rng.normal(size=(2, 16, 32)).astype(np.float32))
        fused = MultiHeadAttention(dim=32, num_heads=4, use_fused=True)
        plain = MultiHeadAttention(dim=32, num_heads=4, use_fused=False)
        params = plain.init(jax.random.key(0), x, x, x)
        out_f = fused.apply(params, x, x, x)
        out_p = plain.apply(params, x, x, x)
        np.testing.assert_allclose(
            np.asarray(out_f), np.asarray(out_p), atol=1e-5
        )
