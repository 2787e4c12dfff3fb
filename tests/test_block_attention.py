"""v4 fused attention-sublayer kernel: forward + custom-VJP exactness
against the XLA reference composition (interpret mode, f32)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edrl_tpu.kernels.block_attention import (
    attention_sublayer_fused,
    attention_sublayer_reference,
)


def _inputs(rng, b=2, w=2, n=16, c=32, heads=2, wb=None):
    wb = w if wb is None else wb
    x = jnp.asarray(rng.normal(size=(b, w, n, c)).astype(np.float32))
    gamma = jnp.asarray(1.0 + 0.1 * rng.normal(size=(c,)).astype(np.float32))
    beta = jnp.asarray(0.1 * rng.normal(size=(c,)).astype(np.float32))
    wqkv = jnp.asarray(rng.normal(size=(c, 3 * c)).astype(np.float32) * 0.05)
    bqkv = jnp.asarray(rng.normal(size=(3 * c,)).astype(np.float32) * 0.05)
    wproj = jnp.asarray(rng.normal(size=(c, c)).astype(np.float32) * 0.05)
    bproj = jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.05)
    bias = jnp.asarray(rng.normal(size=(wb, heads, n, n)).astype(np.float32))
    return x, gamma, beta, wqkv, bqkv, wproj, bproj, bias


class TestForward:
    @pytest.mark.parametrize("wb", [None, 1])
    def test_matches_reference(self, rng, wb):
        args = _inputs(rng, wb=wb)
        heads, scale = 2, 0.25
        got = attention_sublayer_fused(*args, heads, scale, True)
        want = attention_sublayer_reference(*args, heads, scale)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
        )

    def test_single_head_w1(self, rng):
        args = _inputs(rng, b=4, w=1, n=8, c=16, heads=1, wb=1)
        got = attention_sublayer_fused(*args, 1, 0.5, True)
        want = attention_sublayer_reference(*args, 1, 0.5)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
        )


class TestBackboneIntegration:
    """The use_fused_block_attention flag must compute the same function as
    the unfused path — verified by remapping the unfused params into the
    fused layout (the flag changes the param tree, like use_fused_mlp)."""

    def _remap_swin_block(self, blk):
        """SwinBlock unfused params -> fused-layout params."""
        out = {k: v for k, v in blk.items()
               if k not in ("LayerNorm_0", "WindowAttention_0")}
        wa = blk["WindowAttention_0"]
        out["ln1_scale"] = blk["LayerNorm_0"]["scale"]
        out["ln1_bias"] = blk["LayerNorm_0"]["bias"]
        out["qkv_kernel"] = wa["qkv"]["kernel"]
        out["qkv_bias"] = wa["qkv"]["bias"]
        out["proj_kernel"] = wa["proj"]["kernel"]
        out["proj_bias"] = wa["proj"]["bias"]
        out["rel_bias_table"] = wa["rel_bias_table"]
        return out

    def test_swin_fused_block_matches_unfused(self, rng):
        from edrl_tpu.models.swin2d import SwinTransformer2D

        kw = dict(
            img_size=32, patch_size=4, embed_dim=32, depths=(2, 1),
            num_heads=(2, 4), window=4, dtype=jnp.float32,
            remat_attention=False,
        )
        x = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)).astype(np.float32))
        m_ref = SwinTransformer2D(**kw)
        v_ref = m_ref.init(jax.random.key(0), x)
        tokens_ref, pooled_ref = m_ref.apply(v_ref, x)

        params = jax.tree_util.tree_map(lambda a: a, v_ref["params"])
        params = dict(params)
        for name in list(params):
            if name.startswith("SwinBlock_"):
                params[name] = self._remap_swin_block(dict(params[name]))
        m_fused = SwinTransformer2D(**kw, use_fused_block_attention=True)
        tokens_f, pooled_f = m_fused.apply({"params": params}, x)
        np.testing.assert_allclose(
            np.asarray(tokens_f), np.asarray(tokens_ref), rtol=2e-4, atol=2e-5
        )

    def test_vit3d_fused_block_matches_unfused(self, rng):
        from edrl_tpu.models.vit3d import ViT3D

        kw = dict(
            volume_size=16, patch_size=8, dim=32, depth=2, num_heads=2,
            dtype=jnp.float32,
        )
        x = jnp.asarray(
            rng.uniform(size=(2, 16, 16, 16, 1)).astype(np.float32)
        )
        m_ref = ViT3D(**kw)
        v_ref = m_ref.init(jax.random.key(0), x)
        tokens_ref, _ = m_ref.apply(v_ref, x)

        params = dict(v_ref["params"])
        for name in list(params):
            if name.startswith("SelfAttentionBlock_"):
                blk = dict(params[name])
                att = blk.pop("MultiHeadAttention_0")
                ln0 = blk.pop("LayerNorm_0")
                blk["ln1_scale"] = ln0["scale"]
                blk["ln1_bias"] = ln0["bias"]
                blk["qkv_kernel"] = jnp.concatenate(
                    [att["q"]["kernel"], att["k"]["kernel"], att["v"]["kernel"]],
                    axis=1,
                )
                blk["qkv_bias"] = jnp.concatenate(
                    [att["q"]["bias"], att["k"]["bias"], att["v"]["bias"]]
                )
                blk["proj_kernel"] = att["proj"]["kernel"]
                blk["proj_bias"] = att["proj"]["bias"]
                params[name] = blk
        m_fused = ViT3D(**kw, use_fused_block_attention=True)
        tokens_f, _ = m_fused.apply({"params": params}, x)
        np.testing.assert_allclose(
            np.asarray(tokens_f), np.asarray(tokens_ref), rtol=2e-4, atol=2e-5
        )


class TestStaticBranchSelection:
    def test_dropout_keeps_param_layout_consistent_train_vs_eval(self, rng):
        """With dropout>0 the fused flag must be ignored STATICALLY: the
        param layout created by a train-mode init (deterministic=False) must
        be the exact layout an eval-mode apply requests.  Regression for the
        former `or deterministic` gate, which made eval request fused params
        that train-mode init never created."""
        from edrl_tpu.models.layers import SelfAttentionBlock

        m = SelfAttentionBlock(
            dim=32, num_heads=2, dropout=0.1, use_fused_block_attention=True,
            dtype=jnp.float32,
        )
        x = jnp.asarray(rng.normal(size=(2, 16, 32)).astype(np.float32))
        variables = m.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            x, deterministic=False,
        )
        assert "LayerNorm_0" in variables["params"]  # unfused layout
        y = m.apply(variables, x, deterministic=True)  # must not raise
        assert y.shape == x.shape


class TestCustomVJP:
    @pytest.mark.parametrize("wb", [None, 1])
    def test_grads_match_reference_autodiff(self, rng, wb):
        args = _inputs(rng, wb=wb)
        heads, scale = 2, 0.25
        key = jax.random.key(0)
        ct = jax.random.normal(key, args[0].shape, jnp.float32)

        def loss_fused(*a):
            return jnp.sum(attention_sublayer_fused(*a, heads, scale, True) * ct)

        def loss_ref(*a):
            return jnp.sum(attention_sublayer_reference(*a, heads, scale) * ct)

        g_fused = jax.grad(loss_fused, argnums=tuple(range(8)))(*args)
        g_ref = jax.grad(loss_ref, argnums=tuple(range(8)))(*args)
        names = ["x", "gamma", "beta", "wqkv", "bqkv", "wproj", "bproj", "bias"]
        for name, gf, gr in zip(names, g_fused, g_ref):
            np.testing.assert_allclose(
                np.asarray(gf), np.asarray(gr), rtol=5e-4, atol=5e-5,
                err_msg=f"grad mismatch for {name}",
            )

    def test_mixed_precision_cotangent_dtypes_follow_primals(self, rng):
        """bf16 weights + f32 LN/bias params (the flagship's bf16 layout):
        every cotangent must carry its PRIMAL's dtype — in particular the
        bias grads must stay f32, not inherit the weights' bf16 (which would
        silently quantize an f32 param's gradient to 8 mantissa bits)."""
        x, gamma, beta, wqkv, bqkv, wproj, bproj, bias = _inputs(rng)
        bf16 = jnp.bfloat16
        args = (
            x.astype(bf16), gamma, beta, wqkv.astype(bf16), bqkv,
            wproj.astype(bf16), bproj, bias,
        )

        def loss(*a):
            y = attention_sublayer_fused(*a, 2, 0.25, True)
            return jnp.sum(y.astype(jnp.float32))

        grads = jax.grad(loss, argnums=tuple(range(8)))(*args)
        names = ["x", "gamma", "beta", "wqkv", "bqkv", "wproj", "bproj", "bias"]
        for name, g, primal in zip(names, grads, args):
            assert g.dtype == primal.dtype, (
                f"{name}: grad dtype {g.dtype} != primal dtype {primal.dtype}"
            )
