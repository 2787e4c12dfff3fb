"""Shared flax.linen building blocks.

TPU-first conventions used across all models in this package:

- computation dtype is configurable (bfloat16 by default on TPU) while
  parameters and softmax/reduction accumulations stay float32;
- every matmul specifies its accumulation dtype so the MXU runs bf16 inputs
  with f32 accumulation;
- shapes are static everywhere — no data-dependent Python control flow.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class FusedLayerNorm(nn.Module):
    """LayerNorm over the last axis, routed through the Pallas kernel.

    Owns ``scale``/``bias`` directly (same param names as ``nn.LayerNorm``,
    so parameter trees are layout-compatible with the plain module) and
    computes statistics in f32 on both paths.  ``use_fused=False`` or a
    non-128-multiple feature dim takes the XLA reference path.
    """

    dtype: Dtype = jnp.float32
    epsilon: float = 1e-6
    use_fused: bool = False

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        from edrl_tpu.kernels.layer_norm import (
            fused_layer_norm,
            layer_norm_reference,
        )

        x = x.astype(self.dtype)
        if not (self.use_fused and c % 128 == 0):
            return layer_norm_reference(x, scale, bias, self.epsilon)
        interpret = jax.default_backend() == "cpu"
        y = fused_layer_norm(x.reshape(-1, c), scale, bias, self.epsilon, interpret)
        return y.reshape(x.shape)


class Mlp(nn.Module):
    """Transformer MLP block: Linear -> act -> drop -> Linear -> drop.

    ``use_fused`` routes through the Pallas fused-MLP kernel (hidden
    activation VMEM-resident — the step is HBM-bound, so skipping the
    ``[M, H]`` round-trips is the win).  Requires gelu, no dropout, and
    ``out_dim == in_dim``; falls back to the XLA path otherwise.  The fused
    path owns its params (``w1/b1/w2/b2``) with the same initializers as
    ``nn.Dense``.
    """

    hidden_dim: int
    out_dim: int
    dropout: float = 0.0
    act: Callable = nn.gelu
    dtype: Dtype = jnp.float32
    use_fused: bool = False

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        fusable = (
            self.use_fused
            and self.dropout == 0.0
            and self.act is nn.gelu
            and x.shape[-1] == self.out_dim
            and x.shape[-1] % 128 == 0
            and self.hidden_dim % 128 == 0
        )
        if fusable:
            from edrl_tpu.kernels.fused_mlp import fused_mlp

            c = x.shape[-1]
            w1 = self.param(
                "w1", nn.initializers.lecun_normal(), (c, self.hidden_dim)
            )
            b1 = self.param("b1", nn.initializers.zeros, (self.hidden_dim,))
            w2 = self.param(
                "w2", nn.initializers.lecun_normal(), (self.hidden_dim, c)
            )
            b2 = self.param("b2", nn.initializers.zeros, (c,))
            tokens = x.astype(self.dtype).reshape(-1, c)
            interpret = jax.default_backend() == "cpu"
            y = fused_mlp(tokens, w1, b1, w2, b2, interpret)
            return y.reshape(x.shape)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype)(x)
        x = self.act(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.out_dim, dtype=self.dtype)(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


def scaled_dot_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float,
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    """Attention core: softmax in float32, matmuls with f32 accumulation.

    q, k, v: ``[..., heads, tokens, head_dim]``.
    """
    attn = jnp.einsum("...hqd,...hkd->...hqk", q, k, preferred_element_type=jnp.float32)
    attn = attn * scale
    if bias is not None:
        attn = attn + bias
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("...hqk,...hkd->...hqd", attn, v, preferred_element_type=jnp.float32).astype(q.dtype)


class MultiHeadAttention(nn.Module):
    """Q/KV multi-head attention with separate query and key/value inputs.

    Generalizes the reference's ``MIAttention`` (``fusion_net.py:258-285``,
    self-attention when ``q is kv``) and the ``nn.MultiheadAttention`` inside
    ``AttentionModel`` (``fusion_net.py:550-578``).

    ``use_fused``: route through the Pallas fused attention kernel (scores
    VMEM-resident); requires equal, 8-aligned query/key token counts.
    """

    dim: int
    num_heads: int
    qkv_bias: bool = True
    dropout: float = 0.0
    use_fused: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q_in, k_in, v_in, *, deterministic: bool = True):
        head_dim = self.dim // self.num_heads
        scale = head_dim**-0.5

        def proj(name, x):
            from edrl_tpu.parallel.mesh import batch_constraint

            # Anchor the projection (and its cotangent) to batch-over-'data'
            # sharding: under TP the q/k/v Dense kernels are column-sharded,
            # so their outputs arrive channel-sharded, and the head-split
            # reshape/transpose below would otherwise hit the partitioner's
            # "Involuntary full rematerialization" last resort (same failure
            # mode as the r4 MedFusion-flatten fix; observed on the DILR
            # attention blocks in the r5 dryrun stderr).  No-op without a
            # mesh context.
            return batch_constraint(
                nn.Dense(
                    self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
                    name=name,
                )(x)
            )

        q = proj("q", q_in)  # [B, Nq, C], heads packed in columns
        k = proj("k", k_in)
        v = proj("v", v_in)
        fusable = (
            self.use_fused
            and q.shape[1] == k.shape[1]
            and q.shape[1] % 8 == 0
        )
        if fusable:
            # Transpose-free: the v3 kernel reads per-head column blocks
            # straight out of the Dense outputs and writes [B, N, C].
            from edrl_tpu.kernels.window_attention import self_attention_fused

            interpret = jax.default_backend() == "cpu"
            out = self_attention_fused(q, k, v, self.num_heads, scale, interpret)
        else:
            def split(y):
                b, n = y.shape[0], y.shape[1]
                return y.reshape(b, n, self.num_heads, head_dim).transpose(
                    0, 2, 1, 3
                )

            out = scaled_dot_attention(split(q), split(k), split(v), scale)
            b, _, n, _ = out.shape
            out = out.transpose(0, 2, 1, 3).reshape(b, n, self.dim)
        out = nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out


class SelfAttentionBlock(nn.Module):
    """Pre-LN transformer encoder block (attention + MLP with residuals)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    use_fused_attention: bool = False
    use_fused_mlp: bool = False
    use_fused_ln: bool = False
    use_fused_block_attention: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        # The branch must be STATIC (config-only): gating on `deterministic`
        # would make train-time init create the unfused param layout while an
        # eval apply requests the fused params (ScopeParamNotFoundError).
        # With dropout>0 both modes therefore take the unfused path.
        if self.use_fused_block_attention and self.dropout == 0.0:
            # v4: LN + qkv + attention + proj + residual in one Pallas
            # program (kernels/block_attention.py); W=1, bias-free (zeros).
            from edrl_tpu.kernels.block_attention import (
                attention_sublayer_fused,
            )

            n = x.shape[1]
            init = nn.initializers.lecun_normal()
            gamma = self.param("ln1_scale", nn.initializers.ones, (self.dim,))
            beta = self.param("ln1_bias", nn.initializers.zeros, (self.dim,))
            wqkv = self.param("qkv_kernel", init, (self.dim, 3 * self.dim))
            bqkv = self.param(
                "qkv_bias", nn.initializers.zeros, (3 * self.dim,)
            )
            wproj = self.param("proj_kernel", init, (self.dim, self.dim))
            bproj = self.param("proj_bias", nn.initializers.zeros, (self.dim,))
            scale = (self.dim // self.num_heads) ** -0.5
            interpret = jax.default_backend() == "cpu"
            x = attention_sublayer_fused(
                x[:, None].astype(self.dtype),
                gamma,
                beta,
                wqkv.astype(self.dtype),
                bqkv,
                wproj.astype(self.dtype),
                bproj,
                jnp.zeros((1, self.num_heads, n, n), jnp.float32),
                self.num_heads,
                scale,
                interpret,
            )[:, 0]
        else:
            h = FusedLayerNorm(
                dtype=self.dtype, use_fused=self.use_fused_ln, name="LayerNorm_0"
            )(x)
            h = MultiHeadAttention(
                self.dim,
                self.num_heads,
                dropout=self.dropout,
                use_fused=self.use_fused_attention,
                dtype=self.dtype,
            )(h, h, h, deterministic=deterministic)
            x = x + h
        h = FusedLayerNorm(
            dtype=self.dtype, use_fused=self.use_fused_ln, name="LayerNorm_1"
        )(x)
        h = Mlp(
            int(self.dim * self.mlp_ratio),
            self.dim,
            dropout=self.dropout,
            dtype=self.dtype,
            use_fused=self.use_fused_mlp,
        )(h, deterministic=deterministic)
        return x + h
