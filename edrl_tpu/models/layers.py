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


class Mlp(nn.Module):
    """Transformer MLP block: Linear -> act -> drop -> Linear -> drop."""

    hidden_dim: int
    out_dim: int
    dropout: float = 0.0
    act: Callable = nn.gelu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
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
            y = nn.Dense(self.dim, use_bias=self.qkv_bias, dtype=self.dtype, name=name)(x)
            b, n = y.shape[0], y.shape[1]
            return y.reshape(b, n, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        q = proj("q", q_in)
        k = proj("k", k_in)
        v = proj("v", v_in)
        fusable = (
            self.use_fused
            and q.shape[2] == k.shape[2]
            and q.shape[2] % 8 == 0
        )
        if fusable:
            from edrl_tpu.kernels.window_attention import window_attention_fused

            b, h, n, d = q.shape
            bias = jnp.zeros((1, h, n, n), jnp.float32)
            interpret = jax.default_backend() == "cpu"
            out = window_attention_fused(
                (q * scale)[:, None], k[:, None], v[:, None], bias, interpret
            )[:, 0]
        else:
            out = scaled_dot_attention(q, k, v, scale)
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
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = MultiHeadAttention(
            self.dim,
            self.num_heads,
            dropout=self.dropout,
            use_fused=self.use_fused_attention,
            dtype=self.dtype,
        )(h, h, h, deterministic=deterministic)
        x = x + h
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = Mlp(
            int(self.dim * self.mlp_ratio),
            self.dim,
            dropout=self.dropout,
            dtype=self.dtype,
        )(h, deterministic=deterministic)
        return x + h
