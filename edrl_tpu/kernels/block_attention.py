"""Fused attention SUBLAYER kernel (v4): LN + qkv + window attention + proj
+ residual in one Pallas program.

Motivation (BASELINE.md roofline, 2026-08-17 trace): the stage-0/1 Swin
dense dots sit at their HBM roofline — their cost is the activation traffic
of the qkv/proj matmuls, not MXU time — and ~12 ms/step of LN/elementwise
round-trips remain even after XLA fusion.  The v2/v3 kernels fuse only the
``softmax(qk^T+bias)v`` core, which is sandwiched between Dense layers, so
"fold the LN/residual into the attention kernel" necessarily means
swallowing the qkv and proj matmuls too.  This kernel computes, per
(window, batch-block) program with ALL sublayer weights VMEM-resident
(their block index is constant across the grid, so they are fetched once):

    y = x + (softmax(LN(x) Wq (LN(x) Wk)^T * scale + bias) (LN(x) Wv)) Wp + bp

Forward HBM traffic per sublayer: read x, write (y, qkv, xln) — versus the
XLA+v2 path's LN round-trip, qkv write+read, attention-out write+read, and
proj output round-trip.  ``qkv`` and ``xln`` are emitted as by-products
(they are this sublayer's autodiff residuals, written once and only read in
the backward), so the backward can be composed from the existing v2
attention kernels plus LARGE XLA matmuls for the weight grads — the
in-kernel weight-grad accumulation that made the fused MLP a measured
negative (ModelConfig notes) is deliberately avoided.

Layout: x ``[B, W, N, C]`` (persistent windowed layout; W=1 serves the
plain ViT-3D self-attention), bias ``[Wb, H, N, N]`` f32 with Wb in
{1, W} (1 = no per-window shift mask, saves materializing the broadcast).
N must be a multiple of 8; C a multiple of 128.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from edrl_tpu.kernels.window_attention import (
    _v2_bwd as _v2_attn_bwd,
    _v2_fwd_call as _v2_attn_fwd,
)

_LN_EPS = 1e-6


def _block_attn_fwd_kernel(
    x_ref, gamma_ref, beta_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
    bias_ref, y_ref, qkv_ref, xln_ref, *, num_heads, scale, bb,
):
    gamma = gamma_ref[0].astype(jnp.float32)  # [C]
    beta = beta_ref[0].astype(jnp.float32)
    bqkv = bqkv_ref[0].astype(jnp.float32)  # [3C]
    bproj = bproj_ref[0].astype(jnp.float32)  # [C]
    c = gamma.shape[0]
    d = c // num_heads
    cdtype = x_ref.dtype if x_ref.dtype != jnp.float64 else jnp.float32
    for i in range(bb):
        x = x_ref[i, 0].astype(jnp.float32)  # [N, C]
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
        xln = (x - mu) * jax.lax.rsqrt(var + _LN_EPS) * gamma + beta
        xln_c = xln.astype(cdtype)
        qkv = jax.lax.dot_general(
            xln_c, wqkv_ref[...],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ) + bqkv  # [N, 3C] f32
        qkv_c = qkv.astype(cdtype)
        acc = bproj
        for h in range(num_heads):
            q = qkv[:, h * d:(h + 1) * d] * scale
            k = qkv[:, c + h * d:c + (h + 1) * d]
            v = qkv[:, 2 * c + h * d:2 * c + (h + 1) * d]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bias_ref[0, h].astype(jnp.float32)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) / l  # [N, D]
            acc = acc + jax.lax.dot_general(
                o.astype(cdtype), wproj_ref[h * d:(h + 1) * d, :],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )
        y_ref[i, 0] = (x + acc).astype(y_ref.dtype)
        qkv_ref[i, 0] = qkv_c
        xln_ref[i, 0] = xln_c


def _bb_for(b: int, c: int) -> int:
    """Batch block: weights are grid-resident, so bb only amortizes
    per-program overhead; keep VMEM in budget at large C (the resident
    wqkv+wproj alone are 16*C^2 bytes bf16 — 8.3 MB at C=1024)."""
    cap = 8 if c <= 256 else (2 if c <= 768 else 1)
    for bb in (cap, 4, 2):
        if bb <= cap and b % bb == 0:
            return bb
    return 1


def _x_spec(n, c, bb):
    return pl.BlockSpec(
        (bb, 1, n, c), lambda w, b: (b, w, 0, 0), memory_space=pltpu.VMEM
    )


def _vec_spec(c):
    return pl.BlockSpec((1, c), lambda w, b: (0, 0), memory_space=pltpu.VMEM)


def _w_spec(rows, cols):
    return pl.BlockSpec(
        (rows, cols), lambda w, b: (0, 0), memory_space=pltpu.VMEM
    )


def _bias_spec_v4(wb, h, n):
    # Wb == 1 -> every window reads the same (un-broadcast) bias block.
    if wb == 1:
        return pl.BlockSpec(
            (1, h, n, n), lambda w, b: (0, 0, 0, 0), memory_space=pltpu.VMEM
        )
    return pl.BlockSpec(
        (1, h, n, n), lambda w, b: (w, 0, 0, 0), memory_space=pltpu.VMEM
    )


def _v4_fwd_call(x, gamma, beta, wqkv, bqkv, wproj, bproj, bias,
                 num_heads, scale, interpret):
    B, W, N, C = x.shape
    Wb, H, _, _ = bias.shape
    bb = _bb_for(B, C)
    kernel = functools.partial(
        _block_attn_fwd_kernel, num_heads=num_heads, scale=scale, bb=bb
    )
    y, qkv, xln = pl.pallas_call(
        kernel,
        grid=(W, B // bb),
        in_specs=[
            _x_spec(N, C, bb),
            _vec_spec(C),  # gamma
            _vec_spec(C),  # beta
            _w_spec(C, 3 * C),
            _vec_spec(3 * C),
            _w_spec(C, C),
            _vec_spec(C),
            _bias_spec_v4(Wb, H, N),
        ],
        out_specs=(
            _x_spec(N, C, bb),
            _x_spec(N, 3 * C, bb),
            _x_spec(N, C, bb),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((B, W, N, 3 * C), x.dtype),
            jax.ShapeDtypeStruct(x.shape, x.dtype),
        ),
        interpret=interpret,
    )(x, gamma.reshape(1, -1), beta.reshape(1, -1), wqkv,
      bqkv.reshape(1, -1), wproj, bproj.reshape(1, -1), bias)
    return y, qkv, xln


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def attention_sublayer_fused(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    wqkv: jax.Array,
    bqkv: jax.Array,
    wproj: jax.Array,
    bproj: jax.Array,
    bias: jax.Array,
    num_heads: int,
    scale: float,
    interpret: bool = False,
) -> jax.Array:
    """``x + proj(window_attention(qkv(LN(x))))`` in one fused pass.

    x: ``[B, W, N, C]``; weights in x's compute dtype; bias
    ``[Wb, H, N, N]`` f32 (Wb = 1 or W).  Returns ``[B, W, N, C]``.
    """
    y, _, _ = _v4_fwd_call(
        x, gamma, beta, wqkv, bqkv, wproj, bproj, bias,
        num_heads, scale, interpret,
    )
    return y


def _v4_fwd(x, gamma, beta, wqkv, bqkv, wproj, bproj, bias,
            num_heads, scale, interpret):
    y, qkv, xln = _v4_fwd_call(
        x, gamma, beta, wqkv, bqkv, wproj, bproj, bias,
        num_heads, scale, interpret,
    )
    # bqkv/bproj are carried only for their dtypes: the bias cotangents must
    # match the bias primals (f32 params even in bf16 mode), not the weights'
    # dtype — casting an f32 bias grad to bf16 silently quantizes it.
    return y, (x, xln, qkv, gamma, wqkv, bqkv, wproj, bproj, bias)


def _v4_bwd(num_heads, scale, interpret, res, dy):
    """Backward = existing v2 attention kernels + large XLA matmuls.

    The weight grads are single big contractions over the whole (B, W, N)
    batch — exactly the shapes XLA runs at 73% of peak — instead of
    per-program accumulations (the fused-MLP failure mode).  The v2 entry
    points are the transpose-free column-block flavor, so the backward adds
    zero head-split layout copies."""
    x, xln, qkv, gamma, wqkv, bqkv, wproj, bproj, bias = res
    B, W, N, C = x.shape
    H = num_heads
    f32 = jnp.float32
    dy32 = dy.astype(f32)

    # Broadcast bias to the v2 kernels' [W, H, N, N] contract.
    bias_full = jnp.broadcast_to(bias, (W, H, N, N)) if bias.shape[0] == 1 else bias

    # Recompute the attention output (never materialized in the forward);
    # the v2 kernel reads per-head column blocks straight from qkv.
    o = _v2_attn_fwd(qkv, bias_full, H, scale, interpret)  # [B, W, N, C]

    dwproj = jnp.einsum(
        "bwnc,bwnk->ck", o.astype(f32), dy32, preferred_element_type=f32
    ).astype(wproj.dtype)
    dbproj = jnp.sum(dy32, axis=(0, 1, 2)).astype(bproj.dtype)
    do = jnp.einsum(
        "bwnk,ck->bwnc", dy, wproj, preferred_element_type=f32
    ).astype(dy.dtype)

    dqkv, dbias = _v2_attn_bwd(H, scale, interpret, (qkv, bias_full), do)
    dqkv = dqkv.astype(f32)  # [B, W, N, 3C]

    dwqkv = jnp.einsum(
        "bwnc,bwnk->ck", xln.astype(f32), dqkv, preferred_element_type=f32
    ).astype(wqkv.dtype)
    dbqkv = jnp.sum(dqkv, axis=(0, 1, 2)).astype(bqkv.dtype)
    dxln = jnp.einsum(
        "bwnk,ck->bwnc", dqkv, wqkv.astype(f32), preferred_element_type=f32
    )

    # LayerNorm backward from the saved input x (stats recomputed; the
    # gamma/beta application is inverted via xhat = (xln - beta) recompute).
    x32 = x.astype(f32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + _LN_EPS)
    xhat = (x32 - mu) * inv
    dgamma = jnp.sum(dxln * xhat, axis=(0, 1, 2)).astype(gamma.dtype)
    dbeta = jnp.sum(dxln, axis=(0, 1, 2)).astype(gamma.dtype)
    dxhat = dxln * gamma.astype(f32)
    dx_ln = inv * (
        dxhat
        - jnp.mean(dxhat, axis=-1, keepdims=True)
        - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    )
    dx = (dy32 + dx_ln).astype(x.dtype)

    dbias_out = (
        jnp.sum(dbias, axis=0, keepdims=True) if bias.shape[0] == 1 else dbias
    )
    return (dx, dgamma, dbeta, dwqkv, dbqkv, dwproj, dbproj, dbias_out)


attention_sublayer_fused.defvjp(_v4_fwd, _v4_bwd)


def attention_sublayer_reference(
    x, gamma, beta, wqkv, bqkv, wproj, bproj, bias, num_heads, scale
):
    """XLA reference composition (same math) for testing."""
    f32 = jnp.float32
    x32 = x.astype(f32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    xln = (x32 - mu) * jax.lax.rsqrt(var + _LN_EPS) * gamma.astype(f32) + beta.astype(f32)
    qkv = (
        jnp.einsum("bwnc,ck->bwnk", xln.astype(x.dtype), wqkv,
                   preferred_element_type=f32)
        + bqkv.astype(f32)
    )
    B, W, N, C3 = qkv.shape
    c = C3 // 3
    d = c // num_heads
    q = qkv[..., :c].reshape(B, W, N, num_heads, d).transpose(0, 1, 3, 2, 4)
    k = qkv[..., c:2 * c].reshape(B, W, N, num_heads, d).transpose(0, 1, 3, 2, 4)
    v = qkv[..., 2 * c:].reshape(B, W, N, num_heads, d).transpose(0, 1, 3, 2, 4)
    s = jnp.einsum(
        "bwhnd,bwhmd->bwhnm", q * scale, k, preferred_element_type=f32
    ) + jnp.broadcast_to(bias, (W, num_heads, N, N))[None]
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bwhnm,bwhmd->bwhnd", p, v, preferred_element_type=f32)
    o = o.transpose(0, 1, 3, 2, 4).reshape(B, W, N, c)
    y = x32 + jnp.einsum(
        "bwnc,ck->bwnk", o.astype(x.dtype), wproj, preferred_element_type=f32
    ) + bproj.astype(f32)
    return y.astype(x.dtype)
