"""Fused LayerNorm as a Pallas TPU kernel (forward + custom VJP).

Why: LayerNorm is pure HBM traffic, and the train-step trace shows ~10 ms
of a 108 ms step spent in LN passes (normalization.py reduce/convert/add
ops across 72 block LNs).  XLA lowers the forward as stats-reduce +
normalize (≥2 reads of ``x``) and the backward as 3-4 separate passes over
``x``/``dy``.  This kernel does one read + one write in the forward and one
read of (``x``, ``dy``) + one write of ``dx`` in the backward — the row
statistics are recomputed in-VMEM from the ``x`` block instead of being
round-tripped through HBM (VPU FLOPs are free below the bandwidth roofline).

Layout / blocking:
- ``x [M, C]`` tokens (bf16 or f32), ``gamma/beta [C]`` float32 params.
- grid ``(M/BM,)``; each program owns a ``[BM, C]`` block.  Row mean /
  rstd are computed per block in f32 (matching flax's f32 statistics).
- backward: ``dgamma/dbeta`` are resident ``[1, C]`` f32 output blocks with
  a constant index map, accumulated across the sequential token grid (the
  same pattern as ``fused_mlp``'s weight grads).

Numerics match ``flax.linen.LayerNorm(epsilon=1e-6)`` with f32 stats and
params; ``use_bias=True, use_scale=True`` semantics.

Reference analog: every ``nn.LayerNorm`` inside the reference's transformer
stacks (e.g. ``fusion_net.py`` encoder blocks); this is the TPU-native
execution of the same math.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _pick_block(total: int, target: int) -> int:
    b = min(total, target)
    while total % b != 0:
        b -= 1
    return b


def _row_stats(x, eps):
    mu = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=1, keepdims=True)
    return mu, jax.lax.rsqrt(var + eps)


def _fwd_kernel(x_ref, g_ref, b_ref, y_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)  # [BM, C]
    mu, rstd = _row_stats(x, eps)
    xhat = (x - mu) * rstd
    y = xhat * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    y_ref[...] = y.astype(y_ref.dtype)


def _bwd_kernel(x_ref, dy_ref, g_ref, dx_ref, dg_ref, db_ref, *, eps):
    i = pl.program_id(0)
    x = x_ref[...].astype(jnp.float32)  # [BM, C]
    dy = dy_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)  # [1, C]
    mu, rstd = _row_stats(x, eps)
    xhat = (x - mu) * rstd
    dyg = dy * g
    s1 = jnp.mean(dyg, axis=1, keepdims=True)
    s2 = jnp.mean(dyg * xhat, axis=1, keepdims=True)
    dx = rstd * (dyg - s1 - xhat * s2)
    dx_ref[...] = dx.astype(dx_ref.dtype)

    dg = jnp.sum(dy * xhat, axis=0, keepdims=True)  # [1, C]
    db = jnp.sum(dy, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        dg_ref[...] = dg
        db_ref[...] = db

    @pl.when(i != 0)
    def _():
        dg_ref[...] = dg_ref[...] + dg
        db_ref[...] = db_ref[...] + db


def _fwd_call(x, gamma, beta, eps, interpret):
    m, c = x.shape
    bm = _pick_block(m, 1024)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, c), x.dtype),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(x, gamma.reshape(1, c), beta.reshape(1, c))


def _bwd_call(x, dy, gamma, eps, interpret):
    m, c = x.shape
    bm = _pick_block(m, 1024)
    dx, dg, db = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps),
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bm, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m, c), x.dtype),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(x, dy, gamma.reshape(1, c))
    return dx, dg.reshape(c), db.reshape(c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_layer_norm(x, gamma, beta, eps: float = 1e-6, interpret: bool = False):
    """Row-wise LayerNorm over the last axis of 2-D ``x [M, C]``.

    ``gamma``/``beta`` are ``[C]`` float32; statistics are f32 regardless of
    ``x.dtype`` (matching flax).  Returns ``[M, C]`` in ``x.dtype``.
    """
    return _fwd_call(x, gamma, beta, eps, interpret)


def _vjp_fwd(x, gamma, beta, eps, interpret):
    return _fwd_call(x, gamma, beta, eps, interpret), (x, gamma)


def _vjp_bwd(eps, interpret, res, dy):
    x, gamma = res
    return _bwd_call(x, dy, gamma, eps, interpret)


fused_layer_norm.defvjp(_vjp_fwd, _vjp_bwd)


def layer_norm_reference(x, gamma, beta, eps: float = 1e-6):
    """XLA reference with identical dtype semantics for testing."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    xhat = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (xhat * gamma + beta).astype(x.dtype)
