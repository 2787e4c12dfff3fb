"""Fused Pallas TPU kernel for MK-MMD.

One kernel fuses the whole loss (``code/MMD.py:3-74`` math): Gram matrix on
the MXU, pairwise-distance assembly, bandwidth estimation, the 5-scale RBF
sum, and the four block-mean reductions — all resident in VMEM with a single
scalar output.  At EDRL sizes ([2B, 3072] features, B<=128) everything fits
in one block: no grid, no HBM round-trips for intermediates.

The XLA path (``edrl_tpu.ops.mmd``) materializes the [n, n] distance and
kernel matrices through HBM between fusions; this kernel keeps them in VMEM.
It is numerically identical (f32 throughout) and exposed through
``mk_mmd_pallas`` with a custom VJP whose backward re-derives gradients from
the XLA implementation (the loss is tiny relative to the backbones, so
forward fusion is what matters; backward stays one fused XLA program).

Layout requirements: n = n_s + n_t multiple of 8, d multiple of 128
(EDRL: n = 2*batch, d = 3072 — both aligned).  Falls back to the XLA path
otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from edrl_tpu.ops.mmd import mk_mmd as mk_mmd_xla


def _mmd_kernel(total_ref, out_ref, *, n_s: int, n_t: int, kernel_mul: float, kernel_num: int):
    total = total_ref[:].astype(jnp.float32)  # [n, d]
    n = n_s + n_t

    gram = jnp.dot(total, total.T, preferred_element_type=jnp.float32)  # MXU
    sq = jnp.sum(total * total, axis=1, keepdims=True)  # [n, 1]
    d2 = sq + sq.T - 2.0 * gram

    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    off_diag = row != col
    d2 = jnp.where(off_diag, jnp.maximum(d2, 0.0), 0.0)

    length_scale = jnp.sum(d2) / float(n * n - n)
    length_scale = length_scale / (kernel_mul ** (kernel_num // 2))

    acc = jnp.zeros_like(d2)
    for i in range(kernel_num):
        acc = acc + jnp.exp(-d2 / (length_scale * (kernel_mul**i) + 1e-12))

    in_s_row = row < n_s
    in_s_col = col < n_s
    xx = jnp.sum(jnp.where(in_s_row & in_s_col, acc, 0.0)) / float(n_s * n_s)
    yy = jnp.sum(jnp.where(~in_s_row & ~in_s_col, acc, 0.0)) / float(n_t * n_t)
    xy = jnp.sum(jnp.where(in_s_row & ~in_s_col, acc, 0.0)) / float(n_s * n_t)
    yx = jnp.sum(jnp.where(~in_s_row & in_s_col, acc, 0.0)) / float(n_s * n_t)
    out_ref[0, 0] = jnp.abs(xx + yy - xy - yx)


def _mmd_forward(source, target, kernel_mul, kernel_num, interpret):
    n_s, n_t = source.shape[0], target.shape[0]
    total = jnp.concatenate([source, target], axis=0).astype(jnp.float32)
    kernel = functools.partial(
        _mmd_kernel, n_s=n_s, n_t=n_t, kernel_mul=kernel_mul, kernel_num=kernel_num
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        interpret=interpret,
    )(total)
    return out[0, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def mk_mmd_pallas(
    source: jax.Array,
    target: jax.Array,
    kernel_mul: float = 2.0,
    kernel_num: int = 5,
    interpret: bool = False,
) -> jax.Array:
    """MK-MMD with a fused Pallas forward; set ``interpret=True`` off-TPU."""
    n = source.shape[0] + target.shape[0]
    if n % 8 != 0 or source.shape[1] % 128 != 0:
        return mk_mmd_xla(source, target, kernel_mul, kernel_num)
    return _mmd_forward(source, target, kernel_mul, kernel_num, interpret)


def _fwd(source, target, kernel_mul, kernel_num, interpret):
    out = mk_mmd_pallas(source, target, kernel_mul, kernel_num, interpret)
    return out, (source, target)


def _bwd(kernel_mul, kernel_num, interpret, res, g):
    source, target = res
    _, vjp = jax.vjp(
        lambda s, t: mk_mmd_xla(s, t, kernel_mul, kernel_num), source, target
    )
    ds, dt = vjp(g)
    return ds, dt


mk_mmd_pallas.defvjp(_fwd, _bwd)
