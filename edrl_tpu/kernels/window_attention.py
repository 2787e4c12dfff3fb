"""Fused Pallas TPU window attention (forward + custom backward).

The Swin window attention is EDRL's hottest op after the MLPs; the XLA path
materializes f32 ``[B*nW, N, N]`` score tensors through HBM (the dominant
activation-memory term — they force remat at batch >= 32 and cost a full
HBM round-trip per block).  This kernel computes
``softmax(q @ k^T + bias) @ v`` per (batch, window, head) program with the
scores resident in VMEM only, f32 softmax, bf16 in/out.

Layout: ``q, k, v: [B, W, H, N, D]``, ``bias: [W, H, N, N]`` (relative
position bias broadcast over windows + shift mask already added; bias grad
flows back to the learnable table through the caller's bias construction).
Grid is ``(H, W, B)`` with batch innermost so the backward kernel can
accumulate ``dbias[w, h]`` across consecutive batch programs while the block
stays resident in VMEM.

N = window^2 (144 for window 12) must be a multiple of 8; D is the head dim
(128 with the TPU-first head layout — exactly one MXU tile).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P


def _ambient_batch_axis(batch: int, axis: str = "data"):
    """Mesh axis to shard_map a kernel's batch dim over, or ``None``.

    Non-None only when tracing under an active mesh context whose ``data``
    axis is >1 — ``jax.set_mesh`` is entered by the sharded train/eval steps
    (``trainer._with_mesh_context``) — i.e. exactly the multi-chip SPMD case
    where a bare ``pallas_call`` would not be partitionable.  Single-device
    and no-mesh traces return ``None`` and take the plain kernel path.

    The kernels' batch grid dimension is embarrassingly parallel (every
    (batch, window, head) program is independent; the only cross-batch term
    is the backward's ``dbias`` accumulation, which the SPMD wrappers close
    with an explicit ``psum``), so sharding the batch over ICI keeps the
    measured single-chip kernel path bit-for-bit per shard (SURVEY.md §5.8;
    VERDICT r4 next-#1).
    """
    am = jax.sharding.get_abstract_mesh()
    if am is None or am.empty or axis not in am.axis_names:
        return None
    n = dict(zip(am.axis_names, am.axis_sizes)).get(axis, 1)
    if n <= 1:
        return None
    if batch % n:
        raise ValueError(
            f"fused attention under a mesh needs batch ({batch}) divisible "
            f"by the '{axis}' axis ({n}); pad the batch (run_eval does) or "
            "disable the fused path"
        )
    return axis


def _shard_map(f, in_specs, out_specs):
    # check_vma=False: pallas_call's out_shape carries no vma annotation, and
    # the wrappers' collective bookkeeping (the dbias psum) is explicit in
    # the custom VJPs below, so the value-mesh-axis checker adds nothing.
    return jax.shard_map(
        f,
        mesh=jax.sharding.get_abstract_mesh(),
        in_specs=in_specs,
        out_specs=out_specs,
        check_vma=False,
    )


def _attn_fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref):
    q = q_ref[0, 0, 0].astype(jnp.float32)  # [N, D]
    k = k_ref[0, 0, 0].astype(jnp.float32)
    v = v_ref[0, 0, 0].astype(jnp.float32)
    bias = bias_ref[0, 0].astype(jnp.float32)  # [N, N]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) + bias
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) / l
    o_ref[0, 0, 0] = o.astype(o_ref.dtype)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, dq_ref, dk_ref, dv_ref, dbias_ref):
    b_idx = pl.program_id(2)
    q = q_ref[0, 0, 0].astype(jnp.float32)
    k = k_ref[0, 0, 0].astype(jnp.float32)
    v = v_ref[0, 0, 0].astype(jnp.float32)
    bias = bias_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0, 0].astype(jnp.float32)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) + bias
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = p / l  # normalized attention weights [N, N]

    # dP = do @ v^T ; ds = P * (dP - rowsum(dP * P))
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    delta = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = p * (dp - delta)

    dv = jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dq = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dq_ref[0, 0, 0] = dq.astype(dq_ref.dtype)
    dk_ref[0, 0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0, 0] = dv.astype(dv_ref.dtype)

    # Accumulate dbias over the (innermost) batch grid dimension: the block
    # index is constant in b, so the accumulator stays resident in VMEM.
    @pl.when(b_idx == 0)
    def _():
        dbias_ref[0, 0] = ds

    @pl.when(b_idx != 0)
    def _():
        dbias_ref[0, 0] = dbias_ref[0, 0] + ds


def _qkv_specs(n, d):
    return pl.BlockSpec((1, 1, 1, n, d), lambda h, w, b: (b, w, h, 0, 0),
                        memory_space=pltpu.VMEM)


def _bias_spec(n):
    return pl.BlockSpec((1, 1, n, n), lambda h, w, b: (w, h, 0, 0),
                        memory_space=pltpu.VMEM)


def _fwd_call(q, k, v, bias, interpret):
    B, W, H, N, D = q.shape
    return pl.pallas_call(
        _attn_fwd_kernel,
        grid=(H, W, B),
        in_specs=[_qkv_specs(N, D)] * 3 + [_bias_spec(N)],
        out_specs=_qkv_specs(N, D),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(q, k, v, bias)


def _bwd_call(q, k, v, bias, do, interpret):
    B, W, H, N, D = q.shape
    dq, dk, dv, dbias = pl.pallas_call(
        _attn_bwd_kernel,
        grid=(H, W, B),
        in_specs=[_qkv_specs(N, D)] * 3 + [_bias_spec(N), _qkv_specs(N, D)],
        out_specs=(
            _qkv_specs(N, D),
            _qkv_specs(N, D),
            _qkv_specs(N, D),
            _bias_spec(N),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(bias.shape, jnp.float32),
        ),
        interpret=interpret,
    )(q, k, v, bias, do)
    return dq, dk, dv, dbias


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def window_attention_fused(q, k, v, bias, interpret: bool = False):
    """softmax(q @ k^T + bias) @ v, fused per (b, w, h) program.

    q, k, v: ``[B, W, H, N, D]`` (q pre-scaled by 1/sqrt(D));
    bias: ``[W, H, N, N]`` float32.  Returns ``[B, W, H, N, D]`` in q's dtype.
    """
    return _fwd_call(q, k, v, bias, interpret)


def _fused_fwd(q, k, v, bias, interpret):
    o = _fwd_call(q, k, v, bias, interpret)
    return o, (q, k, v, bias)


def _fused_bwd(interpret, res, do):
    q, k, v, bias = res
    dq, dk, dv, dbias = _bwd_call(q, k, v, bias, do, interpret)
    return dq, dk, dv, dbias


window_attention_fused.defvjp(_fused_fwd, _fused_bwd)


def window_attention_reference(q, k, v, bias):
    """XLA reference implementation (same layout) for testing/fallback."""
    s = jnp.einsum(
        "bwhnd,bwhmd->bwhnm", q.astype(jnp.float32), k.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ) + bias[None]
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum(
        "bwhnm,bwhmd->bwhnd", p, v.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)


# ---------------------------------------------------------------------------
# v2: transpose-free layout.
#
# Device traces showed ~24% of the train step in layout copies, dominated by
# the [B,W,N,3,H,D] transposes feeding the v1 kernel.  v2 reads q/k/v
# DIRECTLY from the qkv Dense output [B, W, N, 3C] via three column-block
# index maps (columns [hD:(h+1)D], [C+hD:...], [2C+hD:...]) and writes the
# output in [B, W, N, C] layout — the attention path has zero transposes.
# ---------------------------------------------------------------------------


def _attn_fwd_kernel_v2(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale, bb):
    bias = bias_ref[0, 0].astype(jnp.float32)
    # Static unroll over the batch block: amortizes per-program overhead
    # (stage-0 has B*nW programs otherwise) while each dot stays a clean
    # [N, D] x [D, N] MXU matmul.
    for i in range(bb):
        q = q_ref[i, 0].astype(jnp.float32) * scale  # [N, D]
        k = k_ref[i, 0].astype(jnp.float32)
        v = v_ref[i, 0].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) / l
        o_ref[i, 0] = o.astype(o_ref.dtype)


def _attn_bwd_kernel_v2(
    q_ref, k_ref, v_ref, bias_ref, do_ref, dq_ref, dk_ref, dv_ref, dbias_ref,
    *, scale, bb
):
    b_idx = pl.program_id(2)
    bias = bias_ref[0, 0].astype(jnp.float32)
    ds_sum = None
    for i in range(bb):
        q = q_ref[i, 0].astype(jnp.float32) * scale
        k = k_ref[i, 0].astype(jnp.float32)
        v = v_ref[i, 0].astype(jnp.float32)
        do = do_ref[i, 0].astype(jnp.float32)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        p = p / l

        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        delta = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = p * (dp - delta)

        dv = jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dq = jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        dk = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # q here already carries the scale factor
        dq_ref[i, 0] = dq.astype(dq_ref.dtype)
        dk_ref[i, 0] = dk.astype(dk_ref.dtype)
        dv_ref[i, 0] = dv.astype(dv_ref.dtype)
        ds_sum = ds if ds_sum is None else ds_sum + ds

    @pl.when(b_idx == 0)
    def _():
        dbias_ref[0, 0] = ds_sum

    @pl.when(b_idx != 0)
    def _():
        dbias_ref[0, 0] = dbias_ref[0, 0] + ds_sum


def _v2_specs(n, d, c, part, bb):
    """Column-block spec into [B, W, N, 3C]: part 0/1/2 selects q/k/v."""
    h_blocks = c // d  # number of heads

    def index_map(h, w, b, part=part, h_blocks=h_blocks):
        return (b, w, 0, part * h_blocks + h)

    return pl.BlockSpec((bb, 1, n, d), index_map, memory_space=pltpu.VMEM)


def _v2_out_spec(n, d, bb):
    return pl.BlockSpec(
        (bb, 1, n, d), lambda h, w, b: (b, w, 0, h), memory_space=pltpu.VMEM
    )


def _batch_block(b):
    """Largest batch block <= 8 dividing B (1 disables blocking)."""
    for bb in (8, 4, 2):
        if b % bb == 0:
            return bb
    return 1


def window_attention_fused_v2(
    qkv: jax.Array,
    bias: jax.Array,
    num_heads: int,
    scale: float,
    interpret: bool = False,
) -> jax.Array:
    """softmax(q k^T * scale + bias) v from packed qkv, transpose-free.

    qkv: ``[B, W, N, 3C]`` (the qkv Dense output, columns ordered
    [q heads | k heads | v heads]); bias ``[W, H, N, N]`` f32.
    Returns ``[B, W, N, C]``.

    SPMD: when traced under a mesh context with a >1 ``data`` axis, the call
    self-wraps in ``jax.shard_map`` over that axis (batch-sharded qkv,
    replicated bias, psum'd dbias) so the measured kernel path runs
    per-shard under multi-chip data parallelism instead of being gated off.
    """
    axis = _ambient_batch_axis(qkv.shape[0])
    if axis is not None:
        return _v2_spmd(qkv, bias, num_heads, scale, interpret, axis)
    return _v2_local(qkv, bias, num_heads, scale, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _v2_local(qkv, bias, num_heads, scale, interpret):
    return _v2_fwd_call(qkv, bias, num_heads, scale, interpret)


def _v2_fwd_call(qkv, bias, num_heads, scale, interpret):
    B, W, N, C3 = qkv.shape
    c = C3 // 3
    d = c // num_heads
    bb = _batch_block(B)
    kernel = functools.partial(_attn_fwd_kernel_v2, scale=scale, bb=bb)
    return pl.pallas_call(
        kernel,
        grid=(num_heads, W, B // bb),
        in_specs=[
            _v2_specs(N, d, c, 0, bb),
            _v2_specs(N, d, c, 1, bb),
            _v2_specs(N, d, c, 2, bb),
            _bias_spec(N),
        ],
        out_specs=_v2_out_spec(N, d, bb),
        out_shape=jax.ShapeDtypeStruct((B, W, N, c), qkv.dtype),
        interpret=interpret,
    )(qkv, qkv, qkv, bias)


def _v2_fwd(qkv, bias, num_heads, scale, interpret):
    o = _v2_fwd_call(qkv, bias, num_heads, scale, interpret)
    return o, (qkv, bias)


def _v2_bwd(num_heads, scale, interpret, res, do):
    qkv, bias = res
    B, W, N, C3 = qkv.shape
    c = C3 // 3
    d = c // num_heads
    bb = _batch_block(B)
    kernel = functools.partial(_attn_bwd_kernel_v2, scale=scale, bb=bb)
    dq, dk, dv, dbias = pl.pallas_call(
        kernel,
        grid=(num_heads, W, B // bb),
        in_specs=[
            _v2_specs(N, d, c, 0, bb),
            _v2_specs(N, d, c, 1, bb),
            _v2_specs(N, d, c, 2, bb),
            _bias_spec(N),
            _v2_out_spec(N, d, bb),
        ],
        out_specs=(
            _v2_out_spec(N, d, bb),
            _v2_out_spec(N, d, bb),
            _v2_out_spec(N, d, bb),
            _bias_spec(N),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, W, N, c), qkv.dtype),
            jax.ShapeDtypeStruct((B, W, N, c), qkv.dtype),
            jax.ShapeDtypeStruct((B, W, N, c), qkv.dtype),
            jax.ShapeDtypeStruct(bias.shape, jnp.float32),
        ),
        interpret=interpret,
    )(qkv, qkv, qkv, bias, do)
    # The concatenate is the packed-cotangent layout pass, and it is not
    # avoidable inside the kernel: out_specs map 1:1 onto output arrays, so
    # dq/dk/dv cannot be written as three column blocks of ONE [B,W,N,3C]
    # buffer; a part-leading [3,B,W,N,C] output just trades the concat for
    # an equal-cost transpose, and reordering the grid to keep a packed
    # block resident across heads breaks the dbias revisit accumulation
    # (which needs the batch dim innermost).  XLA is free to fuse this
    # concat into the consuming qkv-Dense backward matmuls.
    return jnp.concatenate([dq, dk, dv], axis=-1), dbias


_v2_local.defvjp(_v2_fwd, _v2_bwd)


# SPMD wrapper: shard_map over the mesh's 'data' axis.  Forward is
# embarrassingly parallel over batch shards; the backward's dbias is the one
# cross-batch reduction, closed with an explicit psum (bias is replicated,
# so its cotangent must sum over the axis).  Written as an OUTER custom_vjp
# (rather than differentiating through shard_map) so the collective
# structure is explicit and independent of shard_map's AD/replication rules.
@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _v2_spmd(qkv, bias, num_heads, scale, interpret, axis):
    return _v2_spmd_call(qkv, bias, num_heads, scale, interpret, axis)


def _v2_spmd_call(qkv, bias, num_heads, scale, interpret, axis):
    def f(qkv, bias):
        return _v2_fwd_call(qkv, bias, num_heads, scale, interpret)

    return _shard_map(f, in_specs=(P(axis), P()), out_specs=P(axis))(qkv, bias)


def _v2_spmd_fwd(qkv, bias, num_heads, scale, interpret, axis):
    o = _v2_spmd_call(qkv, bias, num_heads, scale, interpret, axis)
    return o, (qkv, bias)


def _v2_spmd_bwd(num_heads, scale, interpret, axis, res, do):
    qkv, bias = res

    def f(qkv, bias, do):
        dqkv, dbias = _v2_bwd(num_heads, scale, interpret, (qkv, bias), do)
        return dqkv, jax.lax.psum(dbias, axis)

    return _shard_map(
        f, in_specs=(P(axis), P(), P(axis)), out_specs=(P(axis), P())
    )(qkv, bias, do)


_v2_spmd.defvjp(_v2_spmd_fwd, _v2_spmd_bwd)


# ---------------------------------------------------------------------------
# v3: generic fused self-attention, transpose-free, bias-free.
#
# For the 3-D ViT trunk (216 tokens) and other plain self-attentions: reads
# per-head column blocks straight out of the q/k/v Dense outputs
# ``[B, N, C]`` (no head-split transposes anywhere) and writes ``[B, N, C]``.
# No relative-position bias -> no bias add in the forward and no dbias
# accumulation in the backward.  Pair with head_dim 128 so every program's
# matmuls fill the MXU (the TPU-first head layout, same decision as the Swin
# ``(1,2,4,8)`` head split).
# ---------------------------------------------------------------------------


def _sa_fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, bb):
    for i in range(bb):
        q = q_ref[i].astype(jnp.float32) * scale  # [N, D]
        k = k_ref[i].astype(jnp.float32)
        v = v_ref[i].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) / l
        o_ref[i] = o.astype(o_ref.dtype)


def _sa_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *, scale, bb):
    for i in range(bb):
        q = q_ref[i].astype(jnp.float32) * scale
        k = k_ref[i].astype(jnp.float32)
        v = v_ref[i].astype(jnp.float32)
        do = do_ref[i].astype(jnp.float32)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        p = p / l

        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        delta = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = p * (dp - delta)

        dv = jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dq = jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        dk = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # q already carries the scale factor
        dq_ref[i] = dq.astype(dq_ref.dtype)
        dk_ref[i] = dk.astype(dk_ref.dtype)
        dv_ref[i] = dv.astype(dv_ref.dtype)


def _sa_spec(n, d, bb):
    """Per-head column block into [B, N, C]."""
    return pl.BlockSpec((bb, n, d), lambda h, b: (b, 0, h), memory_space=pltpu.VMEM)


def self_attention_fused(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
    scale: float,
    interpret: bool = False,
) -> jax.Array:
    """softmax(q k^T * scale) v per head, transpose-free.

    q, k, v: ``[B, N, C]`` with heads packed along the channel axis (the raw
    Dense projection outputs).  N must be a multiple of 8.  Returns
    ``[B, N, C]`` in q's dtype.

    SPMD: under a mesh context with a >1 ``data`` axis the call self-wraps
    in ``jax.shard_map`` over that axis (all operands batch-sharded; no
    cross-shard terms — bias-free attention has no replicated-input
    cotangent, so no collective at all).
    """
    axis = _ambient_batch_axis(q.shape[0])
    if axis is not None:
        return _sa_spmd(q, k, v, num_heads, scale, interpret, axis)
    return _sa_local(q, k, v, num_heads, scale, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _sa_local(q, k, v, num_heads, scale, interpret):
    return _sa_fwd_call(q, k, v, num_heads, scale, interpret)


def _sa_fwd_call(q, k, v, num_heads, scale, interpret):
    B, N, C = q.shape
    d = C // num_heads
    bb = _batch_block(B)
    kernel = functools.partial(_sa_fwd_kernel, scale=scale, bb=bb)
    return pl.pallas_call(
        kernel,
        grid=(num_heads, B // bb),
        in_specs=[_sa_spec(N, d, bb)] * 3,
        out_specs=_sa_spec(N, d, bb),
        out_shape=jax.ShapeDtypeStruct((B, N, C), q.dtype),
        interpret=interpret,
    )(q, k, v)


def _sa_fwd(q, k, v, num_heads, scale, interpret):
    o = _sa_fwd_call(q, k, v, num_heads, scale, interpret)
    return o, (q, k, v)


def _sa_bwd(num_heads, scale, interpret, res, do):
    q, k, v = res
    B, N, C = q.shape
    d = C // num_heads
    bb = _batch_block(B)
    kernel = functools.partial(_sa_bwd_kernel, scale=scale, bb=bb)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(num_heads, B // bb),
        in_specs=[_sa_spec(N, d, bb)] * 4,
        out_specs=(_sa_spec(N, d, bb),) * 3,
        out_shape=(jax.ShapeDtypeStruct((B, N, C), q.dtype),) * 3,
        interpret=interpret,
    )(q, k, v, do)
    return dq, dk, dv


_sa_local.defvjp(_sa_fwd, _sa_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _sa_spmd(q, k, v, num_heads, scale, interpret, axis):
    return _sa_spmd_call(q, k, v, num_heads, scale, interpret, axis)


def _sa_spmd_call(q, k, v, num_heads, scale, interpret, axis):
    def f(q, k, v):
        return _sa_fwd_call(q, k, v, num_heads, scale, interpret)

    return _shard_map(f, in_specs=(P(axis),) * 3, out_specs=P(axis))(q, k, v)


def _sa_spmd_fwd(q, k, v, num_heads, scale, interpret, axis):
    o = _sa_spmd_call(q, k, v, num_heads, scale, interpret, axis)
    return o, (q, k, v)


def _sa_spmd_bwd(num_heads, scale, interpret, axis, res, do):
    q, k, v = res

    def f(q, k, v, do):
        return _sa_bwd(num_heads, scale, interpret, (q, k, v), do)

    return _shard_map(
        f, in_specs=(P(axis),) * 4, out_specs=(P(axis),) * 3
    )(q, k, v, do)


_sa_spmd.defvjp(_sa_spmd_fwd, _sa_spmd_bwd)
