"""Benchmark: EDRL training throughput (fundus+OCT pairs/sec/chip).

Runs the flagship MedFusion self-distillation train step (dual full-size
forward: Swin-B @ 384^2 + 3-D ViT @ 96^3, MK-MMD, backward, Adam) on the
available accelerator and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "pairs/sec/chip", "vs_baseline": N}

The reference publishes no numbers (BASELINE.md), so the baseline is the
self-recorded value in BASELINE.md's history; ``vs_baseline`` is the ratio
against ``BASELINE_PAIRS_PER_SEC`` below (first measurement = 1.0 by
definition, later rounds show the speedup).
"""

from __future__ import annotations

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from edrl_tpu.utils import tpu_lock

# Persistent compilation cache: repeat bench runs skip the multi-minute
# XLA compile of the full train step.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# Round-1 self-baseline on TPU v5e-1 (updated as the framework speeds up).
# History: 60.3 (first working step, Swin-B heads, remat) -> 71.7 (no remat)
# -> 120.6 (head_dim-128 window attention).
BASELINE_PAIRS_PER_SEC = 60.3

# TPU v5e per-chip bf16 peak (public spec: 394 TOPS int8 / 197 TFLOP/s bf16);
# used for the absolute-utilization (MFU) field.  The 2026-08-17 trace put
# the step's dense matmuls at 144.8 TFLOP/s = 73% of this peak (BASELINE.md).
V5E_BF16_PEAK_FLOPS = 197e12


def count_train_step_flops(batch_size: int) -> float:
    """Analytic model FLOPs for ONE optimizer step, via XLA cost analysis.

    The measured program runs attention inside Pallas custom calls, which
    XLA's HLO cost analysis counts as zero FLOPs — so the count is taken on
    the mathematically identical UNFUSED path (plain-HLO attention dots,
    no remat recompute).  Everything is abstract: the state comes from
    ``jax.eval_shape`` over ``init_state`` and the step is only ``.lower()``-ed
    (host-side) — no device compute, no compile.  Runs on the CPU backend
    (``main`` shells out with JAX_PLATFORMS=cpu), where client-side HLO
    cost analysis is guaranteed to exist — PJRT plugins (like the tunneled
    TPU's) aren't required to implement it, and the count is
    backend-independent anyway.
    """
    from edrl_tpu.config import DataConfig, EDRLConfig, ModelConfig, TrainConfig
    from edrl_tpu.train.trainer import (
        init_state,
        make_model,
        make_optimizer,
        make_train_step,
    )

    cfg = EDRLConfig(
        data=DataConfig(batch_size=batch_size),
        model=ModelConfig(
            use_bfloat16=True,
            remat=False,
            remat_attention=False,
            use_fused_attention=False,
            vit_fused_attention=False,
            use_fused_block_attention=False,
            use_fused_mlp=False,
            use_fused_ln=False,
        ),
        train=TrainConfig(),
    )
    state = jax.eval_shape(lambda: init_state(cfg, 0)[1])
    train_step = make_train_step(make_model(cfg), make_optimizer(cfg), cfg, jit=False)
    d = cfg.data
    batch = {
        "fundus_low": jax.ShapeDtypeStruct((batch_size, d.fundus_size, d.fundus_size, 3), jnp.float32),
        "fundus_high": jax.ShapeDtypeStruct((batch_size, d.fundus_size, d.fundus_size, 3), jnp.float32),
        "oct_low": jax.ShapeDtypeStruct((batch_size, *d.oct_size, 1), jnp.float32),
        "oct_high": jax.ShapeDtypeStruct((batch_size, *d.oct_size, 1), jnp.float32),
        "label": jax.ShapeDtypeStruct((batch_size,), jnp.int32),
    }
    key = jax.random.key(0)  # concrete scalar key; creating it is free

    def one_step(state, batch, key):
        new_state, out = train_step(state, batch, key)
        return new_state, out["loss"]

    cost = jax.jit(one_step).lower(state, batch, key).cost_analysis()
    if isinstance(cost, (list, tuple)):  # older jax returns [dict]
        cost = cost[0]
    return float(cost.get("flops", 0.0))


def count_train_step_flops_subprocess(batch_size: int) -> float:
    """Run the FLOP count in a fresh JAX_PLATFORMS=cpu process (cost
    analysis is a CPU-client feature; the bench process itself is bound to
    the TPU plugin).  Best-effort: returns 0.0 on any failure."""
    import os
    import subprocess

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    try:
        out = subprocess.run(
            [sys.executable, __file__, "--count_flops", str(batch_size)],
            env=env,
            capture_output=True,
            text=True,
            timeout=1200,
            check=True,
        )
        return float(out.stdout.strip().splitlines()[-1])
    except Exception as e:
        print(f"[bench] flop count unavailable: {e!r}", file=sys.stderr)
        return 0.0


def make_batch(batch_size: int, data_cfg, rng):
    return {
        "fundus_low": jnp.asarray(
            rng.uniform(size=(batch_size, data_cfg.fundus_size, data_cfg.fundus_size, 3)).astype(np.float32)
        ),
        "fundus_high": jnp.asarray(
            rng.uniform(size=(batch_size, data_cfg.fundus_size, data_cfg.fundus_size, 3)).astype(np.float32)
        ),
        "oct_low": jnp.asarray(
            rng.uniform(size=(batch_size, *data_cfg.oct_size, 1)).astype(np.float32)
        ),
        "oct_high": jnp.asarray(
            rng.uniform(size=(batch_size, *data_cfg.oct_size, 1)).astype(np.float32)
        ),
        "label": jnp.asarray(rng.integers(0, 2, size=batch_size).astype(np.int32)),
    }


def bench_train_step(
    batch_size: int = 16, steps: int = 20, remat: bool = False, **model_kwargs
):
    """Device throughput of the dual-view train step.

    The ``steps`` optimizer steps run inside ONE jitted ``lax.scan`` program —
    exactly how a production loop with an on-device data queue behaves — so
    the number reflects device time, not host/transport dispatch overhead.
    ``float()`` on the result forces a device->host round trip (on remote
    transports ``block_until_ready`` alone can return early).
    """
    from edrl_tpu.config import DataConfig, EDRLConfig, ModelConfig, TrainConfig
    from edrl_tpu.train.trainer import (
        init_state,
        make_model,
        make_optimizer,
        make_train_step,
    )

    cfg = EDRLConfig(
        data=DataConfig(batch_size=batch_size),
        model=ModelConfig(use_bfloat16=True, remat=remat, **model_kwargs),
        train=TrainConfig(),
    )
    _, state = init_state(cfg, 0)
    train_step = make_train_step(make_model(cfg), make_optimizer(cfg), cfg, jit=False)
    batch = make_batch(batch_size, cfg.data, np.random.default_rng(0))
    key = jax.random.key(0)

    # Donating the state matches production (trainer donates too) and frees
    # ~2.2 GB of param+optimizer aliases — the margin batch 32 needs.
    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_steps(state, batch, key):
        def body(carry, _):
            new_state, out = train_step(carry, batch, key)
            return new_state, out["loss"]

        state, losses = jax.lax.scan(body, state, None, length=steps)
        return state, losses

    # Warmup / compile (one scan program).  The input state is donated, so
    # keep rebinding the returned one.
    state, losses = run_steps(state, batch, key)
    float(losses[-1])
    t0 = time.perf_counter()
    state, losses = run_steps(state, batch, key)
    float(losses[-1])
    dt = time.perf_counter() - t0
    return batch_size * steps / dt


def bench_infer_step(batch_size: int = 16, steps: int = 20, **model_kwargs):
    """Inference throughput: low-view forward only (the ``val()``/``test()``
    path, parity ``fusion_train.py:277,469-470``), scanned on-device like
    the train bench so the number is device time."""
    from edrl_tpu.config import DataConfig, EDRLConfig, ModelConfig, TrainConfig
    from edrl_tpu.train.trainer import init_state, make_eval_step, make_model

    cfg = EDRLConfig(
        data=DataConfig(batch_size=batch_size),
        model=ModelConfig(use_bfloat16=True, **model_kwargs),
        train=TrainConfig(),
    )
    model, state = init_state(cfg, 0)
    eval_step = make_eval_step(model, cfg)
    rng = np.random.default_rng(0)
    d = cfg.data
    batch = {
        "fundus_low": jnp.asarray(
            rng.uniform(size=(batch_size, d.fundus_size, d.fundus_size, 3)).astype(
                np.float32
            )
        ),
        "oct_low": jnp.asarray(
            rng.uniform(size=(batch_size, *d.oct_size, 1)).astype(np.float32)
        ),
        "label": jnp.asarray(rng.integers(0, 2, size=batch_size).astype(np.int32)),
    }

    @jax.jit
    def run_steps(state, batch):
        def body(acc, _):
            # Feed the carry back into the input (negligible numerically) so
            # iterations are data-dependent — otherwise XLA hoists the whole
            # loop-invariant forward out of the scan and the timing is fake.
            fundus = batch["fundus_low"] + acc * jnp.float32(1e-24)
            out = eval_step(state, {**batch, "fundus_low": fundus})
            return out["probs"].mean().astype(jnp.float32), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=steps)
        return acc

    float(run_steps(state, batch))  # warmup / compile
    t0 = time.perf_counter()
    float(run_steps(state, batch))
    dt = time.perf_counter() - t0
    return batch_size * steps / dt


def main():
    # Flagship only; to bench any registry model (apples-to-apples baseline
    # comparisons, same methodology) use scripts/bench_model.py.
    #
    # The measurement refuses to race other in-repo TPU jobs: study queues /
    # training CLIs hold the advisory TPU lock, and we wait (up to 30 min)
    # for the chip to go idle before timing — a contended capture
    # under-reports the framework by ~30% (round-3 post-mortem, VERDICT r3).
    idle = tpu_lock.wait_until_free(timeout_s=1800.0)
    with tpu_lock.hold("bench.py") as got:
        # `got` False means another process grabbed the lock in the window
        # after wait_until_free returned — the capture is contended even
        # though the wait "succeeded" (ADVICE r4 #5).
        batch_size, steps = 16, 20
        pairs_per_sec = bench_train_step(batch_size=batch_size, steps=steps)
        infer_pairs_per_sec = bench_infer_step(batch_size=batch_size, steps=steps)
    flops_per_step = count_train_step_flops_subprocess(batch_size)
    mfu = (pairs_per_sec / batch_size) * flops_per_step / V5E_BF16_PEAK_FLOPS
    record = {
        "metric": "EDRL fundus+OCT train pairs/sec/chip (dual-view step, 384^2+96^3, bf16)",
        "value": round(pairs_per_sec, 3),
        "unit": "pairs/sec/chip",
        "vs_baseline": round(pairs_per_sec / BASELINE_PAIRS_PER_SEC, 3),
        "infer_pairs_per_sec_chip": round(infer_pairs_per_sec, 3),
        # Absolute utilization: analytic model FLOPs (XLA cost analysis of
        # the unfused-HLO step — identical math to the measured program,
        # whose Pallas custom calls the analyzer can't see) vs the v5e
        # per-chip bf16 peak (197 TFLOP/s).
        "model_tflops_per_step": round(flops_per_step / 1e12, 3),
        "mfu_pct": round(100.0 * mfu, 2),
    }
    if not (idle and got):
        record["contended"] = True  # another TPU job held/raced the lock
    print(json.dumps(record))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--count_flops":
        # Subprocess mode (JAX_PLATFORMS=cpu set by the parent): print the
        # per-step FLOP count and nothing else on stdout.
        jax.config.update("jax_platforms", "cpu")  # the TPU plugin otherwise wins
        print(count_train_step_flops(int(sys.argv[2])))
    else:
        main()
