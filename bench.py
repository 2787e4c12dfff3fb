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
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compilation cache: repeat bench runs skip the multi-minute
# XLA compile of the full train step.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# Round-1 self-baseline on TPU v5e-1 (updated as the framework speeds up).
# History: 60.3 (first working step, Swin-B heads, remat) -> 71.7 (no remat)
# -> 120.6 (head_dim-128 window attention).
BASELINE_PAIRS_PER_SEC = 60.3


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
    pairs_per_sec = bench_train_step()
    infer_pairs_per_sec = bench_infer_step()
    print(
        json.dumps(
            {
                "metric": "EDRL fundus+OCT train pairs/sec/chip (dual-view step, 384^2+96^3, bf16)",
                "value": round(pairs_per_sec, 3),
                "unit": "pairs/sec/chip",
                "vs_baseline": round(pairs_per_sec / BASELINE_PAIRS_PER_SEC, 3),
                "infer_pairs_per_sec_chip": round(infer_pairs_per_sec, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
