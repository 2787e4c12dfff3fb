"""Perf probes: per-component step cost + remat/batch-size trade-offs.

Times forward+backward of each backbone in isolation and the full train
step, all as on-device ``lax.scan`` programs (device time, not dispatch).

    python scripts/perf_probe.py swin vit full       # component probes
    python scripts/perf_probe.py remat32             # full step, remat, b32
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from edrl_tpu.config import DataConfig, EDRLConfig, ModelConfig, TrainConfig


def _timed_scan(step_fn, init, steps=20):
    @jax.jit
    def run(x):
        def body(carry, _):
            return step_fn(carry), None

        out, _ = jax.lax.scan(body, x, None, length=steps)
        # Reduce to ONE scalar on device: fetching the whole tree over the
        # remote transport would swamp the timing with transfer cost.
        return sum(
            jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(out)
        )

    float(run(init))  # warmup/compile + host sync
    t0 = time.perf_counter()
    float(run(init))
    return (time.perf_counter() - t0) / steps


def probe_backbone(which: str, batch: int = 16, remat: bool = False):
    cfg = ModelConfig(use_bfloat16=True, remat=remat)
    dtype = jnp.bfloat16
    if which == "swin":
        from edrl_tpu.models.swin2d import SwinTransformer2D

        model = SwinTransformer2D(
            embed_dim=cfg.swin_embed_dim,
            depths=cfg.swin_depths,
            num_heads=cfg.swin_heads,
            window=cfg.swin_window,
            dtype=dtype,
            remat=remat,
            remat_attention=cfg.remat_attention,
            use_fused_attention=cfg.use_fused_attention,
        )
        x = jnp.asarray(
            np.random.default_rng(0).uniform(size=(batch, 384, 384, 3)),
            jnp.float32,
        )
    else:
        from edrl_tpu.models.vit3d import ViT3D

        model = ViT3D(
            dim=cfg.oct_embed_dim,
            depth=cfg.vit3d_depth,
            num_heads=cfg.vit3d_heads,
            dtype=dtype,
            remat=remat,
            use_fused_attention=cfg.vit_fused_attention,
        )
        x = jnp.asarray(
            np.random.default_rng(0).uniform(size=(batch, 96, 96, 96, 1)),
            jnp.float32,
        )
    variables = jax.jit(model.init)(jax.random.key(0), x)
    params = variables["params"]

    def step(p):
        def loss(p):
            tokens, pooled = model.apply({"params": p}, x)
            return jnp.sum(pooled.astype(jnp.float32) ** 2) * 1e-6

        g = jax.grad(loss)(p)
        return jax.tree_util.tree_map(lambda a, b: a - 1e-6 * b, p, g)

    dt = _timed_scan(step, params)
    print(f"{which} fwd+bwd batch={batch} remat={remat}: {dt*1e3:.1f} ms "
          f"({batch/dt:.1f} samples/s)", flush=True)


def probe_full(batch: int, remat: bool):
    from bench import bench_train_step

    pps = bench_train_step(batch_size=batch, steps=10, remat=remat)
    print(f"full step batch={batch} remat={remat}: {pps:.1f} pairs/s", flush=True)


def probe_bandwidth(mb: int = 512):
    """Achievable HBM bandwidth: elementwise scale over a large bf16 array."""
    n = mb * 1024 * 1024 // 2
    x = jnp.ones((n,), jnp.bfloat16)

    def step(x):
        return x * jnp.bfloat16(1.0001)

    dt = _timed_scan(step, x, steps=20)
    bw = 2 * n * 2 / dt / 1e9  # read + write
    print(f"elementwise bf16 {mb}MB: {dt*1e3:.2f} ms/iter -> {bw:.0f} GB/s",
          flush=True)


def probe_matmul(m=147456, k=128, n=512):
    """MXU utilization for the Swin stage-0 MLP shape."""
    a = jnp.ones((m, k), jnp.bfloat16)
    w = jnp.ones((k, n), jnp.bfloat16)

    def step(a):
        y = jax.lax.dot_general(
            a, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return (y[:, :k] * jnp.float32(1e-6)).astype(jnp.bfloat16)

    dt = _timed_scan(step, a, steps=20)
    fl = 2 * m * k * n
    print(f"matmul [{m},{k}]x[{k},{n}]: {dt*1e3:.2f} ms -> {fl/dt/1e12:.1f} "
          f"TFLOP/s", flush=True)


def main():
    args = sys.argv[1:] or ["swin", "vit"]
    for a in args:
        if a == "swin":
            probe_backbone("swin")
        elif a == "vit":
            probe_backbone("vit")
        elif a == "swin_remat":
            probe_backbone("swin", remat=True)
        elif a == "full":
            probe_full(16, remat=False)
        elif a == "remat32":
            probe_full(32, remat=True)
        elif a == "remat16":
            probe_full(16, remat=True)
        elif a == "bw":
            probe_bandwidth()
        elif a == "matmul":
            probe_matmul()
        else:
            print("unknown probe", a)


if __name__ == "__main__":
    main()
