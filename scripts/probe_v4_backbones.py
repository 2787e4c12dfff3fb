"""Localize the v4 fused attention-sublayer kernel's cost per backbone.

Full-step measurement (scripts/bench_v4.py) shows v4 slower end-to-end
(150.4 vs 155.1 pairs/s at b16); this measures each backbone's fwd+bwd in
isolation with the flag on/off so BASELINE.md's negatives table can say
WHERE the regression lives.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from edrl_tpu.config import ModelConfig  # noqa: E402


def _timed_scan(step_fn, init, steps=20):
    @jax.jit
    def run(x):
        def body(carry, _):
            return step_fn(carry), None

        out, _ = jax.lax.scan(body, x, None, length=steps)
        return sum(
            jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(out)
        )

    float(run(init))
    t0 = time.perf_counter()
    float(run(init))
    return (time.perf_counter() - t0) / steps


def probe(which: str, fused_block: bool, batch: int = 16):
    cfg = ModelConfig(use_bfloat16=True)
    dtype = jnp.bfloat16
    if which == "swin":
        from edrl_tpu.models.swin2d import SwinTransformer2D

        model = SwinTransformer2D(
            embed_dim=cfg.swin_embed_dim,
            depths=cfg.swin_depths,
            num_heads=cfg.swin_heads,
            window=cfg.swin_window,
            dtype=dtype,
            use_fused_attention=cfg.use_fused_attention and not fused_block,
            use_fused_block_attention=fused_block,
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
            use_fused_attention=cfg.vit_fused_attention and not fused_block,
            use_fused_block_attention=fused_block,
        )
        x = jnp.asarray(
            np.random.default_rng(0).uniform(size=(batch, 96, 96, 96, 1)),
            jnp.float32,
        )
    params = jax.jit(model.init)(jax.random.key(0), x)["params"]

    def step(p):
        def loss(p):
            tokens, pooled = model.apply({"params": p}, x)
            return jnp.sum(pooled.astype(jnp.float32) ** 2) * 1e-6

        g = jax.grad(loss)(p)
        return jax.tree_util.tree_map(lambda a, b: a - 1e-6 * b, p, g)

    dt = _timed_scan(step, params)
    print(
        f"{which} fwd+bwd b{batch} fused_block={fused_block}: "
        f"{dt * 1e3:.1f} ms ({batch / dt:.1f} samples/s)",
        flush=True,
    )


if __name__ == "__main__":
    for which in ("swin", "vit"):
        for fused_block in (False, True):
            probe(which, fused_block)
