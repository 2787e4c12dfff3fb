"""Device-side batch augmentation (jittable).

With ``device_noise`` on, the host pipeline was still paying ~30ms/sample for
numpy color-jitter/HSV math — 10x slower than the device step.  This module
reproduces the reference's train augmentations
(``code/data_harvard.py:621-634``: ColorJitter(0.2,0.2,0.2,0.1)@p=0.8,
RandomGrayscale@p=0.2, RandomHorizontalFlip on fundus; HFlip on OCT) as
vectorized per-sample-keyed jnp ops inside the jitted train step, so the host
only decodes + stacks + ships uint8.

Order note: torchvision samples a random order for the four jitter ops; here
the order is fixed (brightness, contrast, saturation, hue) — the composition
differs only in second-order effects and each factor's distribution is
identical.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# numpy (not jnp) constant: this module is imported lazily inside jitted
# functions, and a module-level jnp.array created under a trace would leak
# a tracer.
_GRAY = np.array([0.299, 0.587, 0.114], np.float32)


def _bc(v):  # broadcast a [B] factor over [B, H, W, C]
    return v[:, None, None, None]


def _rgb_to_hsv(r, g, b):
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    spread = maxc - minc
    s = jnp.where(maxc > 0, spread / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.maximum(spread, 1e-12)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = (h / 6.0) % 1.0
    h = jnp.where(spread == 0, 0.0, h)
    return h, s, v


def _hsv_to_rgb(h, s, v):
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return r, g, b


def augment_fundus_batch(
    x: jax.Array,
    key: jax.Array,
    jitter_prob: float = 0.8,
    jitter_strength: Tuple[float, float, float, float] = (0.2, 0.2, 0.2, 0.1),
    grayscale_prob: float = 0.2,
    hflip_prob: float = 0.5,
) -> jax.Array:
    """[B, H, W, 3] float in [0,1] -> augmented, per-sample randomness."""
    b = x.shape[0]
    x = x.astype(jnp.float32)
    kb, kc, ks, kh, kapply, kgray, kflip = jax.random.split(key, 7)
    br, ct, sat, hue = jitter_strength

    apply = jax.random.uniform(kapply, (b,)) < jitter_prob
    f_b = jnp.where(apply, jax.random.uniform(kb, (b,), minval=1 - br, maxval=1 + br), 1.0)
    f_c = jnp.where(apply, jax.random.uniform(kc, (b,), minval=1 - ct, maxval=1 + ct), 1.0)
    f_s = jnp.where(apply, jax.random.uniform(ks, (b,), minval=1 - sat, maxval=1 + sat), 1.0)
    f_h = jnp.where(apply, jax.random.uniform(kh, (b,), minval=-hue, maxval=hue), 0.0)

    # brightness
    x = jnp.clip(x * _bc(f_b), 0.0, 1.0)
    # contrast (blend toward the per-image gray mean)
    mean = jnp.mean(x @ _GRAY, axis=(1, 2))[:, None, None, None]
    x = jnp.clip(_bc(f_c) * x + (1.0 - _bc(f_c)) * mean, 0.0, 1.0)
    # saturation (blend toward per-pixel gray)
    gray = (x @ _GRAY)[..., None]
    x = jnp.clip(_bc(f_s) * x + (1.0 - _bc(f_s)) * gray, 0.0, 1.0)
    # hue rotation
    h, s, v = _rgb_to_hsv(x[..., 0], x[..., 1], x[..., 2])
    h = (h + f_h[:, None, None]) % 1.0
    r, g, bch = _hsv_to_rgb(h, s, v)
    x = jnp.clip(jnp.stack([r, g, bch], axis=-1), 0.0, 1.0)

    # random grayscale
    to_gray = jax.random.uniform(kgray, (b,)) < grayscale_prob
    gray3 = jnp.repeat((x @ _GRAY)[..., None], 3, axis=-1)
    x = jnp.where(_bc(to_gray.astype(x.dtype)) > 0, gray3, x)

    # horizontal flip
    flip = jax.random.uniform(kflip, (b,)) < hflip_prob
    x = jnp.where(_bc(flip.astype(x.dtype)) > 0, x[:, :, ::-1, :], x)
    return x


def augment_oct_batch(
    x: jax.Array, key: jax.Array, hflip_prob: float = 0.5
) -> jax.Array:
    """[B, D, H, W, 1] -> per-sample horizontal (W-axis) flip."""
    b = x.shape[0]
    flip = jax.random.uniform(key, (b,)) < hflip_prob
    return jnp.where(
        flip[:, None, None, None, None], x[:, :, :, ::-1, :], x
    )
