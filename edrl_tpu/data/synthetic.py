"""Synthetic GAMMA-like dataset for hermetic train/eval runs.

SURVEY.md section 4: the reference's data paths are placeholders
(``fusion_train.py:559-560``), so the framework ships a synthetic generator
matching the real schema — fundus [H, W, 3], OCT [D, H, W], one-hot labels
as in ``train_true.xlsx`` — with a *learnable* class signal (class-dependent
intensity and structured frequency patterns) so smoke training can show loss
decreasing and AUC above chance.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from edrl_tpu.config import DataConfig
from edrl_tpu.data.noise import make_noise_views, sample_rng
from edrl_tpu.data.transforms import fundus_train_augment, oct_train_augment


class SyntheticGammaDataset:
    """Deterministic per-index synthetic samples with a recoverable label."""

    def __init__(self, cfg: DataConfig, mode: str = "train", num_classes: int = 2):
        self.cfg = cfg
        self.mode = mode
        self.num_classes = num_classes
        self.n = cfg.num_synthetic_samples
        self._memo = {}  # index -> base sample (deterministic, reused per epoch)

    def __len__(self) -> int:
        return self.n

    def _base_sample(self, index: int):
        """Raw (pre-noise) fundus/oct pair + label, deterministic in index."""
        rng = np.random.default_rng(np.random.SeedSequence([1234, index]))
        label = index % self.num_classes
        h = self.cfg.fundus_size
        d, oh, ow = self.cfg.oct_size
        # Class signal: mean shift + a low-frequency grating whose frequency
        # depends on the class, visible to both modalities.
        yy, xx = np.mgrid[0:h, 0:h]
        freq = 2 + 3 * label
        pattern = 0.15 * np.sin(2 * np.pi * freq * xx / h) * np.sin(
            2 * np.pi * freq * yy / h
        )
        base = 0.4 + 0.1 * label
        fundus = base + pattern[..., None] + 0.1 * rng.normal(size=(h, h, 3))
        fundus = np.clip(fundus, 0.0, 1.0).astype(np.float32)

        zz = np.mgrid[0:d][:, None, None]
        vol_pattern = 0.15 * np.sin(2 * np.pi * freq * zz / d)
        oct_vol = base + vol_pattern + 0.1 * rng.normal(size=(d, oh, ow))
        oct_vol = np.clip(oct_vol, 0.0, 1.0).astype(np.float32)
        return fundus, oct_vol, label

    def get(self, index: int, epoch: int = 0) -> Dict[str, np.ndarray]:
        if self.cfg.device_noise:
            # Single clean view; the jitted step augments and builds both
            # noise views on device — host cost is just the (memoized) base,
            # stored uint8 so batching is a pure byte-stack.
            if index not in self._memo:
                fundus, oct_vol, label = self._base_sample(index)
                if self.cfg.uint8_transport:
                    fundus = np.rint(fundus * 255.0).astype(np.uint8)
                    oct_vol = np.rint(oct_vol * 255.0).astype(np.uint8)
                self._memo[index] = (fundus, oct_vol, label)
            fundus, oct_vol, label = self._memo[index]
            return {"fundus": fundus, "oct": oct_vol, "label": np.int32(label)}
        fundus, oct_vol, label = self._base_sample(index)
        rng = sample_rng(self.cfg.seed, epoch, index)
        views = make_noise_views(fundus, oct_vol, self.cfg.noise, rng)
        if self.mode == "train":
            for key in ("fundus_low", "fundus_high"):
                views[key] = fundus_train_augment(
                    views[key],
                    rng,
                    jitter_prob=self.cfg.color_jitter_prob,
                    grayscale_prob=self.cfg.grayscale_prob,
                    hflip_prob=self.cfg.hflip_prob,
                    jitter_strength=self.cfg.color_jitter_strength,
                )
            for key in ("oct_low", "oct_high"):
                views[key] = oct_train_augment(views[key], rng, self.cfg.hflip_prob)
        views["label"] = np.int32(label)
        return views
