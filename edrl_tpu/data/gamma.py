"""GAMMA / Harvard-30K style on-disk dataset.

Rebuilds the active ``GAMMA_dataset`` (``code/data_harvard.py:598-857``):

- fundus: ``{root}/{id}/data_{id}_fundus.png`` (``:663-668``)
- OCT: ``{root}/{id}/data_{id}.nii`` with ``processed_data_{id}.nii``
  fallback (``:671-681``), stored (H, W, D) -> transposed to (D, H, W)
- labels: xlsx/csv with a ``data`` id column and one-hot ``class_*`` columns,
  consumed as argmax (``:645-646,838``)
- transformer path resize: fundus -> 384^2 cubic, OCT -> 96^3 zoom (``:686-688``)
- normalize /255, dual noise views, train augmentations.

Improvement over the reference (SURVEY.md "Hard parts", input-pipeline
throughput): decoded+resized arrays are memoized to ``.npz`` next to the
source files (one-time conversion), so steady-state epochs skip PNG/NIfTI
decode and volume zoom entirely.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from edrl_tpu.config import DataConfig
from edrl_tpu.data.nifti import read_nifti
from edrl_tpu.data.noise import make_noise_views, sample_rng
from edrl_tpu.data.transforms import (
    fundus_train_augment,
    oct_train_augment,
    resize_image,
    resize_volume,
)


def _read_image(path: str) -> np.ndarray:
    try:
        import cv2

        img = cv2.imread(path)
        if img is None:
            raise FileNotFoundError(path)
        return img[..., ::-1].astype(np.float32)  # BGR -> RGB
    except ImportError:  # pragma: no cover
        from PIL import Image

        return np.asarray(Image.open(path).convert("RGB")).astype(np.float32)


def load_labels(label_file: str) -> Dict[str, np.ndarray]:
    """id -> one-hot row, from xlsx (pandas) or csv."""
    import pandas as pd

    if label_file.endswith(".csv"):
        df = pd.read_csv(label_file)
    else:
        df = pd.read_excel(label_file)
    out = {}
    for _, row in df.iterrows():
        out[str(row["data"]).zfill(5)] = row.values[1:].astype(np.float32)
    return out


class GammaDataset:
    def __init__(
        self,
        cfg: DataConfig,
        mode: str = "train",
        filelists: Optional[Sequence[str]] = None,
        cache: bool = True,
    ):
        self.cfg = cfg
        self.mode = mode.lower()
        self.cache = cache
        labels = load_labels(cfg.label_file)
        ids = filelists if filelists is not None else sorted(os.listdir(cfg.data_path))
        self.samples: List = []
        for sid in ids:
            name = os.path.basename(str(sid))
            if name.isdigit() and name.zfill(5) in labels:
                self.samples.append((name, labels[name.zfill(5)]))
            elif name in labels:
                self.samples.append((name, labels[name]))

    def __len__(self) -> int:
        return len(self.samples)

    def _load_raw(self, sid: str):
        root = self.cfg.data_path
        cache_path = os.path.join(root, sid, f"_edrl_cache_{self.cfg.fundus_size}.npz")
        if self.cache and os.path.exists(cache_path):
            z = np.load(cache_path)
            return z["fundus"], z["oct"]
        fundus = _read_image(os.path.join(root, sid, f"data_{sid}_fundus.png"))
        nii = os.path.join(root, sid, f"data_{sid}.nii")
        if not os.path.exists(nii):
            nii = os.path.join(root, sid, f"processed_data_{sid}.nii")
        vol = read_nifti(nii)
        vol = np.transpose(vol, (2, 0, 1))  # (H, W, D) -> (D, H, W), ``:681``
        fundus = resize_image(fundus / 255.0, self.cfg.fundus_size)
        vol = resize_volume(vol, self.cfg.oct_size) / 255.0
        fundus = np.clip(fundus, 0.0, 1.0).astype(np.float32)
        vol = np.clip(vol, 0.0, 1.0).astype(np.float32)
        if self.cache:
            try:
                np.savez_compressed(cache_path, fundus=fundus, oct=vol)
            except OSError:
                pass
        return fundus, vol

    def get(self, index: int, epoch: int = 0) -> Dict[str, np.ndarray]:
        sid, one_hot = self.samples[index]
        fundus, vol = self._load_raw(sid)
        rng = sample_rng(self.cfg.seed, epoch, index)
        if self.cfg.device_noise:
            if self.mode == "train":
                fundus = fundus_train_augment(
                    fundus,
                    rng,
                    jitter_prob=self.cfg.color_jitter_prob,
                    grayscale_prob=self.cfg.grayscale_prob,
                    hflip_prob=self.cfg.hflip_prob,
                    jitter_strength=self.cfg.color_jitter_strength,
                )
                vol = oct_train_augment(vol, rng, self.cfg.hflip_prob)
            return {
                "fundus": fundus,
                "oct": vol,
                "label": np.int32(np.argmax(one_hot)),
            }
        views = make_noise_views(fundus, vol, self.cfg.noise, rng)
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
        views["label"] = np.int32(np.argmax(one_hot))
        return views
