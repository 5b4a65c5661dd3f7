"""Synthetic datasets for tests and benchmarking without real data on disk.

The reference has nothing like this (its test scripts hard-code the author's
local datasets, SURVEY §4); deterministic synthetic data is what makes this
framework's test suite and bench self-contained."""
from __future__ import annotations

import numpy as np

from ...registry import DATASETS
from .base import Dataset


@DATASETS.register(name="SyntheticClassification")
class SyntheticClassification(Dataset):
    """Class-conditional Gaussian blobs; learnable in a few steps."""

    def __init__(self, data_cfg=None, dictionary=None, transform=None,
                 target_transform=None, stage="train"):
        super().__init__(data_cfg, dictionary, transform, target_transform, stage)
        self.length = int(getattr(data_cfg, "LENGTH", None) or 256)
        size = getattr(data_cfg, "SIZE", None) or [64, 64]
        self.size = tuple(size)
        self.n_cls = max(len(self.dictionary), 2)
        self._rng = np.random.RandomState(
            int(getattr(data_cfg, "SEED", None) or 0) + (1 if stage != "train" else 0)
        )
        self._targets = self._rng.randint(0, self.n_cls, size=self.length)
        self._seeds = self._rng.randint(0, 2**31 - 1, size=self.length)

    def __len__(self):
        return self.length

    def __getitem__(self, idx):
        rng = np.random.RandomState(self._seeds[idx])
        t = int(self._targets[idx])
        # distinct mean per class + structured stripe so convs have signal
        img = rng.randint(0, 40, (*self.size, 3)).astype(np.uint8)
        img = img + np.uint8(40 * t)
        img[:, :: (t + 2), :] = 255
        sample = {"image": img, "target": None if self.stage == "infer" else t}
        if self.transform:
            sample = self.transform(sample)
        return sample


@DATASETS.register(name="SyntheticSegmentation")
class SyntheticSegmentation(Dataset):
    """Images with colored rectangles; mask = rectangle class ids."""

    def __init__(self, data_cfg=None, dictionary=None, transform=None,
                 target_transform=None, stage="train"):
        super().__init__(data_cfg, dictionary, transform, target_transform, stage)
        self.length = int(getattr(data_cfg, "LENGTH", None) or 64)
        size = getattr(data_cfg, "SIZE", None) or [64, 64]
        self.size = tuple(size)
        self.n_cls = max(len(self.dictionary), 2)
        self._rng = np.random.RandomState(
            int(getattr(data_cfg, "SEED", None) or 0) + (1 if stage != "train" else 0)
        )
        self._seeds = self._rng.randint(0, 2**31 - 1, size=self.length)

    def __len__(self):
        return self.length

    def __getitem__(self, idx):
        rng = np.random.RandomState(self._seeds[idx])
        h, w = self.size
        img = rng.randint(0, 30, (h, w, 3)).astype(np.uint8)
        mask = np.zeros((h, w), dtype=np.uint8)
        for cls in range(1, self.n_cls):
            if rng.rand() < 0.8:
                x0, y0 = rng.randint(0, w // 2), rng.randint(0, h // 2)
                bw, bh = rng.randint(w // 8, w // 2), rng.randint(h // 8, h // 2)
                img[y0:y0 + bh, x0:x0 + bw] = 50 * cls
                mask[y0:y0 + bh, x0:x0 + bw] = cls
        sample = {"image": img,
                  "target": None if self.stage == "infer" else mask}
        if self.transform:
            sample = self.transform(sample)
        return sample


@DATASETS.register(name="SyntheticDetection")
class SyntheticDetection(Dataset):
    """Images with colored boxes; targets = padded boxes/labels/mask dict."""

    def __init__(self, data_cfg=None, dictionary=None, transform=None,
                 target_transform=None, stage="train"):
        super().__init__(data_cfg, dictionary, transform, target_transform, stage)
        self.length = int(getattr(data_cfg, "LENGTH", None) or 64)
        size = getattr(data_cfg, "SIZE", None) or [128, 128]
        self.size = tuple(size)
        self.n_cls = max(len(self.dictionary), 2)
        self.max_boxes = int(getattr(data_cfg, "MAX_BOXES", None) or 8)
        self._rng = np.random.RandomState(
            int(getattr(data_cfg, "SEED", None) or 0) + (1 if stage != "train" else 0)
        )
        self._seeds = self._rng.randint(0, 2**31 - 1, size=self.length)
        self.load_num = int(getattr(data_cfg, "LOAD_NUM", None) or 1) \
            if stage == "train" else 1

    def __len__(self):
        return self.length

    def __getitem__(self, idx):
        if self.load_num > 1:
            import random as _random

            group = [self._load_one(i) for i in
                     [idx] + [_random.randrange(self.length)
                              for _ in range(self.load_num - 1)]]
            return self.transform(group) if self.transform else group
        sample = self._load_one(idx)
        return self.transform(sample) if self.transform else sample

    def _load_one(self, idx):
        rng = np.random.RandomState(self._seeds[idx])
        h, w = self.size
        img = rng.randint(0, 30, (h, w, 3)).astype(np.uint8)
        n = rng.randint(1, min(self.max_boxes, 5) + 1)
        boxes, labels = [], []
        for _ in range(n):
            cls = rng.randint(0, self.n_cls)
            bw = rng.randint(w // 8, w // 3)
            bh = rng.randint(h // 8, h // 3)
            x0 = rng.randint(0, w - bw)
            y0 = rng.randint(0, h - bh)
            # 60 + 80·cls: class 0 sits at 60 vs the 0-30 background noise
            # (the old 40·(cls+1) left class 0 at 40 — barely separable
            # from background once HSV jitter + warp resampling smear it,
            # measured as AP_thing ≈ 0 in the 640² device-aug proof)
            img[y0:y0 + bh, x0:x0 + bw] = (60 + 80 * cls) % 255
            boxes.append([x0, y0, x0 + bw, y0 + bh])
            labels.append(cls)
        target = {
            "boxes": np.asarray(boxes, dtype=np.float32),
            "labels": np.asarray(labels, dtype=np.int32),
        }
        return {"image": img,
                "target": None if self.stage == "infer" else target}


@DATASETS.register(name="SyntheticInstanceSegmentation")
class SyntheticInstanceSegmentation(SyntheticDetection):
    """Detection boxes + axis-aligned rectangular instance masks
    rasterized at MASK_SIZE over the full image canvas (the same target
    contract as CocoSegmentation — coco.py:171-199)."""

    MASK_SIZE = 64

    def __init__(self, data_cfg=None, dictionary=None, transform=None,
                 target_transform=None, stage="train"):
        super().__init__(data_cfg, dictionary, transform, target_transform,
                         stage)
        self.mask_size = int(getattr(data_cfg, "MASK_SIZE", None)
                             or self.MASK_SIZE)

    def _load_one(self, idx):
        sample = super()._load_one(idx)
        t = sample["target"]
        if t is not None:
            h, w = self.size
            s = self.mask_size
            masks = np.zeros((len(t["boxes"]), s, s), np.float32)
            for i, (x0, y0, x1, y1) in enumerate(t["boxes"]):
                mx0 = int(round(x0 * s / w))
                mx1 = int(round(x1 * s / w))
                my0 = int(round(y0 * s / h))
                my1 = int(round(y1 * s / h))
                masks[i, my0:my1, mx0:mx1] = 1.0
            t["masks"] = masks
        return sample
