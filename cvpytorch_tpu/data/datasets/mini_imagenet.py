"""Mini-ImageNet classification dataset
(reference: src/data/datasets/mini-imagenet.py:26-123).

INDICES file: lines of ``relative/path.jpg <label_id>``; images under
``IMG_DIR``.  Optional RAM cache (reference caches decoded images with an
8-proc pool, coco.py:143-169 — here a simple lazy dict since host decode
overlaps device compute through the prefetching loader)."""
from __future__ import annotations

import os

import cv2
import numpy as np

from ...registry import DATASETS
from .base import Dataset


@DATASETS.register(name="MiniImageNetClassification")
class MiniImageNetClassification(Dataset):
    def __init__(self, data_cfg=None, dictionary=None, transform=None,
                 target_transform=None, stage="train"):
        super().__init__(data_cfg, dictionary, transform, target_transform, stage)
        self.is_cache = bool(getattr(data_cfg, "CACHE", False))
        self._cache: dict[int, np.ndarray] = {}

        self._imgs: list[str] = []
        self._targets: list[int] = []
        img_dir = data_cfg.IMG_DIR
        if stage == "infer":
            if data_cfg.INDICES:
                with open(data_cfg.INDICES) as fd:
                    self._imgs = [os.path.join(img_dir, l.strip()) for l in fd if l.strip()]
            else:
                for root, _, files in sorted(os.walk(img_dir)):
                    for f in sorted(files):
                        if f.lower().endswith((".jpg", ".jpeg", ".png")):
                            self._imgs.append(os.path.join(root, f))
        else:
            assert data_cfg.INDICES, "INDICES file required for train/val"
            with open(data_cfg.INDICES) as fd:
                for line in fd:
                    line = line.strip()
                    if not line:
                        continue
                    path, tgt = line.split(" ")
                    self._imgs.append(os.path.join(img_dir, path))
                    self._targets.append(int(tgt))
        if not self._imgs:
            raise RuntimeError(f"Found 0 images under {img_dir}")

    def __len__(self):
        return len(self._imgs)

    def _read(self, idx: int) -> np.ndarray:
        if self.is_cache and idx in self._cache:
            return self._cache[idx]
        img = cv2.imread(self._imgs[idx])  # BGR, matches reference convention
        if img is None:
            raise IOError(f"failed to read {self._imgs[idx]}")
        if self.is_cache:
            self._cache[idx] = img
        return img

    def __getitem__(self, idx: int) -> dict:
        sample = {
            "image": self._read(idx),
            "target": None if self.stage == "infer" else self._targets[idx],
        }
        if self.transform:
            sample = self.transform(sample)
        return sample


@DATASETS.register(name="FolderClassification", aliases=("ImagenetClassification",))
class FolderClassification(Dataset):
    """ImageFolder-style: IMG_DIR/<class_name>/*.jpg
    (reference: imagenet.py:22, hymenoptera.py:22)."""

    def __init__(self, data_cfg=None, dictionary=None, transform=None,
                 target_transform=None, stage="train"):
        super().__init__(data_cfg, dictionary, transform, target_transform, stage)
        self._imgs, self._targets = [], []
        for cls_name in sorted(os.listdir(data_cfg.IMG_DIR)):
            cls_dir = os.path.join(data_cfg.IMG_DIR, cls_name)
            if not os.path.isdir(cls_dir):
                continue
            label = self.name2id.get(cls_name)
            if label is None:
                continue
            for f in sorted(os.listdir(cls_dir)):
                if f.lower().endswith((".jpg", ".jpeg", ".png")):
                    self._imgs.append(os.path.join(cls_dir, f))
                    self._targets.append(label)
        if not self._imgs:
            raise RuntimeError(f"Found 0 images under {data_cfg.IMG_DIR}")

    def __len__(self):
        return len(self._imgs)

    def __getitem__(self, idx):
        sample = {"image": cv2.imread(self._imgs[idx]),
                  "target": None if self.stage == "infer" else self._targets[idx]}
        if self.transform:
            sample = self.transform(sample)
        return sample
