"""Cityscapes semantic segmentation
(reference: src/data/datasets/cityscapes.py:26-152).

Directory layout: ``IMG_DIR/<split>/<city>/*_leftImg8bit.png`` with labels
``LABELS.SEG_DIR/<split>/<city>/*_gtFine_labelIds.png``; or an INDICES file
of ``img_rel_path label_rel_path`` pairs.  labelId→trainId encoding (19
classes, ignore=255) matches reference :92-100."""
from __future__ import annotations

import glob as globlib
import os

import cv2
import numpy as np

from ...registry import DATASETS
from .base import Dataset

# labelId → trainId (cityscapesscripts convention)
_VALID = {7: 0, 8: 1, 11: 2, 12: 3, 13: 4, 17: 5, 19: 6, 20: 7, 21: 8,
          22: 9, 23: 10, 24: 11, 25: 12, 26: 13, 27: 14, 28: 15, 31: 16,
          32: 17, 33: 18}
_LUT = np.full(256, 255, dtype=np.uint8)
for k, v in _VALID.items():
    _LUT[k] = v


def encode_labelid_to_trainid(mask: np.ndarray) -> np.ndarray:
    return _LUT[mask]


@DATASETS.register(name="CityscapesSegmentation")
class CityscapesSegmentation(Dataset):
    def __init__(self, data_cfg=None, dictionary=None, transform=None,
                 target_transform=None, stage="train"):
        super().__init__(data_cfg, dictionary, transform, target_transform, stage)
        self._imgs: list[str] = []
        self._masks: list[str] = []
        img_dir = data_cfg.IMG_DIR
        seg_dir = (data_cfg.LABELS.SEG_DIR if data_cfg.LABELS else None) or img_dir
        if data_cfg.INDICES:
            with open(data_cfg.INDICES) as fd:
                for line in fd:
                    line = line.strip()
                    if not line:
                        continue
                    parts = line.split(" ")
                    self._imgs.append(os.path.join(img_dir, parts[0]))
                    if len(parts) > 1:
                        self._masks.append(os.path.join(seg_dir, parts[1]))
        else:
            suffix = data_cfg.IMG_SUFFIX or "*_leftImg8bit.png"
            seg_suffix = (data_cfg.LABELS.SEG_SUFFIX
                          if data_cfg.LABELS else None) or "_gtFine_labelIds.png"
            for path in sorted(globlib.glob(
                    os.path.join(img_dir, "**", suffix), recursive=True)):
                self._imgs.append(path)
                rel = os.path.relpath(path, img_dir)
                mask_rel = rel.replace("_leftImg8bit.png", seg_suffix)
                self._masks.append(os.path.join(seg_dir, mask_rel))
        if not self._imgs:
            raise RuntimeError(f"Found 0 images under {img_dir}")

    def __len__(self):
        return len(self._imgs)

    def __getitem__(self, idx):
        img = cv2.imread(self._imgs[idx])
        if self.stage == "infer" or not self._masks:
            sample = {"image": img, "target": None, "id": self._imgs[idx]}
        else:
            mask = cv2.imread(self._masks[idx], cv2.IMREAD_GRAYSCALE)
            sample = {"image": img,
                      "target": encode_labelid_to_trainid(mask)}
        if self.transform:
            sample = self.transform(sample)
        return sample
