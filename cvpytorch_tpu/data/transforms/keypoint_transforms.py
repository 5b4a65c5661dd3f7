"""Keypoint transforms (reference: src/data/transforms/keypoint_transforms.py,
755 LoC).  Samples: ``{'image': HWC uint8 BGR, 'target': {'boxes': (N,4)
xyxy px, 'labels': (N,), 'keypoints': (N,K,3) [x,y,vis]}}``.

Geometry ops move boxes AND keypoints together; a keypoint pushed outside
the frame gets its visibility zeroed (the reference keeps stale coords —
reference :106-133 — which poisons heatmap rendering; we zero vis instead).
The reference's letterbox adds ``top`` to keypoint *x* and ``left`` to *y*
(reference :198-201, a transposition slip); here pads are applied on the
matching axes.
"""
from __future__ import annotations

import math
import random

import cv2
import numpy as np

from .cls_transforms import Compose  # noqa: F401  (re-export)
from .det_transforms import Normalize, ToTensor  # noqa: F401  (re-export)


def _kps(target):
    k = target.get("keypoints")
    return k if k is not None and k.shape[0] else None


def _zero_outside(keypoints, w, h):
    """Zero the visibility flag of keypoints outside [0,w)×[0,h)."""
    x, y = keypoints[..., 0], keypoints[..., 1]
    inside = (x >= 0) & (x < w) & (y >= 0) & (y < h)
    keypoints[..., 2] = np.where(inside, keypoints[..., 2], 0.0)
    return keypoints


class RandomHorizontalFlip:
    """Mirror image/boxes/keypoints (reference: keypoint_transforms.py:106).

    ``flip_pairs`` optionally swaps chiral joints (e.g. COCO left/right
    shoulder) so 'left_*' semantics survive the mirror — the reference
    omits this; pass ``None`` for bit-parity with it."""

    COCO_PAIRS = ((1, 2), (3, 4), (5, 6), (7, 8), (9, 10), (11, 12),
                  (13, 14), (15, 16))

    def __init__(self, p=0.5, flip_pairs="coco"):
        self.p = p
        self.flip_pairs = self.COCO_PAIRS if flip_pairs == "coco" \
            else flip_pairs

    def __call__(self, sample):
        if random.random() >= self.p:
            return sample
        img = sample["image"]
        t = sample["target"]
        w = img.shape[1]
        if t.get("boxes") is not None and len(t["boxes"]):
            b = t["boxes"]
            b[:, [0, 2]] = w - 1 - b[:, [2, 0]]
        k = _kps(t)
        if k is not None:
            k[..., 0] = w - 1.0 - k[..., 0]
            if self.flip_pairs:
                for a, b_ in self.flip_pairs:
                    k[:, [a, b_]] = k[:, [b_, a]]
            t["keypoints"] = k
        sample["image"] = cv2.flip(img, 1)
        return sample


class RandomVerticalFlip:
    """(reference: keypoint_transforms.py:134)"""

    def __init__(self, p=0.5):
        self.p = p

    def __call__(self, sample):
        if random.random() >= self.p:
            return sample
        img = sample["image"]
        t = sample["target"]
        h = img.shape[0]
        if t.get("boxes") is not None and len(t["boxes"]):
            b = t["boxes"]
            b[:, [1, 3]] = h - 1 - b[:, [3, 1]]
        k = _kps(t)
        if k is not None:
            k[..., 1] = h - 1.0 - k[..., 1]
        sample["image"] = cv2.flip(img, 0)
        return sample


class Resize:
    """Letterbox resize carrying boxes + keypoints; records pads/scales
    like the det Resize (reference: keypoint_transforms.py:162-227)."""

    def __init__(self, size, keep_ratio=True, scaleup=True,
                 fill=(128, 128, 128)):
        self.size = list(size) if isinstance(size, (list, tuple)) \
            else [size, size]
        self.keep_ratio = keep_ratio
        self.scaleup = scaleup
        self.fill = tuple(fill)

    def __call__(self, sample):
        img = sample["image"]
        t = sample["target"]
        h, w = img.shape[:2]
        if self.keep_ratio:
            scale = min(self.size[0] / h, self.size[1] / w)
            if not self.scaleup:
                scale = min(scale, 1.0)
            oh, ow = int(round(h * scale)), int(round(w * scale))
            padh, padw = (self.size[0] - oh) / 2, (self.size[1] - ow) / 2
            if (h, w) != (oh, ow):
                img = cv2.resize(img, (ow, oh),
                                 interpolation=cv2.INTER_LINEAR)
            top, bottom = int(round(padh - 0.1)), int(round(padh + 0.1))
            left, right = int(round(padw - 0.1)), int(round(padw + 0.1))
            img = cv2.copyMakeBorder(img, top, bottom, left, right,
                                     cv2.BORDER_CONSTANT, value=self.fill)
            sx = sy = scale
            ox, oy = left, top
        else:
            sy, sx = self.size[0] / h, self.size[1] / w
            img = cv2.resize(img, (self.size[1], self.size[0]),
                             interpolation=cv2.INTER_LINEAR)
            ox = oy = 0
        if t.get("boxes") is not None and len(t["boxes"]):
            b = t["boxes"]
            b[:, 0::2] = b[:, 0::2] * sx + ox
            b[:, 1::2] = b[:, 1::2] * sy + oy
        k = _kps(t)
        if k is not None:
            k[..., 0] = k[..., 0] * sx + ox
            k[..., 1] = k[..., 1] * sy + oy
        t["pads"] = np.array([ox, oy], np.float32)
        t["scales"] = np.array([sx, sy], np.float32)
        sample["image"] = img
        return sample


class RandomResizedCrop:
    """torchvision-style area/aspect crop then resize; boxes clipped,
    off-crop keypoints lose visibility
    (reference: keypoint_transforms.py:398-610)."""

    def __init__(self, size, scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3),
                 keep_ratio=True, fill=(128, 128, 128), min_size=3):
        self.size = list(size) if isinstance(size, (list, tuple)) \
            else [size, size]
        self.scale, self.ratio = scale, ratio
        self.resize = Resize(self.size, keep_ratio, True, fill)
        self.min_size = min_size

    def _params(self, h, w):
        area = h * w
        log_r = (math.log(self.ratio[0]), math.log(self.ratio[1]))
        for _ in range(10):
            ta = area * random.uniform(*self.scale)
            ar = math.exp(random.uniform(*log_r))
            cw = int(round(math.sqrt(ta * ar)))
            ch = int(round(math.sqrt(ta / ar)))
            if 0 < cw <= w and 0 < ch <= h:
                return (random.randint(0, h - ch), random.randint(0, w - cw),
                        ch, cw)
        in_ratio = w / h
        if in_ratio < min(self.ratio):
            cw, ch = w, int(round(w / min(self.ratio)))
        elif in_ratio > max(self.ratio):
            ch, cw = h, int(round(h * max(self.ratio)))
        else:
            cw, ch = w, h
        return (h - ch) // 2, (w - cw) // 2, ch, cw

    def __call__(self, sample):
        img = sample["image"]
        t = sample["target"]
        h, w = img.shape[:2]
        i, j, ch, cw = self._params(h, w)
        sample["image"] = img[i:i + ch, j:j + cw]
        if t.get("boxes") is not None and len(t["boxes"]):
            b = t["boxes"].copy()
            b[:, [0, 2]] = (b[:, [0, 2]] - j).clip(0, cw)
            b[:, [1, 3]] = (b[:, [1, 3]] - i).clip(0, ch)
            keep = ((b[:, 2] - b[:, 0]) >= self.min_size) & \
                   ((b[:, 3] - b[:, 1]) >= self.min_size)
            t["boxes"] = b[keep]
            t["labels"] = t["labels"][keep]
            if t.get("areas") is not None and len(t["areas"]):
                t["areas"] = t["areas"][keep]
            if t.get("keypoints") is not None and len(t["keypoints"]):
                k = t["keypoints"][keep].copy()
                k[..., 0] -= j
                k[..., 1] -= i
                t["keypoints"] = _zero_outside(k, cw, ch)
        return self.resize(sample)


class CropWithFactor:
    """Scale the short side to ``size`` then zero-pad H/W up to multiples
    of ``factor`` (reference: keypoint_transforms.py:612-643 — the OpenPose
    multi-of-32 eval convention)."""

    def __init__(self, size=None, factor=32, is_ceil=True):
        self.size, self.factor, self.is_ceil = size, factor, is_ceil

    def _closest(self, n):
        f = math.ceil if self.is_ceil else math.floor
        return int(f(n / self.factor)) * self.factor

    def __call__(self, sample):
        img = sample["image"]
        t = sample["target"]
        h, w = img.shape[:2]
        s = float(self.size) / min(h, w)
        img = cv2.resize(img, None, fx=s, fy=s)
        h2, w2 = img.shape[:2]
        out = np.zeros((self._closest(h2), self._closest(w2), img.shape[2]),
                       img.dtype)
        out[:h2, :w2] = img
        if t.get("boxes") is not None and len(t["boxes"]):
            t["boxes"] = t["boxes"] * s
        k = _kps(t)
        if k is not None:
            k[..., :2] *= s
        t["pads"] = np.array([0.0, 0.0], np.float32)
        t["scales"] = np.array([s, s], np.float32)
        sample["image"] = out
        return sample


KEYPOINT_TRANSFORMS = {
    "Resize": Resize,
    "RandomHorizontalFlip": RandomHorizontalFlip,
    "RandomVerticalFlip": RandomVerticalFlip,
    "RandomResizedCrop": RandomResizedCrop,
    "CropWithFactor": CropWithFactor,
    "ToTensor": ToTensor,
    "Normalize": Normalize,
}
