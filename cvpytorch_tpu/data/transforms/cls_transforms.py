"""Classification transforms (reference: src/data/transforms/cls_transforms.py,
444 LoC).  Host-side numpy/OpenCV ops over the sample dict
``{'image': HWC uint8 BGR ndarray, 'target': int}`` — same names/kwargs as
the reference YAML ``TRANSFORMS:`` blocks so configs run unchanged.

TPU difference: ``ToTensor`` produces float32 **HWC** (NHWC batches feed the
Flax models directly), RGB, /255 — the reference produced CHW torch tensors
(reference: cls_transforms.py ToTensor).
"""
from __future__ import annotations

import random
from typing import Sequence

import cv2
import numpy as np


class Compose:
    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, sample):
        for t in self.transforms:
            sample = t(sample)
        return sample


class Resize:
    def __init__(self, size, keep_ratio: bool = False):
        self.size = tuple(size)  # (h, w)
        self.keep_ratio = keep_ratio

    def __call__(self, sample):
        img = sample["image"]
        h, w = self.size
        if self.keep_ratio:
            ih, iw = img.shape[:2]
            scale = min(h / ih, w / iw)
            nh, nw = int(round(ih * scale)), int(round(iw * scale))
            resized = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
            out = np.zeros((h, w, img.shape[2]), dtype=img.dtype)
            out[:nh, :nw] = resized
            sample["image"] = out
        else:
            sample["image"] = cv2.resize(img, (w, h), interpolation=cv2.INTER_LINEAR)
        return sample


class RandomResizedCrop:
    """(reference: cls_transforms.py:108)"""

    def __init__(self, size, scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3),
                 keep_ratio: bool = False):
        self.size = tuple(size)
        self.scale = scale
        self.ratio = ratio

    def __call__(self, sample):
        img = sample["image"]
        ih, iw = img.shape[:2]
        area = ih * iw
        for _ in range(10):
            target_area = random.uniform(*self.scale) * area
            aspect = np.exp(random.uniform(np.log(self.ratio[0]), np.log(self.ratio[1])))
            w = int(round(np.sqrt(target_area * aspect)))
            h = int(round(np.sqrt(target_area / aspect)))
            if 0 < w <= iw and 0 < h <= ih:
                x0 = random.randint(0, iw - w)
                y0 = random.randint(0, ih - h)
                crop = img[y0:y0 + h, x0:x0 + w]
                sample["image"] = cv2.resize(
                    crop, (self.size[1], self.size[0]), interpolation=cv2.INTER_LINEAR
                )
                return sample
        # fallback: center crop
        return CenterCrop(self.size)(Resize((max(self.size), max(self.size)))(sample))


class CenterCrop:
    """(reference: cls_transforms.py:327)"""

    def __init__(self, size):
        self.size = tuple(size)

    def __call__(self, sample):
        img = sample["image"]
        ih, iw = img.shape[:2]
        h, w = self.size
        if ih < h or iw < w:
            img = cv2.resize(img, (max(w, iw), max(h, ih)))
            ih, iw = img.shape[:2]
        y0 = (ih - h) // 2
        x0 = (iw - w) // 2
        sample["image"] = img[y0:y0 + h, x0:x0 + w]
        return sample


class RandomHorizontalFlip:
    def __init__(self, p: float = 0.5):
        self.p = p

    def __call__(self, sample):
        if random.random() < self.p:
            sample["image"] = np.ascontiguousarray(sample["image"][:, ::-1])
        return sample


class RandomVerticalFlip:
    def __init__(self, p: float = 0.5):
        self.p = p

    def __call__(self, sample):
        if random.random() < self.p:
            sample["image"] = np.ascontiguousarray(sample["image"][::-1])
        return sample


class RandomRotation:
    def __init__(self, degrees=10, p: float = 0.5):
        self.degrees = degrees if isinstance(degrees, (list, tuple)) else (-degrees, degrees)
        self.p = p

    def __call__(self, sample):
        if random.random() < self.p:
            img = sample["image"]
            h, w = img.shape[:2]
            angle = random.uniform(*self.degrees)
            m = cv2.getRotationMatrix2D((w / 2, h / 2), angle, 1.0)
            sample["image"] = cv2.warpAffine(img, m, (w, h))
        return sample


class ColorJitter:
    """HSV-space jitter (reference: cls_transforms.py ColorJitter)."""

    def __init__(self, p=0.5, brightness=0.125, contrast=(0.5, 1.5),
                 saturation=(0.5, 1.5), hue=0.07):
        self.p = p
        self.brightness = brightness
        self.contrast = contrast
        self.saturation = saturation
        self.hue = hue

    def __call__(self, sample):
        if random.random() >= self.p:
            return sample
        img = sample["image"].astype(np.float32)
        if self.brightness:
            img += random.uniform(-self.brightness, self.brightness) * 255.0
        if self.contrast:
            img *= random.uniform(*self.contrast)
        img = np.clip(img, 0, 255).astype(np.uint8)
        if self.saturation or self.hue:
            hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV).astype(np.float32)
            if self.saturation:
                hsv[..., 1] *= random.uniform(*self.saturation)
            if self.hue:
                hsv[..., 0] += random.uniform(-self.hue, self.hue) * 180.0
                hsv[..., 0] %= 180.0
            hsv[..., 1:] = np.clip(hsv[..., 1:], 0, 255)
            img = cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2BGR)
        sample["image"] = img
        return sample


class RGB2BGR:
    """(reference: cls_transforms.py:432)"""

    def __call__(self, sample):
        sample["image"] = np.ascontiguousarray(sample["image"][..., ::-1])
        return sample


class ToTensor:
    """BGR uint8 HWC → RGB float32 HWC in [0,1] (NHWC for TPU)."""

    def __call__(self, sample):
        img = sample["image"][..., ::-1]  # BGR → RGB
        sample["image"] = np.ascontiguousarray(img, dtype=np.float32) / 255.0
        if sample.get("target") is not None:
            sample["target"] = np.asarray(sample["target"], dtype=np.int32)
        return sample


class Normalize:
    def __init__(self, mean, std):
        self.mean = np.asarray(mean, dtype=np.float32)
        self.std = np.asarray(std, dtype=np.float32)

    def __call__(self, sample):
        sample["image"] = (sample["image"] - self.mean) / self.std
        return sample


CLS_TRANSFORMS = {
    "Resize": Resize,
    "RandomResizedCrop": RandomResizedCrop,
    "CenterCrop": CenterCrop,
    "RandomHorizontalFlip": RandomHorizontalFlip,
    "RandomVerticalFlip": RandomVerticalFlip,
    "RandomRotation": RandomRotation,
    "ColorJitter": ColorJitter,
    "RGB2BGR": RGB2BGR,
    "ToTensor": ToTensor,
    "Normalize": Normalize,
}
