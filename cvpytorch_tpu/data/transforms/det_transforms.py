"""Detection transforms (reference: src/data/transforms/det_transforms.py,
1728 LoC).  Samples: ``{'image': HWC uint8 BGR,
'target': {'boxes': (N,4) xyxy pixels float32, 'labels': (N,) int}}``.

Letterbox ``Resize`` records ``pads``/``scales`` for un-letterboxing at
eval (reference :162-208; stored here as (left, top) / (sw, sh) to match
``ops.boxes.unletterbox_boxes``).  Mosaic4 + random-affine mirror
reference :814-955 on host; the device-side fused version lives in
``ops/``.  ``det_collate`` pads targets to MAX_BOXES with a validity mask
— the fixed-shape replacement for ``trans_specific_format``'s row list
(reference: yolov5.py:218-244).
"""
from __future__ import annotations

import math
import random

import cv2
import numpy as np

from .cls_transforms import Compose  # noqa: F401  (re-export)


class Resize:
    """Letterbox resize (reference: det_transforms.py:162)."""

    def __init__(self, size, keep_ratio=True, scaleup=True, fill=(114, 114, 114)):
        self.size = list(size) if isinstance(size, (list, tuple)) else [size, size]
        self.keep_ratio = keep_ratio
        self.scaleup = scaleup
        self.fill = tuple(fill)

    def __call__(self, sample):
        img = sample["image"]
        target = sample.get("target")
        h, w = img.shape[:2]
        if self.keep_ratio:
            scale = min(self.size[0] / h, self.size[1] / w)
            if not self.scaleup:
                scale = min(scale, 1.0)
            oh, ow = int(round(h * scale)), int(round(w * scale))
            padh, padw = (self.size[0] - oh) / 2, (self.size[1] - ow) / 2
            if (h, w) != (oh, ow):
                img = cv2.resize(img, (ow, oh), interpolation=cv2.INTER_LINEAR)
            top, bottom = int(round(padh - 0.1)), int(round(padh + 0.1))
            left, right = int(round(padw - 0.1)), int(round(padw + 0.1))
            img = cv2.copyMakeBorder(img, top, bottom, left, right,
                                     cv2.BORDER_CONSTANT, value=self.fill)
            if target is not None:
                boxes = target["boxes"]
                if len(boxes):
                    boxes = boxes * scale + np.array([left, top, left, top],
                                                    np.float32)
                target["boxes"] = boxes
                target["pads"] = np.array([left, top], np.float32)
                target["scales"] = np.array([scale, scale], np.float32)
        else:
            sh, sw = self.size[0] / h, self.size[1] / w
            img = cv2.resize(img, (self.size[1], self.size[0]),
                             interpolation=cv2.INTER_LINEAR)
            if target is not None:
                boxes = target["boxes"]
                if len(boxes):
                    boxes = boxes * np.array([sw, sh, sw, sh], np.float32)
                target["boxes"] = boxes
                target["pads"] = np.array([0.0, 0.0], np.float32)
                target["scales"] = np.array([sw, sh], np.float32)
        sample["image"] = img
        sample["target"] = target
        return sample


class RandomHorizontalFlip:
    """(reference: det_transforms.py:123)"""

    def __init__(self, p=0.5):
        self.p = p

    def __call__(self, sample):
        if random.random() < self.p:
            img = sample["image"]
            w = img.shape[1]
            sample["image"] = np.ascontiguousarray(img[:, ::-1])
            t = sample.get("target")
            if t is not None and len(t["boxes"]):
                boxes = t["boxes"].copy()
                boxes[:, [0, 2]] = w - t["boxes"][:, [2, 0]]
                t["boxes"] = boxes
        return sample


class ColorHSV:
    """HSV LUT jitter (reference: det_transforms.py:628)."""

    def __init__(self, p=0.5, hue=0.015, saturation=0.7, value=0.4):
        self.p = p
        self.gains = (hue, saturation, value)

    def __call__(self, sample):
        if random.random() >= self.p:
            return sample
        img = sample["image"]
        r = np.random.uniform(-1, 1, 3) * self.gains + 1
        hue, sat, val = cv2.split(cv2.cvtColor(img, cv2.COLOR_BGR2HSV))
        x = np.arange(256, dtype=r.dtype)
        lut_h = ((x * r[0]) % 180).astype(img.dtype)
        lut_s = np.clip(x * r[1], 0, 255).astype(img.dtype)
        lut_v = np.clip(x * r[2], 0, 255).astype(img.dtype)
        hsv = cv2.merge((cv2.LUT(hue, lut_h), cv2.LUT(sat, lut_s),
                         cv2.LUT(val, lut_v)))
        sample["image"] = cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)
        return sample


def _box_candidates(old, new, wh_thr=2, ar_thr=20, area_thr=0.1):
    """Filter degenerate boxes after warp (reference: det_transforms.py:806)."""
    w1, h1 = old[:, 2] - old[:, 0], old[:, 3] - old[:, 1]
    w2, h2 = new[:, 2] - new[:, 0], new[:, 3] - new[:, 1]
    ar = np.maximum(w2 / (h2 + 1e-16), h2 / (w2 + 1e-16))
    return (w2 > wh_thr) & (h2 > wh_thr) & \
        (w2 * h2 / (w1 * h1 + 1e-16) > area_thr) & (ar < ar_thr)


def _range(v, center=0.0):
    """Accept scalar s (→ uniform(center−s, center+s)) or [lo, hi] pair —
    the reference YAML uses both forms (conf/coco_yolov5_s.yml:29)."""
    if isinstance(v, (list, tuple)):
        return random.uniform(v[0], v[1])
    return random.uniform(center - v, center + v)


def random_perspective(img, boxes, labels, degrees=0.0, translate=0.1,
                       scale=0.5, shear=0.0, perspective=0.0, border=(0, 0),
                       fill=(114, 114, 114)):
    """Random affine warp of image+boxes (reference: det_transforms.py:814)."""
    height = img.shape[0] + border[0] * 2
    width = img.shape[1] + border[1] * 2

    C = np.eye(3)
    C[0, 2] = -img.shape[1] / 2
    C[1, 2] = -img.shape[0] / 2
    R = np.eye(3)
    a = _range(degrees)
    s = _range(scale, center=1.0) if not isinstance(scale, (list, tuple)) \
        else random.uniform(scale[0], scale[1])
    R[:2] = cv2.getRotationMatrix2D(angle=a, center=(0, 0), scale=s)
    S = np.eye(3)
    S[0, 1] = math.tan(_range(shear) * math.pi / 180)
    S[1, 0] = math.tan(_range(shear) * math.pi / 180)
    T = np.eye(3)
    T[0, 2] = _range(translate, center=0.5) * width
    T[1, 2] = _range(translate, center=0.5) * height
    M = T @ S @ R @ C
    if (border[0] != 0) or (border[1] != 0) or (M != np.eye(3)).any():
        img = cv2.warpAffine(img, M[:2], dsize=(width, height),
                             borderValue=fill)
    n = len(boxes)
    if n:
        xy = np.ones((n * 4, 3))
        xy[:, :2] = boxes[:, [0, 1, 2, 3, 0, 3, 2, 1]].reshape(n * 4, 2)
        xy = xy @ M.T
        xy = xy[:, :2].reshape(n, 8)
        x = xy[:, [0, 2, 4, 6]]
        y = xy[:, [1, 3, 5, 7]]
        new = np.stack([x.min(1), y.min(1), x.max(1), y.max(1)], 1)
        new[:, [0, 2]] = new[:, [0, 2]].clip(0, width)
        new[:, [1, 3]] = new[:, [1, 3]].clip(0, height)
        keep = _box_candidates(boxes * s, new)
        boxes, labels = new[keep].astype(np.float32), labels[keep]
    return img, boxes, labels


class RandomAffine:
    """(reference: det_transforms.py:884 without mosaic)"""

    def __init__(self, p=1.0, degrees=0.0, translate=0.1, scale=0.5,
                 shear=0.0, perspective=0.0):
        self.p = p
        self.kw = dict(degrees=degrees, translate=translate, scale=scale,
                       shear=shear)

    def __call__(self, sample):
        if random.random() >= self.p:
            return sample
        t = sample.get("target")
        if t is None:
            return sample
        img, boxes, labels = random_perspective(
            sample["image"], t["boxes"], t["labels"], **self.kw)
        sample["image"] = img
        t["boxes"], t["labels"] = boxes, labels
        return sample


class RandomAffineWithMosaic(RandomAffine):
    """Mosaic-4 compose + affine (reference: det_transforms.py:884-1056).

    Requires the dataset to fetch LOAD_NUM samples per index (the sample is
    then a list); falls back to plain affine for single samples."""

    def __init__(self, p=1.0, degrees=0.0, translate=0.1, scale=0.5,
                 shear=0.0, perspective=0.0, fill=(114, 114, 114),
                 size=(640, 640)):
        super().__init__(p, degrees, translate, scale, shear)
        self.fill = tuple(fill)
        self.size = tuple(size) if isinstance(size, (list, tuple)) else (size, size)

    def __call__(self, samples):
        if isinstance(samples, dict):
            return super().__call__(samples)
        assert len(samples) == 4, "mosaic requires LOAD_NUM=4 samples"
        sh, sw = self.size
        yc = int(random.uniform(sh // 2, 2 * sh - sh // 2))
        xc = int(random.uniform(sw // 2, 2 * sw - sw // 2))
        canvas = np.full((sh * 2, sw * 2, 3), self.fill[0], np.uint8)
        all_boxes, all_labels = [], []
        for i, s in enumerate(samples):
            img = s["image"]
            h, w = img.shape[:2]
            if i == 0:  # top-left
                x1a, y1a, x2a, y2a = max(xc - w, 0), max(yc - h, 0), xc, yc
                x1b, y1b = w - (x2a - x1a), h - (y2a - y1a)
                x2b, y2b = w, h
            elif i == 1:  # top-right
                x1a, y1a, x2a, y2a = xc, max(yc - h, 0), min(xc + w, sw * 2), yc
                x1b, y1b, x2b, y2b = 0, h - (y2a - y1a), x2a - x1a, h
            elif i == 2:  # bottom-left
                x1a, y1a, x2a, y2a = max(xc - w, 0), yc, xc, min(sh * 2, yc + h)
                x1b, y1b, x2b, y2b = w - (x2a - x1a), 0, w, y2a - y1a
            else:  # bottom-right
                x1a, y1a, x2a, y2a = xc, yc, min(xc + w, sw * 2), min(sh * 2, yc + h)
                x1b, y1b, x2b, y2b = 0, 0, x2a - x1a, y2a - y1a
            canvas[y1a:y2a, x1a:x2a] = img[y1b:y2b, x1b:x2b]
            t = s.get("target")
            if t is not None and len(t["boxes"]):
                b = t["boxes"].copy()
                b[:, [0, 2]] += x1a - x1b
                b[:, [1, 3]] += y1a - y1b
                all_boxes.append(b)
                all_labels.append(t["labels"])
        boxes = np.concatenate(all_boxes, 0) if all_boxes else np.zeros((0, 4), np.float32)
        labels = np.concatenate(all_labels, 0) if all_labels else np.zeros((0,), np.int32)
        if len(boxes):
            boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, 2 * sw)
            boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, 2 * sh)
        img, boxes, labels = random_perspective(
            canvas, boxes, labels, border=(-sh // 2, -sw // 2),
            fill=self.fill, **self.kw)
        target = {"boxes": boxes.astype(np.float32),
                  "labels": labels.astype(np.int64),
                  "pads": np.array([0.0, 0.0], np.float32),
                  "scales": np.array([1.0, 1.0], np.float32)}
        return {"image": img, "target": target}


class ToTensor:
    """BGR→RGB float HWC /255 (reference det ToTensor :80)."""

    def __call__(self, sample):
        img = sample["image"][..., ::-1]
        sample["image"] = np.ascontiguousarray(img, dtype=np.float32) / 255.0
        t = sample.get("target")
        if t is not None:
            t["boxes"] = np.asarray(t["boxes"], np.float32).reshape(-1, 4)
            t["labels"] = np.asarray(t["labels"], np.int32).reshape(-1)
        return sample


class Normalize:
    def __init__(self, mean=(0.0, 0.0, 0.0), std=(1.0, 1.0, 1.0)):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def __call__(self, sample):
        sample["image"] = (sample["image"] - self.mean) / self.std
        return sample


class FilterAndRemapCocoCategories:
    """(reference: det_transforms.py:1556) — handled dataset-side here;
    kept as a config-compatible no-op."""

    def __init__(self, categories=None, remap=True):
        pass

    def __call__(self, sample):
        return sample


class GaussianBlur:
    """(reference: det_transforms.py:1287-1449 blur family)"""

    def __init__(self, p=0.01, ksize=5):
        self.p, self.ksize = p, ksize

    def __call__(self, sample):
        if random.random() < self.p:
            sample["image"] = cv2.GaussianBlur(
                sample["image"], (self.ksize | 1, self.ksize | 1), 0)
        return sample


class MedianBlur:
    def __init__(self, p=0.01, ksize=5):
        self.p, self.ksize = p, ksize

    def __call__(self, sample):
        if random.random() < self.p:
            sample["image"] = cv2.medianBlur(sample["image"], self.ksize | 1)
        return sample


class RandomGrayscale:
    def __init__(self, p=0.01):
        self.p = p

    def __call__(self, sample):
        if random.random() < self.p:
            g = cv2.cvtColor(sample["image"], cv2.COLOR_BGR2GRAY)
            sample["image"] = cv2.cvtColor(g, cv2.COLOR_GRAY2BGR)
        return sample


class Cutout:
    """(reference: det_transforms.py:1474)"""

    def __init__(self, p=0.5, scales=(0.125, 0.0625, 0.03125), fill=True):
        self.p = p
        self.scales = scales

    def __call__(self, sample):
        if random.random() >= self.p:
            return sample
        img = sample["image"]
        h, w = img.shape[:2]
        for s in self.scales:
            mh, mw = int(h * s), int(w * s)
            y = random.randint(0, h - 1)
            x = random.randint(0, w - 1)
            img[max(y - mh // 2, 0):min(y + mh // 2, h),
                max(x - mw // 2, 0):min(x + mw // 2, w)] = \
                [random.randint(64, 191) for _ in range(3)]
        sample["image"] = img
        return sample


class ConvertCocoPolysToMask:
    """(reference: det_transforms.py:1600) — box extraction happens in the
    COCO dataset here; config-compatible no-op."""

    def __init__(self, *a, **k):
        pass

    def __call__(self, sample):
        return sample


class ToCXCYWH:
    """(reference: det_transforms.py:683) — box layout conversion happens
    in-graph in the model loss (yolov5.py _normalized_targets), so the
    pipeline keeps xyxy pixels; config-compatible no-op."""

    def __init__(self, normalize=True):
        pass

    def __call__(self, sample):
        return sample


class ToXYXY(ToCXCYWH):
    """(reference: det_transforms.py:707) — no-op, boxes stay xyxy."""


class ToPercentCoords(ToCXCYWH):
    """(reference: det_transforms.py:672) — no-op, see ToCXCYWH."""



class MixUp:
    """Blend two consecutive samples (reference: det_transforms.py:1516).
    Works on list samples (LOAD_NUM=2) or caches the previous sample."""

    def __init__(self, p=0.15, alpha=32.0):
        self.p = p
        self.alpha = alpha
        self._prev = None

    def __call__(self, sample):
        if isinstance(sample, list):
            a, b = sample[0], sample[1]
        else:
            a, b = sample, self._prev
            self._prev = {"image": sample["image"].copy(),
                          "target": None if sample.get("target") is None else
                          {k: (v.copy() if hasattr(v, "copy") else v)
                           for k, v in sample["target"].items()}}
        if b is None or random.random() >= self.p:
            return a
        if a["image"].shape != b["image"].shape:
            return a
        lam = np.random.beta(self.alpha, self.alpha)
        img = (a["image"].astype(np.float32) * lam +
               b["image"].astype(np.float32) * (1 - lam))
        a["image"] = img.astype(a["image"].dtype)
        ta, tb = a.get("target"), b.get("target")
        if ta is not None and tb is not None:
            ta["boxes"] = np.concatenate([ta["boxes"], tb["boxes"]], 0)
            ta["labels"] = np.concatenate([ta["labels"], tb["labels"]], 0)
        return a


class CopyPaste:
    """(reference: det_transforms.py:1542 — the reference implementation
    is itself a stub; config-compatible no-op kept for parity)."""

    def __init__(self, *a, **k):
        pass

    def __call__(self, sample):
        return sample


DET_TRANSFORMS = {
    "Resize": Resize,
    "RandomHorizontalFlip": RandomHorizontalFlip,
    "ColorHSV": ColorHSV,
    "RandomAffine": RandomAffine,
    "RandomAffineWithMosaic": RandomAffineWithMosaic,
    "ToTensor": ToTensor,
    "Normalize": Normalize,
    "FilterAndRemapCocoCategories": FilterAndRemapCocoCategories,
    "ConvertCocoPolysToMask": ConvertCocoPolysToMask,
    "GaussianBlur": GaussianBlur,
    "MedianBlur": MedianBlur,
    "RandomGrayscale": RandomGrayscale,
    "Cutout": Cutout,
    "MixUp": MixUp,
    "CopyPaste": CopyPaste,
    "ToCXCYWH": ToCXCYWH,
    "ToXYXY": ToXYXY,
    "ToPercentCoords": ToPercentCoords,
}


def make_det_collate(max_boxes: int = 64):
    """Padded fixed-shape detection batch
    (replaces CocoDetection.collate_fn + trans_specific_format)."""

    def det_collate(samples):
        images = np.stack([s["image"] for s in samples])
        B = len(samples)
        boxes = np.zeros((B, max_boxes, 4), np.float32)
        labels = np.zeros((B, max_boxes), np.int32)
        valid = np.zeros((B, max_boxes), bool)
        pads = np.zeros((B, 2), np.float32)
        scales = np.ones((B, 2), np.float32)
        heights = np.zeros((B,), np.int32)
        widths = np.zeros((B,), np.int32)
        img_ids = np.zeros((B,), np.int64)
        for i, s in enumerate(samples):
            t = s.get("target")
            heights[i], widths[i] = s["image"].shape[:2]
            if t is None:
                continue
            n = min(len(t["boxes"]), max_boxes)
            if n:
                boxes[i, :n] = t["boxes"][:n]
                labels[i, :n] = t["labels"][:n]
                valid[i, :n] = True
            pads[i] = t.get("pads", (0, 0))
            scales[i] = t.get("scales", (1, 1))
            if "height" in t:
                heights[i] = t["height"]
            if "width" in t:
                widths[i] = t["width"]
            img_ids[i] = t.get("image_id", i)
        return {
            "image": images,
            "target": {
                "boxes": boxes, "labels": labels, "valid": valid,
                "pads": pads, "scales": scales,
                "height": heights, "width": widths,
            },
            "image_id": img_ids,
        }

    return det_collate
