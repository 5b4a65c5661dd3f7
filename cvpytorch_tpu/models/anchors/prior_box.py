"""SSD prior boxes (reference: src/models/anchors/prior_box.py:7-55).

Vectorized numpy re-derivation of the reference's per-cell loop: for each
feature map, every cell emits a small square, a big (geometric-mean)
square, and a ±sqrt(ratio) rectangle pair per aspect ratio — cxcywh
relative to the image, optionally clipped to [0, 1].
"""
from __future__ import annotations

from math import sqrt
from typing import Sequence

import numpy as np


def ssd_prior_boxes(
    image_size: int = 300,
    feature_maps: Sequence[int] = (38, 19, 10, 5, 3, 1),
    min_sizes: Sequence[int] = (21, 45, 99, 153, 207, 261),
    max_sizes: Sequence[int] = (45, 99, 153, 207, 261, 315),
    strides: Sequence[int] = (8, 16, 32, 64, 100, 300),
    aspect_ratios: Sequence[Sequence[int]] = ((2,), (2, 3), (2, 3), (2, 3),
                                              (2,), (2,)),
    clip: bool = True,
) -> np.ndarray:
    """→ (num_priors, 4) cxcywh in [0, 1] — identical ordering to the
    reference's itertools.product loop (row-major cells, then
    small/big/ratio-pairs per cell)."""
    out = []
    for k, f in enumerate(feature_maps):
        scale = image_size / strides[k]
        ii, jj = np.meshgrid(np.arange(f), np.arange(f), indexing="ij")
        cx = (jj.reshape(-1) + 0.5) / scale
        cy = (ii.reshape(-1) + 0.5) / scale
        whs = [(min_sizes[k] / image_size,) * 2,
               (sqrt(min_sizes[k] * max_sizes[k]) / image_size,) * 2]
        s = min_sizes[k] / image_size
        for r in aspect_ratios[k]:
            rr = sqrt(r)
            whs.append((s * rr, s / rr))
            whs.append((s / rr, s * rr))
        wh = np.asarray(whs, np.float64)                   # (A, 2)
        cells = np.stack([cx, cy], -1)                     # (F², 2)
        boxes = np.concatenate([
            np.repeat(cells, len(wh), 0),
            np.tile(wh, (len(cells), 1)),
        ], -1)
        out.append(boxes)
    priors = np.concatenate(out, 0).astype(np.float32)
    if clip:
        priors = priors.clip(0.0, 1.0)
    return priors


class PriorBox:
    """Callable wrapper matching the reference class surface."""

    def __init__(self, image_size=300, feature_maps=(38, 19, 10, 5, 3, 1),
                 min_sizes=(21, 45, 99, 153, 207, 261),
                 max_sizes=(45, 99, 153, 207, 261, 315),
                 strides=(8, 16, 32, 64, 100, 300),
                 aspect_ratios=((2,), (2, 3), (2, 3), (2, 3), (2,), (2,)),
                 clip=True):
        self.kwargs = dict(
            image_size=image_size, feature_maps=feature_maps,
            min_sizes=min_sizes, max_sizes=max_sizes, strides=strides,
            aspect_ratios=aspect_ratios, clip=clip)

    def __call__(self) -> np.ndarray:
        return ssd_prior_boxes(**self.kwargs)
