"""YOLOv5 detect layer (reference: src/models/detects/yolov5_detect.py:12-70).

Per-level 1×1 conv → (B, ny, nx, A, 5+C) raw maps; decode is a separate
pure function (sigmoid grid decode, reference :50-53) so train mode never
materializes decoded boxes.  Bias prior init matches reference :29-36
(obj += log(8/(640/s)²), cls += log(0.6/(C−0.99…)))."""
from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...registry import DETECTS


def _bias_init(num_anchors, num_classes, stride):
    def init(key, shape, dtype=jnp.float32):
        b = np.zeros((num_anchors, 5 + num_classes), np.float32)
        b[:, 4] += math.log(8 / (640 / stride) ** 2)
        b[:, 5:] += math.log(0.6 / (num_classes - 0.999999))
        return jnp.asarray(b.reshape(-1), dtype)

    return init


@DETECTS.register(name="YOLOv5Detect")
class YOLOv5Detect(nn.Module):
    num_classes: int = 80
    num_anchors: int = 3
    strides: Sequence[float] = (8.0, 16.0, 32.0)

    @nn.compact
    def __call__(self, feats, train: bool = False):
        """feats: (P3, P4, P5) NHWC → list of (B, ny, nx, A, 5+C)."""
        outs = []
        no = 5 + self.num_classes
        for i, x in enumerate(feats):
            y = nn.Conv(
                self.num_anchors * no, (1, 1),
                bias_init=_bias_init(self.num_anchors, self.num_classes,
                                     self.strides[i]),
                name=f"m{i}",
            )(x)
            b, ny, nx, _ = y.shape
            outs.append(y.reshape(b, ny, nx, self.num_anchors, no))
        return outs


def decode_yolov5(raw_outs, anchors, strides):
    """Sigmoid grid decode (reference: yolov5_detect.py:39-57).

    raw_outs: list of (B, ny, nx, A, 5+C); anchors (L, A, 2) in grid units.
    Returns (B, N_total, 5+C): cxcywh in network pixels + obj + cls probs.
    """
    anchors = jnp.asarray(anchors)
    decoded = []
    for i, x in enumerate(raw_outs):
        b, ny, nx, na, no = x.shape
        y = jax.nn.sigmoid(x)
        gy = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 0)
        gx = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 1)
        grid = jnp.stack([gx, gy], axis=-1)[None, :, :, None, :]  # (1,ny,nx,1,2)
        anchor_grid = anchors[i][None, None, None, :, :] * strides[i]
        xy = (y[..., 0:2] * 2.0 - 0.5 + grid) * strides[i]
        wh = (y[..., 2:4] * 2.0) ** 2 * anchor_grid
        out = jnp.concatenate([xy, wh, y[..., 4:]], axis=-1)
        decoded.append(out.reshape(b, ny * nx * na, no))
    return jnp.concatenate(decoded, axis=1)
