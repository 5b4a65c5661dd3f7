"""Box ops library (reference: src/losses/yolov5_loss.py:12-54 bbox_iou,
src/models/assigners/assigner_utils.py:158 bbox_overlaps,
src/data/transforms/det_transforms.py:672-727 format converters).

All fully vectorized jnp — no per-box Python loops.  Boxes are
``(..., 4)`` float arrays; formats: xyxy (corner) and cxcywh (center)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def xyxy_to_cxcywh(boxes):
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)


def cxcywh_to_xyxy(boxes):
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def box_area(boxes):
    return jnp.clip(boxes[..., 2] - boxes[..., 0], 0, None) * \
        jnp.clip(boxes[..., 3] - boxes[..., 1], 0, None)


def box_iou_matrix(a, b, eps: float = 1e-7):
    """Pairwise IoU matrix: a (..., N, 4) × b (..., M, 4) → (..., N, M).
    xyxy format (reference: assigner_utils.py:158)."""
    lt = jnp.maximum(a[..., :, None, :2], b[..., None, :, :2])
    rb = jnp.minimum(a[..., :, None, 2:], b[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a)[..., :, None] + box_area(b)[..., None, :] - inter
    return inter / (union + eps)


def bbox_iou(box1, box2, fmt: str = "xyxy", iou_type: str = "iou",
             eps: float = 1e-7):
    """Element-wise IoU/GIoU/DIoU/CIoU between aligned boxes
    (reference: yolov5_loss.py:12-54)."""
    if fmt == "cxcywh":
        box1 = cxcywh_to_xyxy(box1)
        box2 = cxcywh_to_xyxy(box2)
    b1x1, b1y1, b1x2, b1y2 = (box1[..., i] for i in range(4))
    b2x1, b2y1, b2x2, b2y2 = (box2[..., i] for i in range(4))

    iw = jnp.clip(jnp.minimum(b1x2, b2x2) - jnp.maximum(b1x1, b2x1), 0, None)
    ih = jnp.clip(jnp.minimum(b1y2, b2y2) - jnp.maximum(b1y1, b2y1), 0, None)
    inter = iw * ih
    w1, h1 = b1x2 - b1x1, b1y2 - b1y1
    w2, h2 = b2x2 - b2x1, b2y2 - b2y1
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union
    if iou_type == "iou":
        return iou

    cw = jnp.maximum(b1x2, b2x2) - jnp.minimum(b1x1, b2x1)  # convex w
    ch = jnp.maximum(b1y2, b2y2) - jnp.minimum(b1y1, b2y1)
    if iou_type == "giou":
        c_area = cw * ch + eps
        return iou - (c_area - union) / c_area

    c2 = cw**2 + ch**2 + eps  # convex diagonal²
    rho2 = ((b2x1 + b2x2 - b1x1 - b1x2) ** 2 +
            (b2y1 + b2y2 - b1y1 - b1y2) ** 2) / 4
    if iou_type == "diou":
        return iou - rho2 / c2
    if iou_type == "ciou":
        v = (4 / jnp.pi**2) * (jnp.arctan(w2 / (h2 + eps)) -
                               jnp.arctan(w1 / (h1 + eps))) ** 2
        # alpha is treated as a constant in the gradient (reference wraps it
        # in torch.no_grad(), yolov5_loss.py:46)
        alpha = jax.lax.stop_gradient(v / (v - iou + (1 + eps)))
        return iou - (rho2 / c2 + v * alpha)
    raise ValueError(iou_type)


def clip_boxes(boxes, height, width):
    """Clip xyxy boxes to image bounds (reference: yolov5.py:276-283)."""
    return jnp.stack([
        jnp.clip(boxes[..., 0], 0, width),
        jnp.clip(boxes[..., 1], 0, height),
        jnp.clip(boxes[..., 2], 0, width),
        jnp.clip(boxes[..., 3], 0, height),
    ], axis=-1)


def unletterbox_boxes(boxes, pads, scales):
    """Undo letterbox: boxes xyxy in network pixels → original pixels.
    pads (..., 2) = (pad_w, pad_h) [or (top,left) pairs as (w,h)],
    scales (..., 2) = (scale_w, scale_h)
    (reference: yolov5.py:276-283 subtracts pads then divides scales)."""
    pw = pads[..., 0:1]
    ph = pads[..., 1:2]
    sw = scales[..., 0:1]
    sh = scales[..., 1:2]
    return jnp.concatenate([
        (boxes[..., 0:1] - pw) / sw,
        (boxes[..., 1:2] - ph) / sh,
        (boxes[..., 2:3] - pw) / sw,
        (boxes[..., 3:4] - ph) / sh,
    ], axis=-1)

