"""Batched class-aware NMS — TPU-native replacement for
``torchvision.ops.nms`` + the reference's per-image host loops
(reference: yolov5.py:62-153 non_max_suppression, modules/nms.py:5-100
multiclass/batched NMS, fcos_detect.py:108-153).

Design (SURVEY §2.9 row 1): everything fixed-shape and in-graph —
* confidence filtering becomes top-k pre-selection (``max_nms`` boxes);
* the class-offset trick keeps one suppression pass for all classes
  (boxes shifted by ``class_id * 4096`` like the reference's
  ``batched_nms``);
* greedy suppression over the score-sorted IoU matrix runs as a
  ``lax.fori_loop`` with a keep-mask — O(K²) on the VPU, no host sync,
  identical keep-set to torchvision's sequential algorithm;
* output is padded to ``max_det`` with validity mask.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .boxes import box_iou_matrix

MAX_WH = 4096.0  # class-offset magnitude (reference: yolov5.py:110)


def nms_keep_mask(boxes, scores, iou_threshold: float):
    """Greedy NMS over score-DESC-sorted candidates.

    boxes (K,4) xyxy, scores (K,) — returns keep mask (K,) aligned to the
    *sorted* order it computes internally plus the sort indices.
    """
    order = jnp.argsort(-scores)
    b = boxes[order]
    iou = box_iou_matrix(b, b)  # (K, K)
    k = boxes.shape[0]

    def body(i, keep):
        # suppress j>i iff kept[i] and iou(i,j) > thr
        row = iou[i]
        suppress = (row > iou_threshold) & (jnp.arange(k) > i) & keep[i]
        return keep & ~suppress

    keep_sorted = jax.lax.fori_loop(0, k, body, jnp.ones(k, bool))
    return keep_sorted, order


def _use_pallas_default() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


@partial(jax.jit, static_argnames=("max_det", "iou_threshold", "score_threshold",
                                  "max_nms", "class_aware", "use_pallas"))
def batched_nms(
    boxes,
    scores,
    labels,
    max_det: int = 300,
    iou_threshold: float = 0.45,
    score_threshold: float = 0.001,
    max_nms: int = 1024,
    class_aware: bool = True,
    use_pallas: bool | None = None,
):
    """Batched padded NMS.

    Args:
      boxes  (B, N, 4) xyxy in network pixels
      scores (B, N) confidence (obj*cls for YOLO)
      labels (B, N) int class ids
    Returns dict with 'boxes' (B,max_det,4), 'scores', 'labels',
    'valid' (B,max_det) bool, 'num' (B,).
    """
    B, N = scores.shape
    k = min(max_nms, N)
    pallas = _use_pallas_default() if use_pallas is None else use_pallas

    def per_image(bx, sc, lb):
        sc = jnp.where(sc >= score_threshold, sc, 0.0)
        top_sc, top_idx = jax.lax.top_k(sc, k)  # score-desc order
        top_bx = bx[top_idx]
        top_lb = lb[top_idx]
        shift = (top_lb.astype(jnp.float32) * MAX_WH)[:, None] if class_aware \
            else jnp.zeros((k, 1), jnp.float32)
        if pallas:
            from .pallas.nms_kernel import pallas_nms_keep

            # top_k output is already sorted — feed the kernel directly
            keep_sorted = pallas_nms_keep(top_bx + shift, iou_threshold)
            sorted_bx, sorted_sc, sorted_lb = top_bx, top_sc, top_lb
        else:
            keep_sorted, order = nms_keep_mask(top_bx + shift, top_sc,
                                               iou_threshold)
            sorted_bx = top_bx[order]
            sorted_sc = top_sc[order]
            sorted_lb = top_lb[order]
        final_sc = jnp.where(keep_sorted & (sorted_sc > 0), sorted_sc, -1.0)
        if max_det > k:  # pad candidate set so top_k(max_det) is valid
            pad = max_det - k
            final_sc = jnp.pad(final_sc, (0, pad), constant_values=-1.0)
            sorted_bx = jnp.pad(sorted_bx, ((0, pad), (0, 0)))
            sorted_sc = jnp.pad(sorted_sc, (0, pad))
            sorted_lb = jnp.pad(sorted_lb, (0, pad))
        out_sc, out_idx = jax.lax.top_k(final_sc, max_det)
        valid = out_sc > 0
        out = {
            "boxes": jnp.where(valid[:, None], sorted_bx[out_idx], 0.0),
            "scores": jnp.where(valid, out_sc, 0.0),
            "labels": jnp.where(valid, sorted_lb[out_idx], -1),
            "valid": valid,
            "num": valid.sum(),
        }
        return out

    return jax.vmap(per_image)(boxes, scores, labels)


def yolo_non_max_suppression(
    pred,
    num_classes: int,
    conf_threshold: float = 0.001,
    iou_threshold: float = 0.6,
    max_det: int = 300,
    max_nms: int = 1024,
    multi_label: bool = False,
):
    """YOLO-style NMS over raw decoded predictions
    (reference: yolov5.py:62-153).

    pred (B, N, 5+C): xywh(center) + obj + cls-probs in network pixels.
    multi_label=True matches the reference mAP path (every class above
    threshold becomes a candidate, yolov5.py:92-110); fixed-shape here via
    top-k over the (N·C) score matrix with boxes gathered by idx // C —
    the box tensor is never replicated per class.
    """
    from .boxes import cxcywh_to_xyxy

    boxes = cxcywh_to_xyxy(pred[..., :4])
    obj = pred[..., 4:5]
    cls_scores = pred[..., 5:5 + num_classes] * obj
    if multi_label:
        B, N, C = cls_scores.shape
        k = min(max_nms, N * C)
        top_sc, top_idx = jax.lax.top_k(cls_scores.reshape(B, N * C), k)
        labels = top_idx % C
        box_idx = top_idx // C
        boxes = jnp.take_along_axis(boxes, box_idx[..., None], axis=1)
        scores = top_sc
    else:
        scores = cls_scores.max(-1)
        labels = cls_scores.argmax(-1)
    return batched_nms(
        boxes, scores, labels,
        max_det=max_det, iou_threshold=iou_threshold,
        score_threshold=conf_threshold, max_nms=max_nms,
    )
