"""Generalized Focal Loss family + Integral projection
(reference: src/losses/det/general_focal_losses.py:85,142,
src/models/layers/integral.py, src/losses/det/iou_losses.py GIoU).

Pure fixed-shape functions over per-prior tensors with validity weights."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...ops.boxes import bbox_iou


def quality_focal_loss(logits, labels, scores, beta: float = 2.0):
    """QFL (reference: general_focal_losses.py:85).

    logits (N, C); labels (N,) int (num_classes = background/none);
    scores (N,) soft quality target for the labeled class.
    """
    C = logits.shape[-1]
    sig = jax.nn.sigmoid(logits)
    # negatives: target 0 for all classes
    zero_bce = jnp.log1p(jnp.exp(-jnp.abs(logits))) + jnp.maximum(logits, 0)
    loss = zero_bce * (sig ** beta)
    # positives: class 'labels' gets soft target 'scores'
    pos = labels < C
    safe_labels = jnp.where(pos, labels, 0)
    onehot = jax.nn.one_hot(safe_labels, C)
    t = onehot * scores[:, None]
    bce = jnp.maximum(logits, 0) - logits * t + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    mod = jnp.abs(t - sig) ** beta
    pos_loss = bce * mod
    loss = jnp.where((pos[:, None]) & (onehot > 0), pos_loss, loss)
    return loss.sum(-1)


def distribution_focal_loss(logits, targets):
    """DFL (reference: general_focal_losses.py:142).

    logits (N, reg_max+1) per-edge distribution; targets (N,) continuous
    in [0, reg_max].  CE to the two enclosing bins, linearly weighted.
    """
    tl = jnp.floor(targets).astype(jnp.int32)
    tr = tl + 1
    wl = tr.astype(jnp.float32) - targets
    wr = targets - tl.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits)
    n = logits.shape[-1]
    tl = jnp.clip(tl, 0, n - 1)
    tr = jnp.clip(tr, 0, n - 1)
    loss = -(jnp.take_along_axis(logp, tl[:, None], -1)[:, 0] * wl +
             jnp.take_along_axis(logp, tr[:, None], -1)[:, 0] * wr)
    return loss


def giou_loss(pred_boxes, target_boxes):
    """1 − GIoU (reference: iou_losses.py GIoULoss)."""
    return 1.0 - bbox_iou(pred_boxes, target_boxes, iou_type="giou")


def integral_project(logits):
    """Distribution → scalar expectation (reference: layers/integral.py).

    logits (..., 4, reg_max+1) → (..., 4) expected ltrb distances."""
    n = logits.shape[-1]
    probs = jax.nn.softmax(logits, axis=-1)
    bins = jnp.arange(n, dtype=jnp.float32)
    return (probs * bins).sum(-1)
