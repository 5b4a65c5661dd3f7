"""Segmentation losses (reference: src/losses/seg_loss.py:39-325 +
src/losses/seg/ modular variants).

All are pure functions over ``logits (B,H,W,C)`` and integer ``labels
(B,H,W)`` with an ``ignore_index`` mask (255 for Cityscapes) — fixed-shape,
mask-weighted, jit-friendly.  The duplicate OhemCrossEntropyLoss2d
definitions in the reference (seg_loss.py:66,186) are collapsed into one.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ...registry import LOSSES


def _valid_mask(labels, ignore_index):
    return (labels != ignore_index).astype(jnp.float32)


def _safe_labels(labels, ignore_index):
    return jnp.where(labels == ignore_index, 0, labels)


@LOSSES.register(name="CrossEntropyLoss2d")
def cross_entropy_2d(logits, labels, class_weights=None, ignore_index: int = 255,
                     label_smoothing: float = 0.0):
    """(reference: seg_loss.py:39)"""
    num_classes = logits.shape[-1]
    mask = _valid_mask(labels, ignore_index)
    safe = _safe_labels(labels, ignore_index)
    logp = jax.nn.log_softmax(logits)
    onehot = jax.nn.one_hot(safe, num_classes)
    if label_smoothing > 0:
        onehot = onehot * (1 - label_smoothing) + label_smoothing / num_classes
    ce = -(onehot * logp).sum(-1)
    w = mask
    if class_weights is not None:
        w = w * jnp.asarray(class_weights)[safe]
    return (ce * w).sum() / jnp.maximum(w.sum(), 1.0)


@LOSSES.register(name="OhemCrossEntropyLoss2d")
def ohem_cross_entropy_2d(logits, labels, thresh: float = 0.7,
                          min_kept_ratio: float = 0.05,
                          class_weights=None, ignore_index: int = 255):
    """Online hard-example mining CE (reference: seg_loss.py:66,109,186).

    Fixed-shape reformulation: instead of boolean-filtering pixels (dynamic
    shape), keep a weight mask of the hard pixels.  ``min_kept`` becomes a
    ratio of total pixels; the threshold adapts via top-k on the kept count.
    """
    num_classes = logits.shape[-1]
    mask = _valid_mask(labels, ignore_index)
    safe = _safe_labels(labels, ignore_index)
    logp = jax.nn.log_softmax(logits)
    prob_gt = jnp.take_along_axis(
        jnp.exp(logp), safe[..., None], axis=-1
    )[..., 0]
    # hard pixel: prob of gt class below thresh
    flat_prob = jnp.where(mask > 0, prob_gt, 1.0).reshape(-1)
    n = flat_prob.shape[0]
    min_kept = max(int(n * min_kept_ratio), 1)
    kth = jnp.sort(flat_prob)[min_kept - 1]
    eff_thresh = jnp.maximum(thresh, kth)
    hard = (prob_gt <= eff_thresh).astype(jnp.float32) * mask
    ce = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    w = hard
    if class_weights is not None:
        w = w * jnp.asarray(class_weights)[safe]
    return (ce * w).sum() / jnp.maximum(w.sum(), 1.0)


@LOSSES.register(name="BCEWithLogitsLoss2d")
def bce_2d(logits, labels, ignore_index: int = 255):
    """Binary seg loss (reference: seg_loss.py:206).  logits (B,H,W,1)."""
    mask = _valid_mask(labels, ignore_index)
    y = jnp.clip(labels.astype(jnp.float32), 0, 1)
    x = logits[..., 0]
    loss = jnp.maximum(x, 0) - x * y + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return (loss * mask).sum() / jnp.maximum(mask.sum(), 1.0)


@LOSSES.register(name="DiceLoss")
def dice_loss(logits, labels, smooth: float = 1.0, ignore_index: int = 255):
    """(reference: seg_loss.py:234)"""
    num_classes = logits.shape[-1]
    mask = _valid_mask(labels, ignore_index)[..., None]
    probs = jax.nn.softmax(logits) * mask
    onehot = jax.nn.one_hot(_safe_labels(labels, ignore_index), num_classes) * mask
    dims = (0, 1, 2)
    inter = (probs * onehot).sum(dims)
    denom = probs.sum(dims) + onehot.sum(dims)
    dice = (2 * inter + smooth) / (denom + smooth)
    return 1.0 - dice.mean()


@LOSSES.register(name="FocalLoss2d")
def focal_loss_2d(logits, labels, gamma: float = 2.0, alpha: float = 0.25,
                  class_weights=None, ignore_index: int = 255):
    """(reference: seg_loss.py:261)"""
    num_classes = logits.shape[-1]
    mask = _valid_mask(labels, ignore_index)
    safe = _safe_labels(labels, ignore_index)
    logp = jax.nn.log_softmax(logits)
    logp_gt = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    p_gt = jnp.exp(logp_gt)
    loss = -alpha * ((1 - p_gt) ** gamma) * logp_gt
    w = mask
    if class_weights is not None:
        w = w * jnp.asarray(class_weights)[safe]
    return (loss * w).sum() / jnp.maximum(w.sum(), 1.0)


@LOSSES.register(name="LovaszSoftmax")
def lovasz_softmax(logits, labels, ignore_index: int = 255):
    """Lovász-softmax (reference: src/losses/lovasz_losses.py).

    Fixed-shape: invalid pixels get error 0 and are sorted to the tail;
    the Lovász gradient of the masked IoU is computed per class.
    """
    num_classes = logits.shape[-1]
    b = logits.shape[0]
    probs = jax.nn.softmax(logits).reshape(-1, num_classes)
    labels_f = labels.reshape(-1)
    valid = (labels_f != ignore_index)
    safe = jnp.where(valid, labels_f, 0)

    def class_loss(c):
        fg = ((safe == c) & valid).astype(jnp.float32)
        errors = jnp.where(valid, jnp.abs(fg - probs[:, c]), 0.0)
        order = jnp.argsort(-errors)
        errors_sorted = errors[order]
        fg_sorted = fg[order]
        gts = fg_sorted.sum()
        intersection = gts - jnp.cumsum(fg_sorted)
        union = gts + jnp.cumsum(1.0 - fg_sorted)
        jaccard = 1.0 - intersection / jnp.maximum(union, 1e-8)
        jaccard = jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])
        present = (gts > 0).astype(jnp.float32)
        return (errors_sorted * jaccard).sum() * present, present

    losses, present = jax.vmap(class_loss)(jnp.arange(num_classes))
    return losses.sum() / jnp.maximum(present.sum(), 1.0)


@LOSSES.register(name="CrossEntropyDiceLoss")
def ce_dice_loss(logits, labels, dice_weight: float = 1.0,
                 class_weights=None, ignore_index: int = 255):
    """(reference: seg_loss.py:301 CE_DiceLoss)"""
    return cross_entropy_2d(logits, labels, class_weights, ignore_index) + \
        dice_weight * dice_loss(logits, labels, ignore_index=ignore_index)


SEG_LOSSES = {
    "CrossEntropyLoss2d": cross_entropy_2d,
    "OhemCrossEntropyLoss2d": ohem_cross_entropy_2d,
    "BCEWithLogitsLoss2d": bce_2d,
    "DiceLoss": dice_loss,
    "FocalLoss2d": focal_loss_2d,
    "LovaszSoftmax": lovasz_softmax,
    "CrossEntropyDiceLoss": ce_dice_loss,
}


def build_seg_loss(name: str, **kwargs):
    fn = SEG_LOSSES[name]
    return partial(fn, **kwargs) if kwargs else fn
