"""Classification losses (reference: src/losses/cls/cls_loss.py, 186 LoC).

Pure functions over logits/labels — no Module state needed.  Per-class loss
weights come from the dictionary yml (reference: conf/dicts/*_dict.yml)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ...registry import LOSSES


@LOSSES.register(name="CrossEntropyLoss")
def cross_entropy_loss(logits, labels, class_weights=None,
                       label_smoothing: float = 0.0):
    num_classes = logits.shape[-1]
    onehot = jax.nn.one_hot(labels, num_classes)
    if label_smoothing > 0:
        onehot = optax.smooth_labels(onehot, label_smoothing)
    losses = optax.softmax_cross_entropy(logits, onehot)
    if class_weights is not None:
        w = jnp.asarray(class_weights)[labels]
        return (losses * w).sum() / jnp.maximum(w.sum(), 1e-8)
    return losses.mean()


@LOSSES.register(name="FocalLoss")
def focal_loss(logits, labels, gamma: float = 2.0, alpha: float = 0.25,
               class_weights=None):
    num_classes = logits.shape[-1]
    onehot = jax.nn.one_hot(labels, num_classes)
    logp = jax.nn.log_softmax(logits)
    p = jnp.exp(logp)
    focal = -onehot * ((1 - p) ** gamma) * logp
    if alpha is not None:
        focal = alpha * focal
    losses = focal.sum(-1)
    if class_weights is not None:
        w = jnp.asarray(class_weights)[labels]
        return (losses * w).sum() / jnp.maximum(w.sum(), 1e-8)
    return losses.mean()
