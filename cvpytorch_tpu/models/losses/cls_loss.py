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


def class_balanced_loss(logits, labels, samples_per_cls, beta: float = 0.9999,
                        gamma: float = 2.0, loss_type: str = "focal"):
    """Class-Balanced loss on effective sample numbers
    (reference: src/losses/cb_loss.py:55-89, arXiv:1901.05555).

    logits (N, C); labels (N,) int; samples_per_cls length-C counts.
    loss_type ∈ {'focal', 'sigmoid', 'softmax'} with the reference's exact
    normalizations (focal divides by Σ one-hot = N; sigmoid/softmax are
    weighted-mean BCE).
    """
    n, c = logits.shape
    spc = jnp.asarray(samples_per_cls, jnp.float32)
    eff = 1.0 - jnp.power(beta, spc)
    w = (1.0 - beta) / eff
    w = w / w.sum() * c                                # (C,)
    onehot = jax.nn.one_hot(labels, c)
    ex_w = (w[None, :] * onehot).sum(1, keepdims=True)  # (N, 1)

    if loss_type == "focal":
        bce = optax.sigmoid_binary_cross_entropy(logits, onehot)
        modulator = jnp.exp(-gamma * onehot * logits
                            - gamma * jnp.log1p(jnp.exp(-logits)))
        return (ex_w * modulator * bce).sum() / onehot.sum()
    if loss_type == "sigmoid":
        bce = optax.sigmoid_binary_cross_entropy(logits, onehot)
        return (ex_w * bce).mean()
    if loss_type == "softmax":
        pred = jax.nn.softmax(logits, -1)
        bce = -(onehot * jnp.log(jnp.clip(pred, 1e-12))
                + (1 - onehot) * jnp.log(jnp.clip(1 - pred, 1e-12)))
        return (ex_w * bce).mean()
    raise ValueError(loss_type)
