"""Generic classification model (reference: src/models/classification.py:26).

Universal forward contract (reference: trainer.py:177-213):
  mode='train' → (total_loss, loss_dict)
  mode='val'   → (loss_dict, predictions)
  mode='infer' → predictions
Backbone is cfg-built with ``classifier=True`` so it emits logits directly.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..registry import MODELS
from .backbones import build_backbone
from .losses.cls_loss import cross_entropy_loss


@MODELS.register(name="Classification", aliases=("ClsModel",))
class Classification(nn.Module):
    """dictionary: [{name: weight}, ...]; model_cfg: cfg.USE_MODEL."""

    dictionary: Sequence[Any] = ()
    model_cfg: Any = None
    label_smoothing: float = 0.0

    def setup(self):
        names, weights = [], []
        for item in self.dictionary:
            (k, v), = item.items() if hasattr(item, "items") else [(str(item), 1.0)]
            names.append(k)
            weights.append(float(v))
        self._class_names = names
        self._weights = tuple(weights)
        num_classes = len(names)

        bb_cfg = dict(self.model_cfg["BACKBONE"].items()) if self.model_cfg else {
            "name": "ResNet", "subtype": "resnet18"
        }
        bb_cfg.setdefault("classifier", True)
        bb_cfg["num_classes"] = num_classes
        self.backbone = build_backbone(bb_cfg)

    def __call__(self, images, targets=None, mode: str = "infer"):
        logits = self.backbone(images, train=(mode == "train"))
        if mode == "infer":
            return jnp.argmax(logits, axis=-1)
        weights = jnp.asarray(self._weights)
        loss = cross_entropy_loss(
            logits, targets, class_weights=weights,
            label_smoothing=self.label_smoothing,
        )
        losses = {"ce_loss": loss}
        if mode == "train":
            return loss, losses
        return losses, jnp.argmax(logits, axis=-1)
