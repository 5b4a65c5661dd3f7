"""Generic encoder-decoder segmentor
(reference: src/models/segmentors/encoder_decoder.py:21-107).

cfg-built backbone [+neck] + head [+aux heads] + loss list with per-loss
names/weights; logits are bilinear-upsampled to the input size; aux-head
losses accumulate with their weights (reference :93-107).  DeepLabV3/V3+,
PSPNet, UPerNet, SegFormer etc. are all this class + different sub-configs;
SegNeXt subclasses it in the reference (segmentors/segnext.py:10)."""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import dictionary_to_names_weights
from ..registry import HEADS, MODELS
from .backbones import build_backbone
from .heads.seg_heads import resize_bilinear
from .losses.seg_loss import build_seg_loss


def _build_head(cfg: dict, num_classes: int):
    kwargs = dict(cfg.items() if hasattr(cfg, "items") else cfg)
    name = kwargs.pop("name")
    cls = HEADS.get(name)
    import dataclasses

    fields = {f.name for f in dataclasses.fields(cls)}
    kwargs = {k: v for k, v in kwargs.items() if k in fields}
    kwargs["num_classes"] = num_classes
    # lists from yaml → tuples (flax module attrs must be hashable)
    kwargs = {k: tuple(v) if isinstance(v, list) else v for k, v in kwargs.items()}
    return cls(**kwargs)


@MODELS.register(name="EncoderDecoder", aliases=(
    "SegNeXt", "PSPNet", "Deeplabv3", "Deeplabv3Plus", "SegFormer",
    "UPerNet", "SFNet", "TopFormer", "RegSeg"))
class EncoderDecoder(nn.Module):
    dictionary: Sequence[Any] = ()
    model_cfg: Any = None

    def setup(self):
        names, weights = dictionary_to_names_weights(list(self.dictionary))
        self.num_classes = len(names)
        self._class_weights = tuple(weights)
        cfg = self.model_cfg or {}
        get = cfg.get if hasattr(cfg, "get") else (lambda k, d=None: cfg.get(k, d))

        self.backbone = build_backbone(get("BACKBONE") or
                                       {"name": "ResNet", "subtype": "resnet50",
                                        "output_stride": 8, "out_stages": (1, 4)})
        head_cfg = get("HEAD") or {"name": "FCNHead"}
        self.head = _build_head(head_cfg, self.num_classes)
        aux_cfg = get("AUX_HEAD")
        self.aux_head = _build_head(aux_cfg, self.num_classes) if aux_cfg else None
        self.aux_weight = float(get("AUX_WEIGHT") or 0.4)

        loss_cfg = get("LOSS") or {}
        lget = loss_cfg.get if hasattr(loss_cfg, "get") else (lambda k, d=None: d)
        self._loss_fn = build_seg_loss(
            lget("name", "CrossEntropyLoss2d") or "CrossEntropyLoss2d",
            **{k.lower(): v for k, v in
               (loss_cfg.items() if hasattr(loss_cfg, "items") else [])
               if k != "name"},
        )

    def __call__(self, images, targets=None, mode: str = "infer"):
        train = mode == "train"
        feats = self.backbone(images, train=train)
        logits = self.head(feats, train=train)
        logits = resize_bilinear(logits, images.shape[1:3])
        if mode == "infer":
            return jnp.argmax(logits, axis=-1)

        w = jnp.asarray(self._class_weights)
        main = self._loss_fn(logits, targets, class_weights=w)
        losses = {"seg_loss": main}
        total = main
        if self.aux_head is not None and train:
            aux_logits = resize_bilinear(
                self.aux_head(feats, train=train), images.shape[1:3])
            aux = self._loss_fn(aux_logits, targets, class_weights=w)
            losses["aux_loss"] = aux
            total = total + self.aux_weight * aux
        if mode == "train":
            return total, losses
        return losses, jnp.argmax(logits, axis=-1)
