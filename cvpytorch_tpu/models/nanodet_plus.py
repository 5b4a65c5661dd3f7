"""NanoDet-Plus (reference: src/models/nanodet_plus.py:17-120).

ShuffleNetV2 + GhostPAN + GFL head (QFL/DFL/GIoU with DSL assigner),
universal forward contract.  The reference's detached aux-neck/aux-head
assignment path (nanodet_plus.py:93-100) is a training aid scheduled for a
later round; self-assignment (the head's own detached predictions) is the
reference's post-warmup behavior and is what runs here."""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.boxes import clip_boxes, unletterbox_boxes
from ..ops.nms import batched_nms
from ..registry import MODELS
from .backbones import build_backbone
from .heads.nanodet_head import (  # noqa: F401
    center_priors_v1,
    nanodet_v1_loss,
)
from .heads.nanodet_head import (
    NanoDetPlusHead,
    center_priors,
    decode_nanodet,
    nanodet_loss,
)
from .necks.ghost_pan import GhostPAN

STRIDES = (8, 16, 32, 64)


@MODELS.register(name="NanoDetPlus", aliases=("NanoDet",))
class NanoDetPlus(nn.Module):
    """``NanoDet`` (v1, reference nanodet.py:18) runs the faithful v1
    path: PAN neck (necks/pan.py), 3×3 DW head stacks (conf
    coco_nanodet.yml:63), (i+0.5)·stride priors and the ATSS-assigned
    GFL loss (gfl_head.py:264-385) — selected by ``assigner='atss'``,
    which the trainer turns on when USE_MODEL.CLASS is
    ``src.models.nanodet.NanoDet`` (or via the yaml key directly)."""

    dictionary: Sequence[Any] = ()
    model_cfg: Any = None
    feat_channels: int = 96
    reg_max: int = 7
    strides: Sequence[int] = STRIDES
    use_aux_head: bool = False    # training assist (reference :93-100)
    aux_weight: float = 1.0
    score_threshold: float = 0.05
    iou_threshold: float = 0.6
    max_det: int = 100
    assigner: str = "dsl"         # 'dsl' (Plus) | 'atss' (v1 GFL)
    octave_base_scale: int = 5    # v1 grid-cell scale (gfl_head.py:633)
    atss_topk: int = 9

    def _is_v1(self):
        cfg = self.model_cfg or {}
        get = cfg.get if hasattr(cfg, "get") else (lambda k, d=None: d)
        cls_name = str(get("CLASS") or "")
        return self.assigner == "atss" or cls_name.endswith(".nanodet.NanoDet")

    def setup(self):
        self.num_classes = max(len(self.dictionary), 1)
        cfg = self.model_cfg or {}
        get = cfg.get if hasattr(cfg, "get") else (lambda k, d=None: d)
        bb = get("BACKBONE") or {"name": "ShuffleNetV2",
                                 "subtype": "shufflenetv2_x1.0",
                                 "act": "leaky_relu"}
        self.backbone = build_backbone(dict(bb.items()) if hasattr(bb, "items") else bb)
        v1 = self._is_v1()
        neck_cfg = get("NECK") or {}
        nget = neck_cfg.get if hasattr(neck_cfg, "get") else (lambda k, d=None: d)
        neck_name = nget("name") or ("PAN" if v1 else "GhostPAN")
        if neck_name == "PAN":
            from .necks.pan import PAN

            self.neck = PAN(out_channels=int(
                nget("out_channels", self.feat_channels)
                or self.feat_channels))
        elif neck_name == "TAN":
            # NanoDet-t (reference conf/ext/coco_nanodet_t.yml — 3 levels)
            from .necks.tan import TAN

            self.neck = TAN(
                out_channels=int(nget("out_channels", self.feat_channels)
                                 or self.feat_channels),
                feature_hw=tuple(nget("feature_hw", (20, 20)) or (20, 20)),
                num_heads=int(nget("num_heads", 8) or 8),
                num_encoders=int(nget("num_encoders", 1) or 1),
                mlp_ratio=int(nget("mlp_ratio", 4) or 4),
                dropout_ratio=float(nget("dropout_ratio", 0.1) or 0.0))
        else:
            self.neck = GhostPAN(
                out_channels=int(nget("out_channels", self.feat_channels)
                                 or self.feat_channels),
                num_extra_levels=len(self.strides) - 3)
        head_cfg = get("HEAD") or {}
        hget = head_cfg.get if hasattr(head_cfg, "get") else (
            lambda k, d=None: d)
        # v1 NanoDetHead uses 3×3 DW stacks (conf coco_nanodet.yml:63 via
        # DepthwiseConvModule default); Plus uses 5×5.
        ksize = int(hget("kernel_size", 3 if v1 else 5) or (3 if v1 else 5))
        self.head = NanoDetPlusHead(
            num_classes=self.num_classes,
            feat_channels=self.feat_channels,
            strides=tuple(self.strides),
            reg_max=self.reg_max,
            kernel_size=ksize,
        )
        self.aux_head = NanoDetPlusHead(
            num_classes=self.num_classes,
            feat_channels=self.feat_channels * 2,
            strides=tuple(self.strides),
            reg_max=self.reg_max,
            kernel_size=ksize,
        ) if self.use_aux_head else None

    def _forward(self, images, train: bool):
        feats = self.backbone(images, train=train)
        feats = self.neck(feats, train=train)
        preds = self.head(feats, train=train)
        aux_preds = None
        if self.aux_head is not None and train:
            aux_preds = self.aux_head(feats, train=train)
        # sizes come from the ACTUAL pyramid maps, not h//stride: the
        # stride-64 extra level is a ceil-division conv (416/64 → 7, not 6)
        sizes = [f.shape[1:3] for f in feats]
        make_priors = center_priors_v1 if self._is_v1() else center_priors
        priors = make_priors(sizes, tuple(self.strides))
        return preds, aux_preds, priors, tuple(h * w for h, w in sizes)

    def _predict(self, preds, priors, images, targets=None):
        cls_logits, boxes, _ = decode_nanodet(
            preds, priors, self.num_classes, self.reg_max)
        scores = jax.nn.sigmoid(cls_logits)
        best = scores.max(-1)
        labels = scores.argmax(-1)
        dets = batched_nms(
            boxes, best, labels, max_det=self.max_det,
            iou_threshold=self.iou_threshold,
            score_threshold=self.score_threshold,
        )
        h, w = images.shape[1:3]
        out_boxes = clip_boxes(dets["boxes"], h, w)
        if targets is not None and "pads" in targets:
            out_boxes = unletterbox_boxes(
                out_boxes, targets["pads"][:, None, :],
                targets["scales"][:, None, :])
        return {**dets, "boxes": out_boxes}

    def __call__(self, images, targets=None, mode: str = "infer"):
        train = mode == "train"
        preds, aux_preds, priors, nlp = self._forward(images, train=train)
        if mode in ("train", "val"):
            t = {"boxes": targets["boxes"], "labels": targets["labels"],
                 "valid": targets["valid"]}
            if self._is_v1():
                loss_fn = lambda p, ap: nanodet_v1_loss(
                    p, priors, t, self.num_classes, self.reg_max, nlp,
                    octave_base_scale=self.octave_base_scale,
                    topk=self.atss_topk)
            else:
                loss_fn = lambda p, ap: nanodet_loss(
                    p, priors, t, self.num_classes, self.reg_max,
                    assign_preds=ap)
            total, losses = loss_fn(preds, aux_preds)
            if aux_preds is not None:
                aux_total, aux_losses = loss_fn(aux_preds, aux_preds)
                total = total + self.aux_weight * aux_total
                losses.update({f"aux_{k}": v for k, v in aux_losses.items()})
            losses = {**losses, "loss": total}
            if mode == "train":
                return total, losses
            return losses, self._predict(preds, priors, images, targets)
        return self._predict(preds, priors, images, targets)
