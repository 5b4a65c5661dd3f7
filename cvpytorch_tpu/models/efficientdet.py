"""EfficientDet — faithful TPU implementation
(reference: src/models/efficientdet.py:52-213, src/models/necks/bifpn.py:19-200,
src/models/heads/efficientdet_head.py:176-208, src/models/efficientdet_extra.py
Anchors :944-1029, src/losses/efficientdet_loss.py:27-140).

Architecture notes (all verified against the reference forward):

* BiFPN cell = fast-attention weighted fusion (relu(w)/ (Σw + 1e-4)),
  swish BEFORE the separable conv, BILINEAR upsampling (necks/bifpn.py:146
  uses F.interpolate bilinear — the efficientdet_extra variant uses nearest
  but the registered neck is necks/bifpn.py) and k3/s2 TF-SAME max-pool
  downsampling; the first cell down-channels P3/P4/P5 twice (second copies
  feed the bottom-up pass) and builds P6/P7 from P5.
* SeparableConvBlock: bias lives only on the pointwise conv
  (modules/utils_extra.py:91-121), BN momentum 0.01 torch → 0.99 flax,
  eps 1e-3.
* Heads share the separable convs across levels but keep PER-LEVEL BN
  lists (efficientdet_extra.py:352-426) — the classic effdet quirk.
* Anchors are y1x1y2x2 at 3 scales × 3 ratios per cell with centers at
  stride/2 (efficientdet_extra.py:997-1020); the regression layout is
  (dy, dx, dh, dw) decoded against anchor centers (efficientdet.py:22-49).
* Loss: IoU ≥ .5 positive / < .4 negative / else ignored focal
  (α .25, γ 2), smooth-L1 (β 1/9) on (dy,dx,dh,dw), reg × 50 — here as
  one fixed-shape masked vmap instead of the reference's per-image
  boolean-filter loop.
"""
from __future__ import annotations

import itertools
import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .bricks import BatchNorm

from ..registry import MODELS, NECKS
from .backbones import build_backbone

_BN = dict(momentum=0.99, epsilon=1e-3)


def _swish(x):
    return x * jax.nn.sigmoid(x)


class SeparableConvBlock(nn.Module):
    """dw3×3 (no bias) + pw1×1 (bias) [+ BN] — utils_extra.py:91-121."""

    out_channels: int | None = None
    norm: bool = True
    activation: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = self.out_channels or x.shape[-1]
        x = nn.Conv(x.shape[-1], (3, 3), padding="SAME",
                    feature_group_count=x.shape[-1], use_bias=False,
                    name="depthwise_conv")(x)
        x = nn.Conv(out, (1, 1), use_bias=True, name="pointwise_conv")(x)
        if self.norm:
            x = BatchNorm(use_running_average=not train, **_BN,
                             name="bn")(x)
        if self.activation:
            x = _swish(x)
        return x


class ConvBN(nn.Module):
    """1×1 same-padding conv (bias) + BN — the BiFPN down-channel block."""

    out_channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.out_channels, (1, 1), use_bias=True,
                    name="conv")(x)
        return BatchNorm(use_running_average=not train, **_BN,
                            name="bn")(x)


def _maxpool_same(x, k: int = 3, s: int = 2):
    """MaxPool2dStaticSamePadding(3, 2) — utils_extra.py:52-90.  The
    reference pads with ZEROS (F.pad), not −inf, so border maxima clamp
    at 0 for negative features; replicate exactly (flax 'SAME' would pad
    −inf)."""
    h, w = x.shape[1:3]
    ev = (math.ceil(h / s) - 1) * s - h + k
    eh = (math.ceil(w / s) - 1) * s - w + k
    pad = ((0, 0), (ev // 2, ev - ev // 2), (eh // 2, eh - eh // 2), (0, 0))
    return nn.max_pool(jnp.pad(x, pad), (k, k), strides=(s, s),
                       padding="VALID")


def _up_bilinear(x, ref):
    return jax.image.resize(
        x, (x.shape[0], ref.shape[1], ref.shape[2], x.shape[3]),
        "bilinear", antialias=False)


class BiFPNCell(nn.Module):
    """One weighted bidirectional pass (necks/bifpn.py:19-200)."""

    out_channels: int
    first_time: bool = False
    epsilon: float = 1e-4

    @nn.compact
    def __call__(self, feats, train: bool = False):
        eps = self.epsilon
        w2 = lambda name: self.param(name, nn.initializers.ones, (2,))
        w3 = lambda name: self.param(name, nn.initializers.ones, (3,))

        def fuse(ws, xs):
            w = jax.nn.relu(ws)
            w = w / (w.sum() + eps)
            return sum(wi * x for wi, x in zip(w, xs))

        if self.first_time:
            p3, p4, p5 = feats
            p6_in = _maxpool_same(
                ConvBN(self.out_channels, name="p5_to_p6")(p5, train))
            p7_in = _maxpool_same(p6_in)
            p3_in = ConvBN(self.out_channels, name="p3_down_channel")(p3, train)
            p4_in = ConvBN(self.out_channels, name="p4_down_channel")(p4, train)
            p5_in = ConvBN(self.out_channels, name="p5_down_channel")(p5, train)
        else:
            p3_in, p4_in, p5_in, p6_in, p7_in = feats

        conv = lambda name: SeparableConvBlock(self.out_channels, name=name)
        p6_up = conv("conv6_up")(_swish(fuse(
            w2("p6_w1"), [p6_in, _up_bilinear(p7_in, p6_in)])), train)
        p5_up = conv("conv5_up")(_swish(fuse(
            w2("p5_w1"), [p5_in, _up_bilinear(p6_up, p5_in)])), train)
        p4_up = conv("conv4_up")(_swish(fuse(
            w2("p4_w1"), [p4_in, _up_bilinear(p5_up, p4_in)])), train)
        p3_out = conv("conv3_up")(_swish(fuse(
            w2("p3_w1"), [p3_in, _up_bilinear(p4_up, p3_in)])), train)

        if self.first_time:
            p4_in = ConvBN(self.out_channels,
                           name="p4_down_channel_2")(p4, train)
            p5_in = ConvBN(self.out_channels,
                           name="p5_down_channel_2")(p5, train)

        p4_out = conv("conv4_down")(_swish(fuse(
            w3("p4_w2"), [p4_in, p4_up, _maxpool_same(p3_out)])), train)
        p5_out = conv("conv5_down")(_swish(fuse(
            w3("p5_w2"), [p5_in, p5_up, _maxpool_same(p4_out)])), train)
        p6_out = conv("conv6_down")(_swish(fuse(
            w3("p6_w2"), [p6_in, p6_up, _maxpool_same(p5_out)])), train)
        p7_out = conv("conv7_down")(_swish(fuse(
            w2("p7_w2"), [p7_in, _maxpool_same(p6_out)])), train)
        return p3_out, p4_out, p5_out, p6_out, p7_out


@NECKS.register(name="BiFPN")
class BiFPN(nn.Module):
    """Repeated BiFPN cells (efficientdet.py:75-83 builds
    fpn_cell_repeat cells, the first with first_time=True)."""

    channels: int = 64
    repeats: int = 3

    @nn.compact
    def __call__(self, feats, train: bool = False):
        out = feats
        for r in range(self.repeats):
            out = BiFPNCell(self.channels, first_time=(r == 0),
                            name=f"cell{r}")(out, train)
        return out


class Regressor(nn.Module):
    """Shared separable convs + per-level BN (extra :352-385)."""

    channels: int
    num_anchors: int
    num_layers: int
    out_dim: int = 4

    @nn.compact
    def __call__(self, feats, train: bool = False):
        convs = [SeparableConvBlock(self.channels, norm=False,
                                    name=f"conv{i}")
                 for i in range(self.num_layers)]
        header = SeparableConvBlock(self.num_anchors * self.out_dim,
                                    norm=False, name="header")
        outs = []
        for lvl, f in enumerate(feats):
            for i, conv in enumerate(convs):
                f = conv(f, train)
                f = BatchNorm(use_running_average=not train, **_BN,
                                 name=f"bn{lvl}_{i}")(f)
                f = _swish(f)
            f = header(f, train)
            B, H, W, _ = f.shape
            outs.append(f.reshape(B, H * W * self.num_anchors,
                                  self.out_dim))
        return jnp.concatenate(outs, 1)


def efficientdet_anchors(image_hw, pyramid_levels=(3, 4, 5, 6, 7),
                         anchor_scale: float = 4.0):
    """(P, 4) y1x1y2x2 anchors (extra Anchors :944-1029); numpy at trace
    time — static under jit."""
    scales = [2 ** 0, 2 ** (1.0 / 3.0), 2 ** (2.0 / 3.0)]
    ratios = [(1.0, 1.0), (1.4, 0.7), (0.7, 1.4)]
    ih, iw = image_hw
    all_boxes = []
    for lvl in pyramid_levels:
        stride = 2 ** lvl
        level = []
        for scale, ratio in itertools.product(scales, ratios):
            base = anchor_scale * stride * scale
            ax2, ay2 = base * ratio[0] / 2.0, base * ratio[1] / 2.0
            x = np.arange(stride / 2, iw, stride)
            y = np.arange(stride / 2, ih, stride)
            xv, yv = np.meshgrid(x, y)
            xv, yv = xv.reshape(-1), yv.reshape(-1)
            level.append(np.stack([yv - ay2, xv - ax2, yv + ay2, xv + ax2],
                                  -1)[:, None, :])
        all_boxes.append(np.concatenate(level, 1).reshape(-1, 4))
    return jnp.asarray(np.concatenate(all_boxes, 0), jnp.float32)


def decode_effdet(anchors, regression):
    """(dy, dx, dh, dw) against y1x1y2x2 anchors → xyxy
    (efficientdet.py:22-49 getRegressBoxes)."""
    ya = (anchors[..., 0] + anchors[..., 2]) / 2
    xa = (anchors[..., 1] + anchors[..., 3]) / 2
    ha = anchors[..., 2] - anchors[..., 0]
    wa = anchors[..., 3] - anchors[..., 1]
    w = jnp.exp(regression[..., 3]) * wa
    h = jnp.exp(regression[..., 2]) * ha
    yc = regression[..., 0] * ha + ya
    xc = regression[..., 1] * wa + xa
    return jnp.stack([xc - w / 2, yc - h / 2, xc + w / 2, yc + h / 2], -1)


def _iou_yx(anchors, gt_xyxy):
    """calc_iou (efficientdet_loss.py:11-24): anchors y1x1y2x2 vs gt xyxy."""
    area = ((gt_xyxy[:, 2] - gt_xyxy[:, 0]) *
            (gt_xyxy[:, 3] - gt_xyxy[:, 1]))
    iw = (jnp.minimum(anchors[:, None, 3], gt_xyxy[None, :, 2]) -
          jnp.maximum(anchors[:, None, 1], gt_xyxy[None, :, 0]))
    ih = (jnp.minimum(anchors[:, None, 2], gt_xyxy[None, :, 3]) -
          jnp.maximum(anchors[:, None, 0], gt_xyxy[None, :, 1]))
    iw, ih = jnp.clip(iw, 0), jnp.clip(ih, 0)
    ua = ((anchors[:, 2] - anchors[:, 0]) *
          (anchors[:, 3] - anchors[:, 1]))[:, None] + area[None] - iw * ih
    return iw * ih / jnp.clip(ua, 1e-8)


def efficientdet_loss(classifications, regressions, anchors, targets,
                      alpha: float = 0.25, gamma: float = 2.0):
    """Masked fixed-shape EfficientDetLoss (efficientdet_loss.py:27-140).

    Padded rows (valid=False) get IoU −1, so they never win argmax and an
    all-padding image reduces to the reference's no-annotation branch
    (every anchor negative, reg loss 0) without a Python branch."""
    aw = anchors[:, 3] - anchors[:, 1]
    ah = anchors[:, 2] - anchors[:, 0]
    ax = anchors[:, 1] + 0.5 * aw
    ay = anchors[:, 0] + 0.5 * ah
    C = classifications.shape[-1]

    def one(cls_p, reg_p, boxes, labels, valid):
        cls_p = jnp.clip(cls_p, 1e-4, 1.0 - 1e-4)
        iou = jnp.where(valid[None, :], _iou_yx(anchors, boxes), -1.0)
        iou_max = iou.max(1)
        arg = iou.argmax(1)
        pos = iou_max >= 0.5
        neg = iou_max < 0.4
        num_pos = pos.sum().astype(jnp.float32)
        a_lab = jnp.take(labels, arg)
        onehot = jax.nn.one_hot(a_lab, C)
        # targets: 1 at assigned class for pos, 0 elsewhere for pos/neg,
        # ignored (-1) in between
        t = jnp.where(pos[:, None], onehot, 0.0)
        known = pos | neg
        alpha_f = jnp.where(t == 1.0, alpha, 1.0 - alpha)
        focal_w = alpha_f * jnp.where(t == 1.0, 1.0 - cls_p, cls_p) ** gamma
        bce = -(t * jnp.log(cls_p) + (1.0 - t) * jnp.log(1.0 - cls_p))
        cls_loss = (focal_w * bce * known[:, None]).sum() / \
            jnp.maximum(num_pos, 1.0)

        g = jnp.take(boxes, arg, axis=0)           # (P, 4) xyxy
        gw = jnp.clip(g[:, 2] - g[:, 0], 1.0)
        gh = jnp.clip(g[:, 3] - g[:, 1], 1.0)
        gx = g[:, 0] + 0.5 * (g[:, 2] - g[:, 0])
        gy = g[:, 1] + 0.5 * (g[:, 3] - g[:, 1])
        tr = jnp.stack([(gy - ay) / ah, (gx - ax) / aw,
                        jnp.log(gh / ah), jnp.log(gw / aw)], -1)
        diff = jnp.abs(tr - reg_p)
        sl1 = jnp.where(diff <= 1.0 / 9.0, 0.5 * 9.0 * diff ** 2,
                        diff - 0.5 / 9.0)
        reg_loss = jnp.where(
            num_pos > 0,
            (sl1 * pos[:, None]).sum() / jnp.maximum(num_pos * 4.0, 1.0),
            0.0)
        return cls_loss, reg_loss

    cls_l, reg_l = jax.vmap(one)(classifications, regressions,
                                 targets["boxes"], targets["labels"],
                                 targets["valid"])
    return cls_l.mean(), reg_l.mean() * 50.0


# compound-coefficient tables (efficientdet.py:86-103)
FPN_FILTERS = (64, 88, 112, 160, 224, 288, 384, 384)
FPN_REPEATS = (3, 4, 5, 6, 7, 7, 8, 8)
BOX_REPEATS = (3, 3, 3, 4, 4, 4, 5, 5)
ANCHOR_SCALES = (4.0, 4.0, 4.0, 4.0, 4.0, 4.0, 4.0, 5.0)


@MODELS.register(name="EfficientDet")
class EfficientDet(nn.Module):
    """EfficientNet + repeated BiFPN + shared separable heads over
    efficientdet anchors (universal forward contract)."""

    dictionary: Sequence[Any] = ()
    model_cfg: Any = None
    score_threshold: float = 0.05
    iou_threshold: float = 0.5
    max_det: int = 100

    def setup(self):
        self.num_classes = max(len(self.dictionary), 1)
        cfg = self.model_cfg or {}
        get = cfg.get if hasattr(cfg, "get") else (lambda k, d=None: d)
        coef = int(str(get("TYPE") or "efficientdet_d0")[-1])
        self.anchor_scale = ANCHOR_SCALES[coef]
        channels = FPN_FILTERS[coef]
        bb = get("BACKBONE") or {"name": "EfficientNet",
                                 "subtype": f"efficientnet_b{coef}",
                                 "out_stages": (3, 5, 7)}
        self.backbone = build_backbone(
            dict(bb.items()) if hasattr(bb, "items") else bb)
        self.fpn = BiFPN(channels=channels, repeats=FPN_REPEATS[coef])
        self.regressor = Regressor(channels, 9, BOX_REPEATS[coef],
                                   out_dim=4, name="regressor")
        self.classifier = Regressor(channels, 9, BOX_REPEATS[coef],
                                    out_dim=self.num_classes,
                                    name="classifier")

    def _forward(self, images, train: bool):
        feats = self.backbone(images, train=train)
        feats = self.fpn(feats, train)
        reg = self.regressor(feats, train)
        cls = jax.nn.sigmoid(self.classifier(feats, train))
        anchors = efficientdet_anchors(images.shape[1:3],
                                       anchor_scale=self.anchor_scale)
        return cls, reg, anchors

    def _predict(self, cls, reg, anchors, targets, images):
        from ..ops.boxes import unletterbox_boxes
        from ..ops.nms import batched_nms

        boxes = decode_effdet(anchors[None], reg)
        h, w = images.shape[1:3]
        boxes = jnp.clip(boxes, 0,
                         jnp.asarray([w - 1, h - 1, w - 1, h - 1],
                                     jnp.float32))
        scores = cls.max(-1)
        labels = cls.argmax(-1)
        dets = batched_nms(boxes, scores, labels, max_det=self.max_det,
                           iou_threshold=self.iou_threshold,
                           score_threshold=self.score_threshold)
        out_boxes = dets["boxes"]
        if targets is not None and "pads" in targets:
            out_boxes = unletterbox_boxes(
                out_boxes, targets["pads"][:, None, :],
                targets["scales"][:, None, :])
        return {**dets, "boxes": out_boxes}

    def __call__(self, images, targets=None, mode: str = "infer"):
        train = mode == "train"
        cls, reg, anchors = self._forward(images, train=train)
        if mode == "infer":
            return self._predict(cls, reg, anchors, targets, images)
        cls_loss, reg_loss = efficientdet_loss(cls, reg, anchors, targets)
        total = cls_loss + reg_loss
        losses = {"cls_loss": cls_loss, "box_loss": reg_loss,
                  "loss": total}
        if mode == "train":
            return total, losses
        return losses, self._predict(cls, reg, anchors, targets, images)
