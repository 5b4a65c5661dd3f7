"""YOLOv6 (reference: src/models/yolov6.py:110, backbones EfficientRep
(RepVGG blocks), neck RepBiPAN, head Effidehead, loss yolov6_loss.py:18 —
TAL assignment + VarifocalLoss + IoU(+DFL)).

ATSS→TAL warmup: the loss trains the first ``warmup_epoch=4`` epochs with
the ATSS assigner over 5·stride grid-cell anchors, then switches to TAL
(reference yolov6_loss.py:80-97).  The trainer threads the epoch into the
batch targets (``targets['epoch']``, a traced scalar), so the switch is a
``lax.cond`` — one compiled program, no retrace at the boundary.

Upstream quirk (documented, not replicated): the reference's shipped
wiring never forwards ``epoch_num`` to the loss
(``single_stage.py:97-103`` calls ``l(preds, targets)`` — defaults
``epoch_num=0``), so as shipped it trains with ATSS *forever*.  We
implement the loss code's documented intent (meituan YOLOv6 semantics):
warmup epochs ATSS, then TAL."""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from ..ops.boxes import bbox_iou, clip_boxes, unletterbox_boxes
from ..ops.nms import batched_nms
from ..registry import MODELS
from .assigners.atss_assigner import atss_assign
from .assigners.tal_assigner import tal_assign
from .backbones.csp_darknet import SIZE_CFG
from functools import partial

from .backbones.repvgg import RepVGGBlock as _RepVGGBlock

# YOLOv6 init sets BN momentum 0.03 / eps 1e-3 on every neck/backbone BN
# (reference yolov6_repbipan.py:55-62, yolov6_efficient_rep init)
RepVGGBlock = partial(_RepVGGBlock, bn_momentum=0.97, bn_eps=1e-3)
from .bricks import ConvBNAct, make_divisible, make_round
from .heads.nanodet_head import center_priors

_BN = dict(bn_momentum=0.97, bn_eps=1e-3)
STRIDES = (8, 16, 32)


class SimCSPSPPF(nn.Module):
    """CSP-wrapped SPPF with ReLU, the v6-3.0 n/s pyramid pool
    (reference: yolo_modules.py:218-242)."""

    out_channels: int
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.out_channels * self.e)

        def cba(t, ch, k, name):
            return ConvBNAct(ch, k, act="relu", **_BN, name=name)(t, train)

        x1 = cba(cba(cba(x, c_, 1, "cv1"), c_, 3, "cv3"), c_, 1, "cv4")
        y0 = cba(x, c_, 1, "cv2")
        pool = lambda t: nn.max_pool(t, (5, 5), strides=(1, 1),
                                     padding=((2, 2), (2, 2)))
        y1 = pool(x1)
        y2 = pool(y1)
        z = cba(jnp.concatenate([x1, y1, y2, pool(y2)], -1), c_, 1, "cv5")
        z = cba(z, c_, 3, "cv6")
        return cba(jnp.concatenate([y0, z], -1), self.out_channels, 1, "cv7")


class SimSPPF(nn.Module):
    """Serial SPPF with ReLU convs — the reference SPPF with an int
    kernel size (yolo_modules.py:165-191, act_cfg ReLU), used by
    YOLOXPAIEfficientRep's stage 4 (yolox_pai_efficient_rep.py:54)."""

    out_channels: int
    kernel_size: int = 5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        x = ConvBNAct(c_, 1, act="relu", **_BN, name="conv1")(x, train)
        k = self.kernel_size
        pool = lambda t: nn.max_pool(
            t, (k, k), strides=(1, 1), padding=((k // 2,) * 2,) * 2)
        y1 = pool(x)
        y2 = pool(y1)
        y = jnp.concatenate([x, y1, y2, pool(y2)], -1)
        return ConvBNAct(self.out_channels, 1, act="relu", **_BN,
                         name="conv2")(y, train)


class EfficientRep(nn.Module):
    """(reference: backbones/det/yolov6_efficient_rep.py — v6-3.0: stage
    = [RepVGG down, RepBlock, (SimCSPSPPF on stage4)]).  ``sppf='relu'``
    swaps the CSP pyramid pool for the plain serial ReLU SPPF, which is
    the PAI-YOLOX backbone (yolox_pai_efficient_rep.py:36-56 — same
    stem/stage plan, SPPF(kernel 5, ReLU) terminating stage 4)."""

    depth_mul: float = 0.33
    width_mul: float = 0.5
    out_channels: Sequence[int] = (64, 128, 256, 512, 1024)
    num_blocks: Sequence[int] = (6, 12, 18, 6)
    out_stages: Sequence[int] = (2, 3, 4)
    sppf: str = "simcsp"

    @nn.compact
    def __call__(self, x, train: bool = False):
        chs = [make_divisible(c * self.width_mul) for c in self.out_channels]
        blocks = [make_round(n, self.depth_mul) for n in self.num_blocks]
        x = RepVGGBlock(chs[0], 2, name="stem")(x, train)
        feats = []
        for i in range(4):
            x = RepVGGBlock(chs[i + 1], 2, name=f"stage{i+1}_down")(x, train)
            x = _rep_block(x, chs[i + 1], blocks[i], train, f"stage{i+1}")
            if i == 3:
                if self.sppf == "relu":
                    x = SimSPPF(chs[4], name="sppf")(x, train)
                else:
                    x = SimCSPSPPF(chs[4], name="sppf")(x, train)
            if i + 1 in self.out_stages:
                feats.append(x)
        return tuple(feats)


def _rep_block(x, out_ch, n, train, name):
    """Reference RepBlock (yolo_modules.py): RepVGG(in→out) + (n−1)×
    RepVGG(out→out); torch children conv1 / block.0..n-2."""
    x = RepVGGBlock(out_ch, 1, name=f"{name}_conv1")(x, train)
    for j in range(max(n - 1, 0)):
        x = RepVGGBlock(out_ch, 1, name=f"{name}_block{j}")(x, train)
    return x


class BiFusion(nn.Module):
    """BiC fusion (reference: yolo_modules.py:245-264): deconv-upsampled
    top + 1×1-reduced same level + downsampled lower level → 1×1 fuse."""

    out_channels: int

    @nn.compact
    def __call__(self, top, same, lower, train: bool = False):
        up = nn.ConvTranspose(self.out_channels, (2, 2), strides=(2, 2),
                              padding="VALID", use_bias=True,
                              name="upsample")(top)
        a = ConvBNAct(self.out_channels, 1, act="relu", **_BN,
                      name="cv1")(same, train)
        b = ConvBNAct(self.out_channels, 1, act="relu", **_BN,
                      name="cv2")(lower, train)
        b = ConvBNAct(self.out_channels, 3, 2, act="relu", **_BN,
                      name="downsample")(b, train)
        y = jnp.concatenate([up, a, b], -1)
        return ConvBNAct(self.out_channels, 1, act="relu", **_BN,
                         name="cv3")(y, train)


class RepBiPAN(nn.Module):
    """Bi-directional-concat Rep-PAN (reference:
    necks/det/yolov6_repbipan.py:17-86) — consumes 4 backbone levels
    (strides 4/8/16/32); the BiC modules pull detail from one level
    below each fusion point."""

    width_mul: float = 0.5
    depth_mul: float = 0.33
    mid_channels: Sequence[int] = (128, 128, 256)
    out_channels: Sequence[int] = (128, 256, 512)
    num_blocks: Sequence[int] = (12, 12, 12, 12)

    @nn.compact
    def __call__(self, feats, train: bool = False):
        x3, x2, x1, x0 = feats      # strides 4, 8, 16, 32
        wm, dm = self.width_mul, self.depth_mul
        mid = [make_divisible(c * wm) for c in self.mid_channels]
        out = [make_divisible(c * wm) for c in self.out_channels]
        nb = [make_round(n, dm) for n in self.num_blocks]

        fpn_out0 = ConvBNAct(mid[2], 1, act="relu", **_BN,
                             name="reduce_layer0")(x0, train)
        f = BiFusion(mid[2], name="bifusion0")(fpn_out0, x1, x2, train)
        f_out0 = _rep_block(f, mid[2], nb[3], train, "Rep_p4")

        fpn_out1 = ConvBNAct(mid[1], 1, act="relu", **_BN,
                             name="reduce_layer1")(f_out0, train)
        f = BiFusion(mid[1], name="bifusion1")(fpn_out1, x2, x3, train)
        pan_out2 = _rep_block(f, out[0], nb[2], train, "Rep_p3")

        down_feat1 = ConvBNAct(mid[0], 3, 2, act="relu", **_BN,
                               name="downsample2")(pan_out2, train)
        pan_out1 = _rep_block(
            jnp.concatenate([down_feat1, fpn_out1], -1), out[1], nb[1],
            train, "Rep_n3")

        down_feat0 = ConvBNAct(out[1], 3, 2, act="relu", **_BN,
                               name="downsample1")(pan_out1, train)
        pan_out0 = _rep_block(
            jnp.concatenate([down_feat0, fpn_out0], -1), out[2], nb[0],
            train, "Rep_n4")
        return (pan_out2, pan_out1, pan_out0)


class Effidehead(nn.Module):
    """Decoupled anchor-free head (reference: heads/det/yolov6_effidehead.py)."""

    num_classes: int

    @nn.compact
    def __call__(self, feats, train: bool = False):
        outs = []
        for i, x in enumerate(feats):
            ch = x.shape[-1]
            x = ConvBNAct(ch, 1, act="silu", **_BN, name=f"stem{i}")(x, train)
            c = ConvBNAct(ch, 3, act="silu", **_BN, name=f"cls_conv{i}")(x, train)
            r = ConvBNAct(ch, 3, act="silu", **_BN, name=f"reg_conv{i}")(x, train)
            import math

            cls = nn.Conv(self.num_classes, (1, 1),
                          bias_init=nn.initializers.constant(
                              -math.log((1 - 0.01) / 0.01)),
                          name=f"cls_out{i}")(c)
            reg = nn.Conv(4, (1, 1), name=f"reg_out{i}")(r)
            B, h, w, _ = cls.shape
            outs.append(jnp.concatenate([reg, cls], -1).reshape(B, h * w, -1))
        return jnp.concatenate(outs, 1)  # (B, P, 4+C)


def decode_yolov6(preds, priors):
    """ltrb distances (in stride units) around prior centers → xyxy
    (reference dist2bbox, yolov6_loss.py:205)."""
    d = jax.nn.relu(preds[..., :4]) * priors[None, :, 2:3]
    cx, cy = priors[None, :, 0], priors[None, :, 1]
    return jnp.stack([cx - d[..., 0], cy - d[..., 1],
                      cx + d[..., 2], cy + d[..., 3]], -1)


def varifocal_loss(logits, targets, labels_onehot, alpha=0.75, gamma=2.0):
    """(reference: yolov6_loss.py:237)"""
    p = jax.nn.sigmoid(logits)
    weight = alpha * (p ** gamma) * (1 - labels_onehot) + targets
    bce = optax.sigmoid_binary_cross_entropy(logits, targets)
    return bce * weight


def yolov6_loss(preds, priors, targets, num_classes,
                num_level_priors=None, epoch=None, warmup_epoch: int = 4):
    """``epoch``: traced int scalar (or None).  When given together with
    ``num_level_priors``, epochs < ``warmup_epoch`` assign with ATSS over
    5·stride grid-cell anchors and soft-label with IoU(pred, gt)
    (reference yolov6_loss.py:80-97, atss_assigner.py:92-96); later epochs
    (and epoch=None) use TAL (yolov6_loss.py:89-97)."""
    reg = preds[..., :4]
    cls_logits = preds[..., 4:]
    boxes = decode_yolov6(preds, priors)
    B, P = cls_logits.shape[:2]
    boxes_d = jax.lax.stop_gradient(boxes)

    def _tal_branch(_):
        assign = jax.vmap(
            lambda cs, db, gb, gl, gv: tal_assign(cs, priors, db, gb, gl, gv)
        )(jax.lax.stop_gradient(jax.nn.sigmoid(cls_logits)), boxes_d,
          targets["boxes"], targets["labels"], targets["valid"])
        return assign["matched_gt"], assign["align_metric"]

    def _atss_branch(_):
        # anchors are grid cells of side grid_cell_size(5)·stride centered
        # on the priors (reference yolov6_loss.py generate_anchors)
        half = priors[:, 2:3] * 2.5
        anchor_boxes = jnp.concatenate(
            [priors[:, :2] - half, priors[:, :2] + half], -1)
        assign = jax.vmap(lambda gb, gl, gv: atss_assign(
            priors, num_level_priors, anchor_boxes, gb, gl, gv,
            topk=9, center_eps=1e-9, strict_thr=True, dedup_unmasked=True,
        ))(targets["boxes"], targets["labels"], targets["valid"])
        mg = assign["matched_gt"]
        gt_b = jnp.take_along_axis(
            targets["boxes"], jnp.maximum(mg, 0)[..., None], axis=1)
        # warmup soft label = IoU(predicted box, assigned gt)
        # (reference atss_assigner.py:92-96: target_scores *= ious)
        align = bbox_iou(boxes_d, gt_b, iou_type="iou") * (mg >= 0)
        return mg, align

    if epoch is None or num_level_priors is None:
        matched_gt, align = _tal_branch(None)
    else:
        matched_gt, align = jax.lax.cond(
            epoch < warmup_epoch, _atss_branch, _tal_branch, None)
    pos = matched_gt >= 0
    safe = jnp.maximum(matched_gt, 0)
    gt_boxes = jnp.take_along_axis(targets["boxes"], safe[..., None], axis=1)
    gt_labels = jnp.take_along_axis(targets["labels"], safe, axis=1)

    onehot = jax.nn.one_hot(gt_labels, num_classes) * pos[..., None]
    soft = onehot * align[..., None]
    vfl = varifocal_loss(cls_logits, soft, onehot)
    denom = jnp.maximum(soft.sum(), 1.0)
    cls_loss = vfl.sum() / denom

    giou = 1.0 - bbox_iou(boxes, gt_boxes, iou_type="giou")
    box_loss = (giou * align * pos).sum() / denom * 2.5

    total = cls_loss + box_loss
    return total, {"cls_loss": cls_loss, "box_loss": box_loss}


#  the reference's shipped v6 confs name the generic
#  'src.models.detectors.yolo_detector.YOLODetector' with v6 parts
#  (conf/det/yolov6/*.yml:67) — alias it here so those ymls work as-is
@MODELS.register(name="YOLOv6", aliases=("YOLODetector",))
class YOLOv6(nn.Module):
    dictionary: Sequence[Any] = ()
    model_cfg: Any = None
    conf_threshold: float = 0.03
    iou_threshold: float = 0.65
    max_det: int = 300
    # epochs assigned with ATSS before switching to TAL
    # (reference yolov6_loss.py:27 warmup_epoch=4)
    warmup_epoch: int = 4

    def setup(self):
        self.num_classes = max(len(self.dictionary), 1)
        cfg = self.model_cfg or {}
        get = cfg.get if hasattr(cfg, "get") else (lambda k, d=None: d)
        subtype = get("TYPE") or "yolov6_s"
        size = subtype.split("_")[-1]
        dm, wm = SIZE_CFG.get(size, (0.33, 0.5))
        self.backbone = EfficientRep(depth_mul=dm, width_mul=wm,
                                     out_stages=(1, 2, 3, 4))
        self.neck = RepBiPAN(width_mul=wm, depth_mul=dm)
        self.head = Effidehead(self.num_classes)

    def _forward(self, images, train: bool):
        feats = self.backbone(images, train=train)
        feats = self.neck(feats, train=train)
        preds = self.head(feats, train=train)
        h, w = images.shape[1:3]
        priors = center_priors([(h // s, w // s) for s in STRIDES], STRIDES)
        # YOLOv6 anchors centers at (x+0.5)*stride
        priors = priors.at[:, 0:2].add(priors[:, 2:4] * 0.5)
        return preds, priors

    def _predict(self, preds, priors, images, targets=None):
        boxes = decode_yolov6(preds, priors)
        scores = jax.nn.sigmoid(preds[..., 4:])
        best, labels = scores.max(-1), scores.argmax(-1)
        dets = batched_nms(boxes, best, labels, max_det=self.max_det,
                           iou_threshold=self.iou_threshold,
                           score_threshold=self.conf_threshold)
        h, w = images.shape[1:3]
        out_boxes = clip_boxes(dets["boxes"], h, w)
        if targets is not None and "pads" in targets:
            out_boxes = unletterbox_boxes(
                out_boxes, targets["pads"][:, None, :],
                targets["scales"][:, None, :])
        return {**dets, "boxes": out_boxes}

    def __call__(self, images, targets=None, mode: str = "infer"):
        train = mode == "train"
        preds, priors = self._forward(images, train=train)
        if mode in ("train", "val"):
            h, w = images.shape[1:3]
            nlp = tuple((h // s) * (w // s) for s in STRIDES)
            total, losses = yolov6_loss(
                preds, priors,
                {"boxes": targets["boxes"], "labels": targets["labels"],
                 "valid": targets["valid"]},
                self.num_classes,
                num_level_priors=nlp,
                epoch=targets.get("epoch") if hasattr(targets, "get") else None,
                warmup_epoch=self.warmup_epoch)
            losses = {**losses, "loss": total}
            if mode == "train":
                return total, losses
            return losses, self._predict(preds, priors, images, targets)
        return self._predict(preds, priors, images, targets)
