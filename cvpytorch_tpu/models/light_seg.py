"""Self-contained lightweight segmentation models
(reference: src/models/backbones/seg/stdcnet.py + heads/seg/stdc_head.py +
DetailAggregateLoss seg_loss.py:325).

All follow the universal forward contract and use the shared seg losses."""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from ..config import dictionary_to_names_weights
from ..registry import BACKBONES, MODELS
from .bricks import BatchNorm, ConvBNAct
from .heads.seg_heads import resize_bilinear
from .losses.seg_loss import cross_entropy_2d, ohem_cross_entropy_2d

_BN = dict(bn_momentum=0.9, bn_eps=1e-5)


def _seg_out(logits, targets, mode, class_weights):
    if mode == "infer":
        return jnp.argmax(logits, -1)
    w = jnp.asarray(class_weights)
    loss = cross_entropy_2d(logits, targets, class_weights=w)
    losses = {"ce_loss": loss, "loss": loss}
    if mode == "train":
        return loss, losses
    return losses, jnp.argmax(logits, -1)


class STDCCatBottleneck(nn.Module):
    """(reference: backbones/seg/stdcnet.py CatBottleneck)"""

    out_channels: int
    stride: int = 1
    blocks: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        # exact reference channel plan (stdcnet.py:80-127, block_num 4):
        # out1 1×1 → ch/2; stride-2 blocks run a depthwise-3×3+BN 'avd'
        # on out1 and 3×3-avg-pool the skip; then ch/4 → ch/8 → ch/8 —
        # concat is exactly ch wide (no truncation)
        ch = self.out_channels
        out1 = ConvBNAct(ch // 2, 1, act="relu", **_BN,
                         name="conv0")(x, train)
        if self.stride == 2:
            h = nn.Conv(ch // 2, (3, 3), strides=2, padding=1,
                        feature_group_count=ch // 2, use_bias=False,
                        name="avd_conv")(out1)
            h = BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name="avd_bn")(h)
            skip = nn.avg_pool(out1, (3, 3), strides=(2, 2),
                               padding=((1, 1), (1, 1)))
        else:
            h = out1
            skip = out1
        outs = [skip]
        div = 4
        for i in range(1, self.blocks):
            c = ch // div if i < self.blocks - 1 else ch // (div // 2)
            h = ConvBNAct(c, 3, act="relu", **_BN,
                          name=f"conv{i}")(h, train)
            outs.append(h)
            div *= 2
        return jnp.concatenate(outs, -1)


@BACKBONES.register(name="STDCNet")
class STDCNet(nn.Module):
    subtype: str = "stdc1"
    out_stages: Sequence[int] = (3, 4, 5)
    classifier: bool = False
    num_classes: int = 1000
    pretrained: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        layers = {"stdc1": (2, 2, 2), "stdc2": (4, 5, 3)}[self.subtype]
        x = ConvBNAct(32, 3, 2, act="relu", **_BN, name="stem1")(x, train)
        x = ConvBNAct(64, 3, 2, act="relu", **_BN, name="stem2")(x, train)
        feats = []
        chs = (256, 512, 1024)
        for si, (n, ch) in enumerate(zip(layers, chs), start=3):
            for j in range(n):
                x = STDCCatBottleneck(ch, stride=2 if j == 0 else 1,
                                      name=f"stage{si}_{j}")(x, train)
            if si in self.out_stages and not self.classifier:
                feats.append(x)
        if self.classifier:
            return nn.Dense(self.num_classes, name="fc")(
                jnp.mean(x, axis=(1, 2)))
        return tuple(feats)


_LAPLACIAN = jnp.array([[-1.0, -1, -1], [-1, 8, -1], [-1, -1, -1]])


def detail_target(labels, ignore_index: int = 255):
    """Multi-scale binary boundary pyramid from a seg mask (reference
    DetailAggregateLoss, seg_loss.py:325-377 EXACTLY): laplacian at
    strides 1/2/4, clamp(min=0), nearest-upsample, threshold at 0.1,
    fused with the [0.6, 0.3, 0.1] kernel, re-thresholded.  (The
    reference also computes a stride-8 map it never stacks.)"""
    m = jnp.where(labels == ignore_index, 0, labels).astype(jnp.float32)
    k = _LAPLACIAN.reshape(3, 3, 1, 1)
    H, W = m.shape[1:3]

    def lap(stride):
        e = jax.lax.conv_general_dilated(
            m[..., None], k, (stride, stride), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[..., 0]
        return jnp.clip(e, 0.0, None)

    def up(x):
        return jax.image.resize(x, (x.shape[0], H, W), method="nearest")

    t1 = (lap(1) > 0.1).astype(jnp.float32)
    t2 = (up(lap(2)) > 0.1).astype(jnp.float32)
    t4 = (up(lap(4)) > 0.1).astype(jnp.float32)
    fused = 0.6 * t1 + 0.3 * t2 + 0.1 * t4
    return (fused > 0.1).astype(jnp.float32)


def detail_loss(detail_logits, labels, ignore_index: int = 255):
    """BCE + dice over the fused boundary target (reference
    seg_loss.py:378-384 + dice_loss_func :312-322)."""
    t = detail_target(labels, ignore_index)
    bce = optax.sigmoid_binary_cross_entropy(detail_logits, t).mean()
    p = jax.nn.sigmoid(detail_logits).reshape(t.shape[0], -1)
    tf = t.reshape(t.shape[0], -1)
    inter = (p * tf).sum(1)
    dice = 1.0 - (2.0 * inter + 1.0) / (p.sum(1) + tf.sum(1) + 1.0)
    return bce, dice.mean()


@MODELS.register(name="STDC")
class STDC(nn.Module):
    """STDC seg model: STDCNet + FFM-style context head + detail head
    (reference: heads/seg/stdc_head.py + necks/seg/stdc_neck.py)."""

    dictionary: Sequence[Any] = ()
    model_cfg: Any = None
    subtype: str = "stdc1"
    detail_weight: float = 1.0

    def setup(self):
        names, weights = dictionary_to_names_weights(list(self.dictionary))
        self.num_classes = len(names)
        self._w = tuple(weights)
        self.backbone = STDCNet(subtype=self.subtype)

    @nn.compact
    def __call__(self, images, targets=None, mode: str = "infer"):
        train = mode == "train"
        c3, c4, c5 = self.backbone(images, train=train)
        # global context + fuse
        gc = jnp.mean(c5, axis=(1, 2), keepdims=True)
        gc = ConvBNAct(128, 1, act="relu", **_BN, name="gc")(gc, train)
        p5 = ConvBNAct(128, 1, act="relu", **_BN, name="p5")(c5, train) + gc
        p4 = ConvBNAct(128, 1, act="relu", **_BN, name="p4")(c4, train) + \
            resize_bilinear(p5, c4.shape[1:3])
        p3 = ConvBNAct(128, 1, act="relu", **_BN, name="p3")(c3, train) + \
            resize_bilinear(p4, c3.shape[1:3])
        x = ConvBNAct(128, 3, act="relu", **_BN, name="fuse")(p3, train)
        logits = nn.Conv(self.num_classes, (1, 1), name="head")(x)
        logits = resize_bilinear(logits, images.shape[1:3])
        detail_logits = nn.Conv(1, (1, 1), name="detail_head")(x)
        detail_logits = resize_bilinear(detail_logits, images.shape[1:3])

        if mode == "infer":
            return jnp.argmax(logits, -1)
        w = jnp.asarray(self._w)
        seg = ohem_cross_entropy_2d(logits, targets, class_weights=w)
        # full DetailAggregateLoss: multi-scale fused boundary, BCE + dice
        bce, dice = detail_loss(detail_logits[..., 0], targets)
        det = bce + dice
        total = seg + self.detail_weight * det
        losses = {"seg_loss": seg, "detail_bce": bce, "detail_dice": dice,
                  "detail_loss": det, "loss": total}
        if mode == "train":
            return total, losses
        return losses, jnp.argmax(logits, -1)
