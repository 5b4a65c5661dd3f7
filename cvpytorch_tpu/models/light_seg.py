"""Self-contained lightweight segmentation models
(reference: src/models/segnet.py:71, src/models/enet.py:152,
src/models/backbones/seg/stdcnet.py + heads/seg/stdc_head.py +
DetailAggregateLoss seg_loss.py:325).

All follow the universal forward contract and use the shared seg losses."""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import dictionary_to_names_weights
from ..registry import BACKBONES, MODELS
from .bricks import ConvBNAct
from .heads.seg_heads import resize_bilinear
from .losses.seg_loss import cross_entropy_2d, ohem_cross_entropy_2d

_BN = dict(bn_momentum=0.9, bn_eps=1e-5)


@MODELS.register(name="SegNet")
class SegNet(nn.Module):
    """VGG-style encoder/decoder (reference: segnet.py:71).  The
    max-unpooling of the original is replaced by bilinear upsampling —
    pooling indices don't map to XLA; accuracy-equivalent in practice."""

    dictionary: Sequence[Any] = ()
    model_cfg: Any = None
    widths: Sequence[int] = (64, 128, 256, 512, 512)

    def setup(self):
        names, weights = dictionary_to_names_weights(list(self.dictionary))
        self.num_classes = len(names)
        self._w = tuple(weights)

    @nn.compact
    def __call__(self, images, targets=None, mode: str = "infer"):
        train = mode == "train"
        x = images
        for i, ch in enumerate(self.widths):
            for j in range(2 if i < 2 else 3):
                x = ConvBNAct(ch, 3, act="relu", **_BN,
                              name=f"enc{i}_{j}")(x, train)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        for i, ch in enumerate(reversed(self.widths)):
            x = resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2))
            for j in range(2 if i >= 3 else 3):
                out_ch = ch if j < 1 else (
                    list(reversed(self.widths)) + [self.widths[0]])[i + 1] \
                    if j == (1 if i >= 3 else 2) else ch
                x = ConvBNAct(out_ch, 3, act="relu", **_BN,
                              name=f"dec{i}_{j}")(x, train)
        logits = nn.Conv(self.num_classes, (1, 1), name="head")(x)
        return _seg_out(logits, targets, mode, self._w)


def _seg_out(logits, targets, mode, class_weights):
    if mode == "infer":
        return jnp.argmax(logits, -1)
    w = jnp.asarray(class_weights)
    loss = cross_entropy_2d(logits, targets, class_weights=w)
    losses = {"ce_loss": loss, "loss": loss}
    if mode == "train":
        return loss, losses
    return losses, jnp.argmax(logits, -1)


class ENetBottleneck(nn.Module):
    out_channels: int
    downsample: bool = False
    dilation: int = 1
    asymmetric: bool = False
    upsample: bool = False
    drop: float = 0.01

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.out_channels // 4
        main = x
        if self.downsample:
            main = nn.max_pool(x, (2, 2), strides=(2, 2))
        if self.upsample:
            main = resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2))
        if main.shape[-1] != self.out_channels:
            main = ConvBNAct(self.out_channels, 1, act=None, **_BN,
                             name="skip")(main, train)
        h = ConvBNAct(mid, 2 if self.downsample else 1,
                      2 if self.downsample else 1, act="relu", **_BN,
                      name="reduce")(x, train)
        if self.upsample:
            h = resize_bilinear(h, (h.shape[1] * 2, h.shape[2] * 2))
            h = ConvBNAct(mid, 3, act="relu", **_BN, name="mid")(h, train)
        elif self.asymmetric:
            h = ConvBNAct(mid, (5, 1), act="relu", **_BN, name="mid_a")(h, train)
            h = ConvBNAct(mid, (1, 5), act="relu", **_BN, name="mid_b")(h, train)
        else:
            h = ConvBNAct(mid, 3, dilation=self.dilation, act="relu", **_BN,
                          name="mid")(h, train)
        h = ConvBNAct(self.out_channels, 1, act=None, **_BN,
                      name="expand")(h, train)
        h = nn.Dropout(self.drop, deterministic=not train)(h)
        return nn.relu(main + h)


@MODELS.register(name="ENet")
class ENet(nn.Module):
    """(reference: enet.py:152)"""

    dictionary: Sequence[Any] = ()
    model_cfg: Any = None

    def setup(self):
        names, weights = dictionary_to_names_weights(list(self.dictionary))
        self.num_classes = len(names)
        self._w = tuple(weights)

    @nn.compact
    def __call__(self, images, targets=None, mode: str = "infer"):
        train = mode == "train"
        # initial: 3x3/2 conv(13) || maxpool(3) concat → 16
        c = ConvBNAct(13, 3, 2, act="relu", **_BN, name="init_conv")(
            images, train)
        p = nn.max_pool(images, (2, 2), strides=(2, 2))
        x = jnp.concatenate([c, p], -1)
        x = ENetBottleneck(64, downsample=True, name="b1_0")(x, train)
        for i in range(4):
            x = ENetBottleneck(64, name=f"b1_{i+1}")(x, train)
        x = ENetBottleneck(128, downsample=True, name="b2_0")(x, train)
        for i, (dil, asym) in enumerate(
                [(1, False), (2, False), (1, True), (4, False),
                 (1, False), (8, False), (1, True), (16, False)]):
            x = ENetBottleneck(128, dilation=dil, asymmetric=asym,
                               name=f"b2_{i+1}")(x, train)
        x = ENetBottleneck(64, upsample=True, name="b4_0")(x, train)
        x = ENetBottleneck(64, name="b4_1")(x, train)
        x = ENetBottleneck(16, upsample=True, name="b5_0")(x, train)
        x = ENetBottleneck(16, name="b5_1")(x, train)
        x = nn.ConvTranspose(self.num_classes, (2, 2), strides=(2, 2),
                             name="head")(x)
        return _seg_out(x, targets, mode, self._w)


class STDCCatBottleneck(nn.Module):
    """(reference: backbones/seg/stdcnet.py CatBottleneck)"""

    out_channels: int
    stride: int = 1
    blocks: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        ch = self.out_channels
        h = ConvBNAct(ch // 2, 1, act="relu", **_BN, name="conv0")(x, train)
        if self.stride == 2:
            skip = nn.avg_pool(h, (3, 3), strides=(2, 2),
                               padding=((1, 1), (1, 1)))
            outs.append(skip)
            h = ConvBNAct(ch // 2, 3, 2, act="relu", **_BN,
                          name="conv1")(h, train)
        else:
            outs.append(h)
            h = ConvBNAct(ch // 2, 3, act="relu", **_BN, name="conv1")(h, train)
        outs.append(h)
        div = 4
        for i in range(2, self.blocks):
            h = ConvBNAct(ch // div, 3, act="relu", **_BN,
                          name=f"conv{i}")(h, train)
            outs.append(h)
            div *= 2
        return jnp.concatenate(outs, -1)[..., :ch]


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
    """Binary boundary map from a seg mask via laplacian
    (reference DetailAggregateLoss, seg_loss.py:325)."""
    m = jnp.where(labels == ignore_index, 0, labels).astype(jnp.float32)
    k = _LAPLACIAN.reshape(3, 3, 1, 1)
    e = jax.lax.conv_general_dilated(
        m[..., None], k, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[..., 0]
    return (jnp.abs(e) > 0.1).astype(jnp.float32)


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
        dt = detail_target(targets)
        import optax

        det = optax.sigmoid_binary_cross_entropy(
            detail_logits[..., 0], dt).mean()
        total = seg + self.detail_weight * det
        losses = {"seg_loss": seg, "detail_loss": det, "loss": total}
        if mode == "train":
            return total, losses
        return losses, jnp.argmax(logits, -1)
