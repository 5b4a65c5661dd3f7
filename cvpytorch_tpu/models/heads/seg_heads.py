"""Segmentation heads (reference: src/models/heads/seg/ — FCNHead, PSPHead,
Deeplabv3Head/Deeplabv3PlusHead with ASPP (modules/aspp.py:37), UPerHead).

All heads take the backbone feature tuple (C2..C5 subset) and return
per-pixel logits at feature resolution; the EncoderDecoder upsamples to the
input size (reference: segmentors/encoder_decoder.py:99)."""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...registry import HEADS
from ..bricks import ConvBNAct, DepthwiseSeparableConv

_BN = dict(bn_momentum=0.9, bn_eps=1e-5)


def resize_bilinear(x, size):
    """NHWC bilinear resize inside jit (torch F.interpolate
    align_corners=False semantics — which also never antialiases on
    downsampling, hence antialias=False)."""
    return jax.image.resize(
        x, (x.shape[0], size[0], size[1], x.shape[-1]), method="bilinear",
        antialias=False,
    )


@HEADS.register(name="FCNHead")
class FCNHead(nn.Module):
    """(reference: heads/seg/fcn_head.py:14-64 — conv stack, then with
    is_concat=True a conv_cat over cat([input, feats]); every reference
    yml passes is_concat=False but the code default is True)."""

    num_classes: int = 19
    channels: int = 256
    num_convs: int = 2
    in_index: int = -1
    dropout: float = 0.1
    is_concat: bool = True
    dilation: int = 1

    @nn.compact
    def __call__(self, feats, train: bool = False):
        inp = feats[self.in_index] if isinstance(feats, (tuple, list)) \
            else feats
        x = inp
        for i in range(self.num_convs):
            x = ConvBNAct(self.channels, 3, dilation=self.dilation,
                          act="relu", **_BN, name=f"conv{i}")(x, train)
        if self.is_concat:
            x = ConvBNAct(self.channels, 3, act="relu", **_BN,
                          name="conv_cat")(
                jnp.concatenate([inp, x], axis=-1), train)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Conv(self.num_classes, (1, 1), name="cls")(x)


def _aspp_branches(x, channels, dilations, separable, train):
    """Reference ASPP branch list (deeplabv3_head.py:37-46; V3+ swaps
    dilated branches for depthwise-separable, deeplabv3plus_head.py:14-29).
    A separate global-pool `proj` branch is prepended by the heads."""
    outs = []
    for i, d in enumerate(dilations):
        if d == 1:
            b = ConvBNAct(channels, 1, act="relu", **_BN,
                          name=f"aspp{i}")(x, train)
        elif separable:
            b = DepthwiseSeparableConv(channels, 3, dilation=d, act="relu",
                                       **_BN, name=f"aspp{i}")(x, train)
        else:
            b = ConvBNAct(channels, 3, dilation=d, act="relu", **_BN,
                          name=f"aspp{i}")(x, train)
        outs.append(b)
    return outs


@HEADS.register(name="Deeplabv3Head")
class Deeplabv3Head(nn.Module):
    """(reference: heads/seg/deeplabv3_head.py:50-77 — global-pool proj +
    ASPP + 3×3 reduce + classify)."""

    num_classes: int = 19
    channels: int = 256
    dilations: Sequence[int] = (1, 12, 24, 36)
    dropout: float = 0.1
    separable: bool = False

    @nn.compact
    def __call__(self, feats, train: bool = False):
        x = feats[-1]
        gp = jnp.mean(x, axis=(1, 2), keepdims=True)
        gp = ConvBNAct(self.channels, 1, act="relu", **_BN,
                       name="proj")(gp, train)
        gp = resize_bilinear(gp, x.shape[1:3])
        outs = [gp] + _aspp_branches(x, self.channels, self.dilations,
                                     self.separable, train)
        x = jnp.concatenate(outs, axis=-1)
        x = ConvBNAct(self.channels, 3, act="relu", **_BN,
                      name="reduce")(x, train)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Conv(self.num_classes, (1, 1), name="cls")(x)


@HEADS.register(name="Deeplabv3PlusHead")
class Deeplabv3PlusHead(nn.Module):
    """Separable ASPP on C5 + low-level C2 fusion (reference:
    heads/seg/deeplabv3plus_head.py:33-69)."""

    num_classes: int = 19
    channels: int = 256
    low_channels: int = 48
    dilations: Sequence[int] = (1, 12, 24, 36)
    dropout: float = 0.1

    @nn.compact
    def __call__(self, feats, train: bool = False):
        low, high = feats[0], feats[-1]
        gp = jnp.mean(high, axis=(1, 2), keepdims=True)
        gp = ConvBNAct(self.channels, 1, act="relu", **_BN,
                       name="proj")(gp, train)
        gp = resize_bilinear(gp, high.shape[1:3])
        outs = [gp] + _aspp_branches(high, self.channels, self.dilations,
                                     True, train)
        x = jnp.concatenate(outs, axis=-1)
        x = ConvBNAct(self.channels, 3, act="relu", **_BN,
                      name="reduce")(x, train)
        low = ConvBNAct(self.low_channels, 1, act="relu", **_BN,
                        name="low_proj")(low, train)
        x = resize_bilinear(x, low.shape[1:3])
        x = jnp.concatenate([x, low], axis=-1)
        x = DepthwiseSeparableConv(self.channels, 3, act="relu", **_BN,
                                   name="fuse0")(x, train)
        x = DepthwiseSeparableConv(self.channels, 3, act="relu", **_BN,
                                   name="fuse1")(x, train)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Conv(self.num_classes, (1, 1), name="cls")(x)


@HEADS.register(name="PSPHead")
class PSPHead(nn.Module):
    """Pyramid pooling head (reference: heads/seg/psp_head.py)."""

    num_classes: int = 19
    channels: int = 512
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    dropout: float = 0.1

    @nn.compact
    def __call__(self, feats, train: bool = False):
        x = feats[-1]
        h, w = x.shape[1:3]
        branches = [x]
        for i, s in enumerate(self.pool_scales):
            # adaptive average pool to s×s
            p = jax.image.resize(x, (x.shape[0], s, s, x.shape[-1]), "linear") \
                if (h % s or w % s) else \
                nn.avg_pool(x, (h // s, w // s), strides=(h // s, w // s))
            p = ConvBNAct(self.channels, 1, act="relu", **_BN,
                          name=f"pool{i}")(p, train)
            branches.append(resize_bilinear(p, (h, w)))
        y = jnp.concatenate(branches, axis=-1)
        y = ConvBNAct(self.channels, 3, act="relu", **_BN,
                      name="bottleneck")(y, train)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return nn.Conv(self.num_classes, (1, 1), name="cls")(y)


@HEADS.register(name="UPerHead")
class UPerHead(nn.Module):
    """FPN + PPM unified head (reference: heads/seg/uper_head.py)."""

    num_classes: int = 19
    channels: int = 256
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    dropout: float = 0.1

    @nn.compact
    def __call__(self, feats, train: bool = False):
        # PPM on the deepest level
        c5 = feats[-1]
        h, w = c5.shape[1:3]
        ppm = [c5]
        for i, s in enumerate(self.pool_scales):
            # AdaptiveAvgPool2d(s): exact block means when divisible
            # (the torch semantics); resize fallback otherwise
            p = nn.avg_pool(c5, (h // s, w // s),
                            strides=(h // s, w // s)) \
                if not (h % s or w % s) else \
                jax.image.resize(c5, (c5.shape[0], s, s, c5.shape[-1]),
                                 "linear")
            p = ConvBNAct(self.channels, 1, act="relu", **_BN,
                          name=f"ppm{i}")(p, train)
            ppm.append(resize_bilinear(p, (h, w)))
        top = ConvBNAct(self.channels, 3, act="relu", **_BN, name="ppm_bottleneck")(
            jnp.concatenate(ppm, axis=-1), train)

        # top-down FPN
        laterals = [
            ConvBNAct(self.channels, 1, act="relu", **_BN,
                      name=f"lateral{i}")(f, train)
            for i, f in enumerate(feats[:-1])
        ] + [top]
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + resize_bilinear(
                laterals[i], laterals[i - 1].shape[1:3])
        outs = [
            ConvBNAct(self.channels, 3, act="relu", **_BN,
                      name=f"fpn_conv{i}")(l, train)
            for i, l in enumerate(laterals[:-1])
        ] + [laterals[-1]]
        size = outs[0].shape[1:3]
        outs = [resize_bilinear(o, size) for o in outs]
        y = ConvBNAct(self.channels, 3, act="relu", **_BN, name="fuse")(
            jnp.concatenate(outs, axis=-1), train)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return nn.Conv(self.num_classes, (1, 1), name="cls")(y)
