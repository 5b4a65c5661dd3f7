"""SegNet and ENet — faithful architectures with real max-unpooling
(reference: src/models/segnet.py:71-160, src/models/enet.py:152-254).

Round 1 shipped reduced variants (bilinear for unpool, thinned ENet
stages, ReLU for PReLU); these match the reference layer-for-layer:
pooling indices flow encoder→decoder via `ops/pool.max_pool_argmax` /
`max_unpool` (exact torch semantics, shifted-slice formulation), ENet
keeps its PReLUs, channel-padded Down residuals, asymmetric 5×1/1×5 and
dilated bottlenecks, and transpose-conv upsampling.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .bricks import BatchNorm

from ..config import dictionary_to_names_weights
from ..ops.pool import max_pool_argmax, max_unpool
from ..registry import MODELS
from .losses.seg_loss import bce_2d, cross_entropy_2d

_BN = dict(momentum=0.9, epsilon=1e-5)   # torch BN defaults (0.1 / 1e-5)


class PReLU(nn.Module):
    """Single-parameter PReLU, torch layout (shape (1,), init .25).
    Param named 'scale' — the porter maps 1-D torch 'weight's there."""

    @nn.compact
    def __call__(self, x):
        a = self.param("scale", lambda k: jnp.full((1,), 0.25, jnp.float32))
        return jnp.where(x >= 0, x, a * x)


class _CBA(nn.Module):
    """conv + BN + {relu|prelu|none} with torch-compatible child names
    (reference enet.py Conv1x1BNReLU / Conv3x3BNReLU / Conv2x2BNReLU;
    segnet.py Conv3x3BNReLU uses bias=True)."""

    out_channels: int
    kernel: Any = 3
    stride: int = 1
    dilation: int = 1
    act: str | None = "relu"
    use_bias: bool = False
    transpose: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel if isinstance(self.kernel, (tuple, list)) else (
            self.kernel, self.kernel)
        if self.transpose:
            # torch ConvTranspose2d(k=3, s=2, p=1, output_padding=1)
            x = nn.ConvTranspose(self.out_channels, k, strides=(2, 2),
                                 padding=((1, 2), (1, 2)),
                                 use_bias=self.use_bias, name="conv")(x)
        else:
            pad = tuple(((kk - 1) // 2 * self.dilation,) * 2 for kk in k)
            x = nn.Conv(self.out_channels, k, strides=self.stride,
                        padding=pad if k[0] > 1 or k[1] > 1 else 0,
                        kernel_dilation=self.dilation,
                        use_bias=self.use_bias, name="conv")(x)
        x = BatchNorm(use_running_average=not train, **_BN, name="bn")(x)
        if self.act == "relu":
            x = nn.relu(x)
        elif self.act == "prelu":
            x = PReLU(name="act")(x)
        return x


# ---------------------------------------------------------------- SegNet --
def _conv_stack(x, chans, prefix, train):
    for j, ch in enumerate(chans):
        x = _CBA(ch, 3, use_bias=True, name=f"{prefix}_{j}")(x, train)
    return x


@MODELS.register(name="SegNet")
class SegNet(nn.Module):
    """VGG encoder/decoder with pooling-index unpooling
    (reference: segnet.py:71-160)."""

    dictionary: Sequence[Any] = ()
    model_cfg: Any = None

    def setup(self):
        names, weights = dictionary_to_names_weights(list(self.dictionary))
        self.num_classes = len(names)
        self._w = tuple(weights)

    @nn.compact
    def __call__(self, images, targets=None, mode: str = "infer"):
        train = mode == "train"
        enc_plan = [  # (block chans, reverse-decoder chans)
            ((64, 64), None), ((128, 128), None), ((256, 256, 256), None),
            ((512, 512, 512), None), ((512, 512, 512), None),
        ]
        x = images
        ids, sizes = [], []
        for i, (chans, _) in enumerate(enc_plan):
            x = _conv_stack(x, chans, f"encoder{i+1}", train)
            sizes.append(x.shape[1:3])
            x, idx = max_pool_argmax(x, 2, 2, 0)
            ids.append(idx)
        dec_plan = [  # reference decoder5..1 (reverse DoubleConv/TripleConv)
            (512, 512, 512), (512, 512, 256), (256, 256, 128), (128, 64),
        ]
        for i, chans in enumerate(dec_plan):
            x = max_unpool(x, ids[4 - i], sizes[4 - i])
            x = _conv_stack(x, chans, f"decoder{5-i}", train)
        x = max_unpool(x, ids[0], sizes[0])
        x = _CBA(64, 3, use_bias=True, name="decoder1_0")(x, train)
        logits = nn.Conv(self.num_classes, (3, 3), padding=1,
                         name="outconv")(x)
        if mode == "infer":
            return jnp.argmax(logits, -1)
        # reference SegNet trains on BCEWithLogits only (segnet.py:152-156)
        loss = bce_2d(logits, targets)
        losses = {"bce_loss": loss, "loss": loss}
        if mode == "train":
            return loss, losses
        return losses, jnp.argmax(logits, -1)


# ------------------------------------------------------------------ ENet --
class RegularBottleneck(nn.Module):
    """(reference: enet.py:83-100)"""

    channels: int
    dilation: int = 1
    asymmetric: bool = False
    relu: bool = False      # False → PReLU (reference is_relu)
    drop: float = 0.01

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = x.shape[-1] // 4
        act = "relu" if self.relu else "prelu"
        h = _CBA(mid, 1, act="prelu", name="c0")(x, train)
        if self.asymmetric:
            h = _CBA(mid, (5, 1), act=act, name="c1a")(h, train)
            h = _CBA(mid, (1, 5), act=act, name="c1b")(h, train)
        else:
            h = _CBA(mid, 3, dilation=self.dilation, act=act,
                     name="c1a")(h, train)
        h = _CBA(self.channels, 1, act=act, name="c2")(h, train)
        h = nn.Dropout(self.drop, broadcast_dims=(1, 2),
                       deterministic=not train)(h)  # torch Dropout2d
        h = h + x
        return nn.relu(h) if self.relu else PReLU(name="act")(h)


class DownBottleneck(nn.Module):
    """(reference: enet.py:103-126) — returns (out, pool indices)."""

    channels: int
    relu: bool = False
    drop: float = 0.01

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = x.shape[-1] // 4
        act = "relu" if self.relu else "prelu"
        h = _CBA(mid, 2, stride=2, act=act, name="c0")(x, train)
        h = _CBA(mid, 3, act=act, name="c1a")(h, train)
        h = _CBA(self.channels, 1, act=act, name="c2")(h, train)
        h = nn.Dropout(self.drop, broadcast_dims=(1, 2),
                       deterministic=not train)(h)  # torch Dropout2d
        res, idx = max_pool_argmax(x, 3, 2, 1)
        res = jnp.pad(res, ((0, 0), (0, 0), (0, 0),
                            (0, self.channels - res.shape[-1])))
        h = h + res
        out = nn.relu(h) if self.relu else PReLU(name="act")(h)
        return out, idx


class UpBottleneck(nn.Module):
    """(reference: enet.py:129-149) — consumes recorded pool indices."""

    channels: int
    relu: bool = True
    drop: float = 0.1

    @nn.compact
    def __call__(self, x, indices, train: bool = False):
        mid = x.shape[-1] // 4
        act = "relu" if self.relu else "prelu"
        h = _CBA(mid, 1, act=act, name="c0")(x, train)
        h = _CBA(mid, 3, act=act, transpose=True, name="c1a")(h, train)
        h = _CBA(self.channels, 1, act=act, name="c2")(h, train)
        h = nn.Dropout(self.drop, broadcast_dims=(1, 2),
                       deterministic=not train)(h)  # torch Dropout2d
        res = _CBA(self.channels, 1, act=None, name="up_conv")(x, train)
        # indices were recorded by the matching DownBottleneck on a map of
        # exactly `channels` channels at 2× this resolution
        res = max_unpool(res, indices, (x.shape[1] * 2, x.shape[2] * 2))
        h = h + res
        return nn.relu(h) if self.relu else PReLU(name="act")(h)


@MODELS.register(name="ENet")
class ENet(nn.Module):
    """Full 5-stage ENet (reference: enet.py:152-254)."""

    dictionary: Sequence[Any] = ()
    model_cfg: Any = None

    def setup(self):
        names, weights = dictionary_to_names_weights(list(self.dictionary))
        self.num_classes = len(names)
        self._w = tuple(weights)

    @nn.compact
    def __call__(self, images, targets=None, mode: str = "infer"):
        train = mode == "train"
        # InitialBlock: conv(13)/2 ‖ maxpool(3,2,1), BN, PReLU (enet.py:69)
        c = nn.Conv(13, (3, 3), strides=2, padding=1, use_bias=False,
                    name="init_conv")(images)
        p, _ = max_pool_argmax(images, 3, 2, 1)
        x = jnp.concatenate([c, p], -1)
        x = BatchNorm(use_running_average=not train, **_BN,
                         name="init_bn")(x)
        x = PReLU(name="init_act")(x)

        x, id1 = DownBottleneck(64, drop=0.01, name="stage1_1")(x, train)
        for i in range(4):
            x = RegularBottleneck(64, drop=0.01,
                                  name=f"stage1_2_{i}")(x, train)
        x, id2 = DownBottleneck(128, drop=0.1, name="stage2_1")(x, train)
        plan = [(1, False, 0.1), (2, False, 0.1), (1, True, 0.1),
                (4, False, 0.1), (1, False, 0.01), (8, False, 0.1),
                (1, True, 0.1), (16, False, 0.1)]
        for i, (dil, asym, p_) in enumerate(plan):
            x = RegularBottleneck(128, dilation=dil, asymmetric=asym,
                                  drop=p_, name=f"stage2_2_{i}")(x, train)
        for i, (dil, asym, p_) in enumerate(plan):
            x = RegularBottleneck(128, dilation=dil, asymmetric=asym,
                                  drop=p_, name=f"stage3_{i}")(x, train)
        x = UpBottleneck(64, relu=True, drop=0.1,
                         name="stage4_1")(x, id2, train)
        for i in range(2):
            x = RegularBottleneck(64, relu=True, drop=0.1,
                                  name=f"stage4_2_{i}")(x, train)
        x = UpBottleneck(16, relu=True, drop=0.1,
                         name="stage5_1")(x, id1, train)
        x = RegularBottleneck(16, relu=True, drop=0.1,
                              name="stage5_2")(x, train)
        logits = nn.ConvTranspose(self.num_classes, (3, 3), strides=(2, 2),
                                  padding=((1, 2), (1, 2)), use_bias=False,
                                  name="final_conv")(x)
        if mode == "infer":
            return jnp.argmax(logits, -1)
        w = jnp.asarray(self._w)
        loss = cross_entropy_2d(logits, targets, class_weights=w)
        losses = {"ce_loss": loss, "loss": loss}
        if mode == "train":
            return loss, losses
        return losses, jnp.argmax(logits, -1)
