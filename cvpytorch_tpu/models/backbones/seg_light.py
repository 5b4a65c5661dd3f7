"""TopFormer and RegSeg backbones + heads
(reference: src/models/backbones/seg/topformer_backbone.py,
src/models/backbones/seg/regseg_backbone.py,
src/models/heads/seg/{topformer_head,regseg_head}.py).

TopFormer: MobileNetV2-style token pyramid → pooled multi-scale tokens →
transformer (the 'Semantics Extractor') → SIM injection back into each
scale.  RegSeg: dilated group-conv D-blocks (exp48_decoder26 layout)."""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...registry import BACKBONES, HEADS
from ..bricks import ConvBNAct, get_activation
from ..heads.seg_heads import resize_bilinear

_BN = dict(bn_momentum=0.9, bn_eps=1e-5)


class _MBBlock(nn.Module):
    out: int
    stride: int = 1
    expand: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        hid = in_ch * self.expand
        h = ConvBNAct(hid, 1, act="relu6", **_BN, name="expand")(x, train) \
            if self.expand != 1 else x
        h = ConvBNAct(hid if self.expand != 1 else in_ch, 3, self.stride,
                      groups=h.shape[-1], act="relu6", **_BN,
                      name="dw")(h, train)
        h = ConvBNAct(self.out, 1, act=None, **_BN, name="project")(h, train)
        if self.stride == 1 and in_ch == self.out:
            return x + h
        return h


@BACKBONES.register(name="TopFormerBackbone", aliases=("TopFormer_bb",))
class TopFormerBackbone(nn.Module):
    subtype: str = "topformer_t"
    out_stages: Sequence[int] = (1, 2, 3, 4)
    classifier: bool = False
    num_classes: int = 1000
    pretrained: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        dims = {"topformer_t": (16, 32, 64, 96),
                "topformer_s": (24, 48, 96, 128),
                "topformer_b": (32, 64, 128, 160)}[self.subtype]
        embed = sum(dims)
        x = ConvBNAct(16, 3, 2, act="relu6", **_BN, name="stem")(x, train)
        feats = []
        for si, d in enumerate(dims, start=1):
            x = _MBBlock(d, stride=2, name=f"stage{si}_down")(x, train)
            x = _MBBlock(d, name=f"stage{si}_b1")(x, train)
            feats.append(x)
        # token pyramid: pool every scale to the smallest, concat channels
        tgt = feats[-1].shape[1:3]
        tokens = jnp.concatenate(
            [jax.image.resize(f, (f.shape[0], *tgt, f.shape[-1]), "linear")
             for f in feats], -1)
        B, h, w, C = tokens.shape
        t = tokens.reshape(B, h * w, C)
        for i in range(2):  # semantics extractor
            a = nn.MultiHeadDotProductAttention(
                num_heads=4, name=f"attn{i}")(nn.LayerNorm(
                    name=f"ln1_{i}")(t))
            t = t + a
            f2 = nn.Dense(C * 2, name=f"mlp1_{i}")(nn.LayerNorm(
                name=f"ln2_{i}")(t))
            t = t + nn.Dense(C, name=f"mlp2_{i}")(nn.gelu(f2))
        global_tokens = t.reshape(B, h, w, C)
        # SIM injection: per scale, local + upsampled global (proj + gate)
        outs = []
        start = 0
        for si, (f, d) in enumerate(zip(feats, dims)):
            g = resize_bilinear(global_tokens, f.shape[1:3])
            g_proj = ConvBNAct(d, 1, act=None, **_BN,
                               name=f"inj_g{si}")(g, train)
            gate = nn.sigmoid(ConvBNAct(d, 1, act=None, **_BN,
                                        name=f"inj_gate{si}")(g, train))
            l_proj = ConvBNAct(d, 1, act=None, **_BN,
                               name=f"inj_l{si}")(f, train)
            outs.append(l_proj * gate + g_proj)
        if self.classifier:
            return nn.Dense(self.num_classes, name="fc")(
                jnp.mean(outs[-1], axis=(1, 2)))
        return tuple(outs[i - 1] for i in self.out_stages)


@HEADS.register(name="TopFormerHead")
class TopFormerHead(nn.Module):
    """Sum-fused light head (reference: heads/seg/topformer_head.py)."""

    num_classes: int = 19
    channels: int = 96
    dropout: float = 0.1

    @nn.compact
    def __call__(self, feats, train: bool = False):
        size = feats[0].shape[1:3]
        acc = None
        for i, f in enumerate(feats):
            y = ConvBNAct(self.channels, 1, act="relu", **_BN,
                          name=f"proj{i}")(f, train)
            y = resize_bilinear(y, size)
            acc = y if acc is None else acc + y
        acc = ConvBNAct(self.channels, 1, act="relu", **_BN,
                        name="fuse")(acc, train)
        acc = nn.Dropout(self.dropout, deterministic=not train)(acc)
        return nn.Conv(self.num_classes, (1, 1), name="cls")(acc)


class _DBlock(nn.Module):
    """RegSeg dilated group-conv block (reference: regseg_backbone.py)."""

    out: int
    stride: int = 1
    dilations: Sequence[int] = (1, 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        h = ConvBNAct(self.out, 1, act="relu", **_BN, name="reduce")(x, train)
        g = self.out // len(self.dilations)
        branches = []
        for i, d in enumerate(self.dilations):
            branches.append(ConvBNAct(
                g, 3, self.stride, dilation=d, act="relu", **_BN,
                name=f"dw{i}")(h[..., i * g:(i + 1) * g], train))
        h = jnp.concatenate(branches, -1)
        # SE
        from ..bricks import SqueezeExcite

        h = SqueezeExcite(reduce_ratio=4, gate="sigmoid",
                          name="se")(h)
        h = ConvBNAct(self.out, 1, act=None, **_BN, name="expand")(h, train)
        if self.stride == 1 and in_ch == self.out:
            return nn.relu(x + h)
        skip = x
        if self.stride == 2:
            skip = nn.avg_pool(x, (2, 2), strides=(2, 2))
        skip = ConvBNAct(self.out, 1, act=None, **_BN,
                         name="skip")(skip, train)
        return nn.relu(skip + h)


@BACKBONES.register(name="RegSegBackbone", aliases=("RegSeg_bb",))
class RegSegBackbone(nn.Module):
    """exp48_decoder26 layout (reference: regseg_backbone.py)."""

    subtype: str = "exp48"
    out_stages: Sequence[int] = (2, 3, 4)
    classifier: bool = False
    num_classes: int = 1000
    pretrained: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNAct(32, 3, 2, act="relu", **_BN, name="stem")(x, train)
        x = _DBlock(48, stride=2, name="s1")(x, train)             # /4
        feats = []
        x = _DBlock(128, stride=2, name="s2_0")(x, train)          # /8
        for i in range(2):
            x = _DBlock(128, name=f"s2_{i+1}")(x, train)
        feats.append(x)
        x = _DBlock(256, stride=2, name="s3_0")(x, train)          # /16
        dil = [(1, 1), (1, 2), (1, 4), (1, 14)]
        for i, d in enumerate(dil):
            x = _DBlock(256, dilations=d, name=f"s3_{i+1}")(x, train)
        feats.append(x)
        x = _DBlock(320, dilations=(1, 14), stride=2, name="s4_0")(x, train)
        feats.append(x)                                            # /32
        if self.classifier:
            return nn.Dense(self.num_classes, name="fc")(
                jnp.mean(x, axis=(1, 2)))
        return tuple(feats[i - 2] for i in self.out_stages)


@HEADS.register(name="RegSegHead")
class RegSegHead(nn.Module):
    """decoder26 (reference: heads/seg/regseg_head.py)."""

    num_classes: int = 19
    channels: int = 64
    dropout: float = 0.1

    @nn.compact
    def __call__(self, feats, train: bool = False):
        c8, c16, c32 = feats
        y32 = ConvBNAct(128, 1, act="relu", **_BN, name="p32")(c32, train)
        y16 = ConvBNAct(128, 1, act="relu", **_BN, name="p16")(c16, train)
        y16 = y16 + resize_bilinear(y32, y16.shape[1:3])
        y16 = ConvBNAct(64, 3, act="relu", **_BN, name="f16")(y16, train)
        y8 = ConvBNAct(8, 1, act="relu", **_BN, name="p8")(c8, train)
        y = jnp.concatenate([y8, resize_bilinear(y16, y8.shape[1:3])], -1)
        y = ConvBNAct(self.channels, 3, act="relu", **_BN, name="fuse")(y, train)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return nn.Conv(self.num_classes, (1, 1), name="cls")(y)
