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
import numpy as np
from flax import linen as nn

from ...registry import BACKBONES, HEADS
from ..bricks import BatchNorm, ConvBNAct, get_activation
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


class Conv2dBN(nn.Module):
    """conv (no bias) + BN (reference topformer_backbone.py:79-97)."""

    out: int
    ks: int = 1
    stride: int = 1
    pad: int = 0
    groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.out, (self.ks, self.ks), strides=self.stride,
                    padding=self.pad, feature_group_count=self.groups,
                    use_bias=False, name="c")(x)
        return BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, name="bn")(x)


class TFInvRes(nn.Module):
    """TopFormer InvertedResidual (reference :122-164); TPM activation is
    plain ReLU (TokenPyramidModule default, :172)."""

    out: int
    ks: int = 3
    stride: int = 1
    expand: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]
        hid = int(round(inp * self.expand))
        h = x
        i = 0
        if self.expand != 1:
            h = nn.relu(Conv2dBN(hid, 1, name=f"conv{i}")(h, train))
            i += 1
        h = nn.relu(Conv2dBN(hid, self.ks, self.stride, self.ks // 2,
                             groups=hid, name=f"conv{i}")(h, train))
        h = Conv2dBN(self.out, 1, name=f"conv{i + 1}")(h, train)
        if self.stride == 1 and inp == self.out:
            return x + h
        return h


def _relu6(x):
    return jnp.minimum(jnp.maximum(x, 0.0), 6.0)


def _h_sigmoid(x):
    return _relu6(x + 3.0) / 6.0


def _adaptive_avg_pool(x, th, tw):
    B, H, W, C = x.shape
    assert H % th == 0 and W % tw == 0, (H, W, th, tw)
    return x.reshape(B, th, H // th, tw, W // tw, C).mean(axis=(2, 4))


class TFAttention(nn.Module):
    """Per-map conv attention (reference :208-244): to_q/k/v Conv2dBN 1×1
    with key_dim per head; proj = ReLU6 → Conv2dBN(bn_weight_init 0)."""

    dim: int
    key_dim: int = 16
    heads: int = 4
    attn_ratio: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        N = H * W
        nh_kd = self.key_dim * self.heads
        d = self.attn_ratio * self.key_dim
        dh = d * self.heads
        q = Conv2dBN(nh_kd, 1, name="to_q")(x, train)
        k = Conv2dBN(nh_kd, 1, name="to_k")(x, train)
        v = Conv2dBN(dh, 1, name="to_v")(x, train)
        # NCHW reshape semantics: channel = head*key_dim + ki
        qq = q.reshape(B, N, self.heads, self.key_dim).transpose(0, 2, 1, 3)
        kk = k.reshape(B, N, self.heads, self.key_dim).transpose(0, 2, 3, 1)
        vv = v.reshape(B, N, self.heads, d).transpose(0, 2, 1, 3)
        attn = jax.nn.softmax((qq * self.key_dim ** -0.5) @ kk, -1)
        xx = (attn @ vv).transpose(0, 2, 1, 3).reshape(B, H, W, dh)
        xx = _relu6(xx)
        return Conv2dBN(self.dim, 1, name="proj")(xx, train)


class TFBlock(nn.Module):
    """Attention + conv-MLP with ReLU6 (reference :246-267)."""

    dim: int
    key_dim: int
    heads: int
    mlp_ratio: int = 2
    attn_ratio: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x + TFAttention(self.dim, self.key_dim, self.heads,
                            self.attn_ratio, name="attn")(x, train)
        hid = self.dim * self.mlp_ratio
        h = Conv2dBN(hid, 1, name="fc1")(x, train)
        h = nn.Conv(hid, (3, 3), padding=1, feature_group_count=hid,
                    use_bias=True, name="dwconv")(h)
        h = _relu6(h)
        h = Conv2dBN(self.dim, 1, name="fc2")(h, train)
        return x + h


_TF_CFGS = {
    # (k, t, c, s) rows; channels; out_channels; token indices; heads
    "topformer_t": ([[3, 1, 16, 1], [3, 4, 16, 2], [3, 3, 16, 1],
                     [5, 3, 32, 2], [5, 3, 32, 1], [3, 3, 64, 2],
                     [3, 3, 64, 1], [5, 6, 96, 2], [5, 6, 96, 1]],
                    (16, 32, 64, 96), 128, (2, 4, 6, 8), 4),
    "topformer_s": ([[3, 1, 16, 1], [3, 4, 24, 2], [3, 3, 24, 1],
                     [5, 3, 48, 2], [5, 3, 48, 1], [3, 3, 96, 2],
                     [3, 3, 96, 1], [5, 6, 128, 2], [5, 6, 128, 1],
                     [3, 6, 128, 1]],
                    (24, 48, 96, 128), 192, (2, 4, 6, 9), 6),
    "topformer_b": ([[3, 1, 16, 1], [3, 4, 32, 2], [3, 3, 32, 1],
                     [5, 3, 64, 2], [5, 3, 64, 1], [3, 3, 128, 2],
                     [3, 3, 128, 1], [5, 6, 160, 2], [5, 6, 160, 1],
                     [3, 6, 160, 1]],
                    (32, 64, 128, 160), 256, (2, 4, 6, 9), 8),
}


@BACKBONES.register(name="TopFormerBackbone", aliases=("TopFormer_bb",))
class TopFormerBackbone(nn.Module):
    """Faithful TopFormer (reference topformer_backbone.py:349-436):
    MobileNetV2-style token pyramid (plain-ReLU blocks), PyramidPoolAgg
    (stride-2 adaptive pool + channel concat), 4 ReLU6 transformer blocks
    with key_dim-16 conv attention, and SemanticInjection (local·h_sigmoid
    (gate) + upsampled global) on out_stages — each output has
    out_channels (128/192/256) channels."""

    subtype: str = "topformer_t"
    out_stages: Sequence[int] = (1, 2, 3)
    classifier: bool = False
    num_classes: int = 1000
    pretrained: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfgs, channels, out_ch, token_idx, heads = _TF_CFGS[self.subtype]
        x = nn.relu(Conv2dBN(16, 3, 2, 1, name="stem")(x, train))
        tokens = []
        for i, (k, t, c, s) in enumerate(cfgs):
            x = TFInvRes(c, ks=k, stride=s, expand=t,
                         name=f"layer{i + 1}")(x, train)
            if i in token_idx:
                tokens.append(x)
        # PyramidPoolAgg stride 2 on the last level
        H, W = tokens[-1].shape[1:3]
        th, tw = (H - 1) // 2 + 1, (W - 1) // 2 + 1
        agg = jnp.concatenate(
            [_adaptive_avg_pool(f, th, tw) for f in tokens], -1)
        embed = sum(channels)
        for bi in range(4):
            agg = TFBlock(embed, 16, heads, name=f"trans{bi}")(agg, train)
        parts = jnp.split(agg, np.cumsum(channels)[:-1], axis=-1)
        outs = []
        for i in range(len(channels)):
            if i not in self.out_stages:
                continue
            loc, glo = tokens[i], parts[i]
            size = loc.shape[1:3]
            l_emb = nn.relu(Conv2dBN(out_ch, 1,
                                     name=f"sim{i}_local")(loc, train))
            g_act = nn.relu(Conv2dBN(out_ch, 1,
                                     name=f"sim{i}_act")(glo, train))
            g_emb = nn.relu(Conv2dBN(out_ch, 1,
                                     name=f"sim{i}_global")(glo, train))
            sig = resize_bilinear(_h_sigmoid(g_act), size)
            outs.append(l_emb * sig + resize_bilinear(g_emb, size))
        if self.classifier:
            return nn.Dense(self.num_classes, name="fc")(
                jnp.mean(outs[-1], axis=(1, 2)))
        return tuple(outs)


@HEADS.register(name="TopFormerHead")
class TopFormerHead(nn.Module):
    """Sum-fused head (reference heads/seg/topformer_head.py:15-33):
    equal-channel inputs summed at the first level's size, 1×1
    ConvBNReLU fuse, dropout + classifier."""

    num_classes: int = 19
    channels: int = 96
    dropout: float = 0.1

    @nn.compact
    def __call__(self, feats, train: bool = False):
        size = feats[0].shape[1:3]
        acc = feats[0]
        for f in feats[1:]:
            acc = acc + resize_bilinear(f, size)
        acc = ConvBNAct(self.channels, 1, act="relu", **_BN,
                        name="fuse")(acc, train)
        acc = nn.Dropout(self.dropout, deterministic=not train)(acc)
        return nn.Conv(self.num_classes, (1, 1), name="cls")(acc)


class _DBlock(nn.Module):
    """RegSeg D-block (reference regseg_backbone.py:74-124): 1×1 →
    split-dilated grouped 3×3 (group width 16, BN AFTER the concat) →
    SE (mid = in_channels//4, the reference's SEModule quirk) → 1×1, all
    ReLU-joined with an avg-pool/1×1 shortcut."""

    out: int
    stride: int = 1
    dilations: Sequence[int] = (1,)
    group_width: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        h = ConvBNAct(self.out, 1, act="relu", **_BN, name="conv1")(x, train)
        ns = len(self.dilations)
        temp = self.out // ns
        groups = temp // self.group_width
        branches = []
        for i, d in enumerate(self.dilations):
            branches.append(nn.Conv(
                temp, (3, 3), strides=self.stride, padding=d,
                kernel_dilation=d, feature_group_count=groups,
                use_bias=False,
                name=f"conv2_{i}")(h[..., i * temp:(i + 1) * temp]))
        h = jnp.concatenate(branches, -1)
        h = BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn2")(h)
        h = nn.relu(h)
        # SE: mid = in_channels // 4 (reference SEModule(out, in) quirk)
        mid = max(in_ch // 4, 1)
        g = jnp.mean(h, axis=(1, 2), keepdims=True)
        g = nn.relu(nn.Conv(mid, (1, 1), name="se_fc1")(g))
        g = jax.nn.sigmoid(nn.Conv(self.out, (1, 1), name="se_fc2")(g))
        h = h * g
        h = ConvBNAct(self.out, 1, act=None, **_BN, name="conv3")(h, train)
        if self.stride == 1 and in_ch == self.out:
            return nn.relu(h + x)
        skip = x
        if self.stride != 1:
            # AvgPool2d(2,2,ceil_mode=True)
            B, H, W, C = skip.shape
            ph, pw = H % 2, W % 2
            if ph or pw:
                skip = jnp.pad(skip, ((0, 0), (0, ph), (0, pw), (0, 0)))
            skip = nn.avg_pool(skip, (2, 2), strides=(2, 2))
        skip = ConvBNAct(self.out, 1, act=None, **_BN,
                         name="shortcut")(skip, train)
        return nn.relu(h + skip)


@BACKBONES.register(name="RegSegBackbone", aliases=("RegSeg_bb",))
class RegSegBackbone(nn.Module):
    """exp48_decoder26 (reference regseg_backbone.py:119-163): stem/2,
    stage1 48/4, stage2 128/8 ×3, stage3 /16 = 14 blocks with the
    dilation schedule [1], [1,2], 4×[1,4], 7×[1,14] ending at 320."""

    subtype: str = "exp48"
    out_stages: Sequence[int] = (1, 2, 3)
    classifier: bool = False
    num_classes: int = 1000
    pretrained: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        # accept the legacy (2,3,4) numbering too
        stages = tuple(s - 1 for s in self.out_stages) \
            if min(self.out_stages) >= 2 else tuple(self.out_stages)
        x = ConvBNAct(32, 3, 2, act="relu", **_BN, name="stem")(x, train)
        feats = []
        x = _DBlock(48, stride=2, name="stage1")(x, train)          # /4
        if 1 in stages:
            feats.append(x)
        x = _DBlock(128, stride=2, name="stage2_0")(x, train)       # /8
        for i in range(2):
            x = _DBlock(128, name=f"stage2_{i + 1}")(x, train)
        if 2 in stages:
            feats.append(x)
        ds = [[1], [1, 2]] + 4 * [[1, 4]] + 7 * [[1, 14]]
        x = _DBlock(256, stride=2, name="stage3_0")(x, train)       # /16
        for i, d in enumerate(ds[:-1]):
            x = _DBlock(256, dilations=tuple(d),
                        name=f"stage3_{i + 1}")(x, train)
        x = _DBlock(320, dilations=tuple(ds[-1]),
                    name=f"stage3_{len(ds)}")(x, train)
        if 3 in stages:
            feats.append(x)
        if self.classifier:
            return nn.Dense(self.num_classes, name="fc")(
                jnp.mean(x, axis=(1, 2)))
        return tuple(feats)


@HEADS.register(name="RegSegHead")
class RegSegHead(nn.Module):
    """decoder26 (reference heads/seg/regseg_head.py:15-49): inputs are
    (x4, x8, x16); 1×1 embeds (8/128/128 ch), top-down adds, 3×3 fuses,
    dropout + classifier."""

    num_classes: int = 19
    channels: int = 64
    mid_channels: Sequence[int] = (8, 128)
    dropout: float = 0.1

    @nn.compact
    def __call__(self, feats, train: bool = False):
        x4, x8, x16 = feats
        m4, m8 = self.mid_channels
        y16 = ConvBNAct(m8, 1, act="relu", **_BN, name="head16")(x16, train)
        y8 = ConvBNAct(m8, 1, act="relu", **_BN, name="head8")(x8, train)
        y4 = ConvBNAct(m4, 1, act="relu", **_BN, name="head4")(x4, train)
        y8 = y8 + resize_bilinear(y16, y8.shape[1:3])
        y8 = ConvBNAct(self.channels, 3, act="relu", **_BN,
                       name="conv8")(y8, train)
        y4 = jnp.concatenate([resize_bilinear(y8, y4.shape[1:3]), y4], -1)
        y4 = ConvBNAct(self.channels, 3, act="relu", **_BN,
                       name="conv4")(y4, train)
        y4 = nn.Dropout(self.dropout, deterministic=not train)(y4)
        return nn.Conv(self.num_classes, (1, 1), name="cls")(y4)

