"""Smaller classification backbones: SqueezeNet, DenseNet, RegNet-lite, ViT
(reference: src/models/backbones/{squeezenet,densenet,regnet,
vision_transformer}.py wrapping torchvision; native Flax/NHWC)."""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...registry import BACKBONES
from ..bricks import BatchNorm, ConvBNAct


class Fire(nn.Module):
    squeeze: int
    expand: int

    @nn.compact
    def __call__(self, x):
        s = nn.relu(nn.Conv(self.squeeze, (1, 1), name="squeeze")(x))
        e1 = nn.relu(nn.Conv(self.expand, (1, 1), name="e1")(s))
        e3 = nn.relu(nn.Conv(self.expand, (3, 3), padding=1, name="e3")(s))
        return jnp.concatenate([e1, e3], -1)


@BACKBONES.register(name="SqueezeNet", aliases=("squeezenet",))
class SqueezeNet(nn.Module):
    """SqueezeNet 1.1 (reference: src/models/backbones/squeezenet.py:38-43
    slicing torchvision features) — stem is conv(64,3×3,s2,VALID)+ReLU
    only; each layer starts with its ceil-mode 3×3/2 maxpool (emulated by
    a right/bottom pad column, exact for every N) and ends after its Fire
    stack, so out_stages index into out_channels [64,128,256,512].

    Upstream quirks NOT replicated (documented parity): the reference's
    ``out_channels = [96,128,256,512]`` metadata is squeezenet1_0's plan
    (actual 1_1 stem is 64), and classifier mode applies ``self.fc``
    (512-in conv) after layer1's 128-channel output inside the stage loop
    (squeezenet.py:70-73) — a shape crash; our classifier is the intent
    (fc after layer3, as torchvision)."""

    subtype: str = "squeezenet1_1"
    out_stages: Sequence[int] = (1, 2, 3)
    classifier: bool = False
    num_classes: int = 1000
    pretrained: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        pool = lambda t: nn.max_pool(
            t, (3, 3), strides=(2, 2), padding=((0, 1), (0, 1)))
        x = nn.relu(nn.Conv(64, (3, 3), strides=2, padding="VALID",
                            name="stem")(x))
        plan = ((16, 64, 2), (32, 128, 2), (48, 192, 2))
        feats = []
        for si, (sq, ex, n) in enumerate(plan, start=1):
            x = pool(x)
            for j in range(n):
                x = Fire(sq, ex, name=f"layer{si}_fire{j}")(x)
            if si == 3:
                for j in range(2):
                    x = Fire(64, 256, name=f"layer3_fire{j + 2}")(x)
            if si in self.out_stages and not self.classifier:
                feats.append(x)
        if self.classifier:
            x = nn.Dropout(0.5, deterministic=not train)(x)
            x = nn.relu(nn.Conv(self.num_classes, (1, 1), name="cls_conv")(x))
            return jnp.mean(x, axis=(1, 2))
        return tuple(feats)


class DenseLayer(nn.Module):
    growth: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn1")(x)
        h = nn.relu(h)
        h = nn.Conv(4 * self.growth, (1, 1), use_bias=False, name="conv1")(h)
        h = BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn2")(h)
        h = nn.relu(h)
        h = nn.Conv(self.growth, (3, 3), padding=1, use_bias=False,
                    name="conv2")(h)
        return jnp.concatenate([x, h], -1)


@BACKBONES.register(name="DenseNet", aliases=("densenet",))
class DenseNet(nn.Module):
    """DenseNet (reference: src/models/backbones/densenet.py:17-91 slicing
    torchvision features) — reference ``layerN = denseblockN+transitionN``
    so stage feats are POST-transition (halved channels/res); stage4 is
    denseblock4 alone, WITHOUT torchvision's final norm5+ReLU (densenet.py:60)."""

    subtype: str = "densenet121"
    out_stages: Sequence[int] = (2, 3, 4)
    classifier: bool = False
    num_classes: int = 1000
    pretrained: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfgs = {"densenet121": (32, 64, (6, 12, 24, 16)),
                "densenet161": (48, 96, (6, 12, 36, 24)),
                "densenet169": (32, 64, (6, 12, 32, 32)),
                "densenet201": (32, 64, (6, 12, 48, 32))}
        growth, stem_ch, reps = cfgs[self.subtype]
        x = ConvBNAct(stem_ch, 7, 2, padding=3, act="relu", bn_momentum=0.9,
                      bn_eps=1e-5, name="stem")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        feats = []
        for si, n in enumerate(reps, start=1):
            for j in range(n):
                x = DenseLayer(growth, name=f"dense{si}_{j}")(x, train)
            if si < len(reps):  # transition
                x = BatchNorm(use_running_average=not train, momentum=0.9,
                                 name=f"trans{si}_bn")(x)
                x = nn.relu(x)
                x = nn.Conv(x.shape[-1] // 2, (1, 1), use_bias=False,
                            name=f"trans{si}_conv")(x)
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
            if si in self.out_stages and not self.classifier:
                feats.append(x)
        if self.classifier:
            x = BatchNorm(use_running_average=not train, momentum=0.9,
                             name="final_bn")(x)
            x = nn.relu(x)
            x = jnp.mean(x, axis=(1, 2))
            return nn.Dense(self.num_classes, name="fc")(x)
        return tuple(feats)


@BACKBONES.register(name="ViT", aliases=("VisionTransformer", "vit"))
class ViT(nn.Module):
    """ViT (reference: src/models/backbones/vision_transformer.py:20-114
    wrapping torchvision vit_{b,l}_{16,32}).  The reference forward always
    applies ``self.heads`` (vision_transformer.py:112) — with
    classifier=False it crashes on the unset attribute, so classifier-only
    is the reference behavior; our feature mode (patch tokens) is the
    intent."""

    subtype: str = "vit_b_16"
    classifier: bool = True
    num_classes: int = 1000
    out_stages: Sequence[int] = ()
    dropout: float = 0.0
    pretrained: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        dims = {"vit_t_16": (192, 12, 3, 16), "vit_s_16": (384, 12, 6, 16),
                "vit_b_16": (768, 12, 12, 16), "vit_l_16": (1024, 24, 16, 16),
                "vit_b_32": (768, 12, 12, 32), "vit_l_32": (1024, 24, 16, 32)}
        dim, depth, heads, p = dims[self.subtype]
        B, H, W, C = x.shape
        x = nn.Conv(dim, (p, p), strides=p, name="patch_embed")(x)
        x = x.reshape(B, -1, dim)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, dim))
        x = jnp.concatenate([jnp.tile(cls, (B, 1, 1)), x], 1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, x.shape[1], dim))
        x = x + pos
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        for i in range(depth):
            h = nn.LayerNorm(name=f"ln1_{i}")(x)
            h = nn.MultiHeadDotProductAttention(
                num_heads=heads, name=f"attn_{i}")(h)
            x = x + h
            h = nn.LayerNorm(name=f"ln2_{i}")(x)
            h = nn.Dense(dim * 4, name=f"mlp1_{i}")(h)
            h = nn.gelu(h)
            h = nn.Dense(dim, name=f"mlp2_{i}")(h)
            x = x + h
        x = nn.LayerNorm(name="final_ln")(x)
        if self.classifier:
            return nn.Dense(self.num_classes, name="fc")(x[:, 0])
        return (x[:, 1:],)
