"""VGG (reference: src/models/backbones/vgg.py:31-204; native Flax/NHWC —
Simonyan & Zisserman, arXiv:1409.1556).

Reference stage semantics (vgg.py:180-196): ``conv1`` is the first conv
group INCLUDING its maxpool; ``layer1..layer4`` are the remaining groups
captured BEFORE their trailing pool, so ``out_stages`` index into
out_channels [64,128,256,512,512] and e.g. ``[2,3,4]`` yields
(256@s4, 512@s8, 512@s16) maps.  torchvision convs keep their bias in the
_bn variants too, so bias is always on.  Known upstream quirk NOT
replicated: the reference's vgg13_bn child slicing (vgg.py:118-124) puts
features[20] (a maxpool) into both ``layer2_pool`` and ``layer3``, pooling
twice — our vgg13_bn pools once, like every other subtype.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...registry import BACKBONES
from ..bricks import ConvBNAct

_CFGS = {
    "vgg11": (1, 1, 2, 2, 2),
    "vgg13": (2, 2, 2, 2, 2),
    "vgg16": (2, 2, 3, 3, 3),
    "vgg19": (2, 2, 4, 4, 4),
}
_CHS = (64, 128, 256, 512, 512)


def _adaptive_avg_pool(x, th, tw):
    B, H, W, C = x.shape
    assert H % th == 0 and W % tw == 0, (H, W, th, tw)
    return x.reshape(B, th, H // th, tw, W // tw, C).mean(axis=(2, 4))


@BACKBONES.register(name="VGG", aliases=("vgg",))
class VGG(nn.Module):
    subtype: str = "vgg16_bn"
    out_stages: Sequence[int] = (2, 3, 4)
    classifier: bool = False
    num_classes: int = 1000
    dropout: float = 0.5
    pretrained: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        base = self.subtype.replace("_bn", "")
        reps = _CFGS[base]
        use_bn = self.subtype.endswith("_bn")
        # group 0 == reference conv1 (convs + first pool, vgg.py:74-76)
        for bi in range(reps[0]):
            x = ConvBNAct(_CHS[0], 3, 1, norm="bn" if use_bn else None,
                          use_bias=True, act="relu",
                          bn_momentum=0.9, bn_eps=1e-5,
                          name=f"stage0_conv{bi}")(x, train)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        feats = []
        for si in range(1, 5):
            for bi in range(reps[si]):
                x = ConvBNAct(_CHS[si], 3, 1, norm="bn" if use_bn else None,
                              use_bias=True, act="relu",
                              bn_momentum=0.9, bn_eps=1e-5,
                              name=f"stage{si}_conv{bi}")(x, train)
            if si in self.out_stages and not self.classifier:
                feats.append(x)  # pre-pool capture (reference vgg.py:185-188)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        if self.classifier:
            x = _adaptive_avg_pool(x, 7, 7)  # reference avgpool (vgg.py:164)
            x = x.reshape(x.shape[0], -1)
            x = nn.Dense(4096, name="fc1")(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
            x = nn.Dense(4096, name="fc2")(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
            return nn.Dense(self.num_classes, name="fc3")(x)
        return tuple(feats)
