"""VGG (reference: src/models/backbones/vgg.py; native Flax/NHWC —
Simonyan & Zisserman, arXiv:1409.1556).  BN variants only (vggNN_bn)."""
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


@BACKBONES.register(name="VGG", aliases=("vgg",))
class VGG(nn.Module):
    subtype: str = "vgg16_bn"
    out_stages: Sequence[int] = (3, 4, 5)
    classifier: bool = False
    num_classes: int = 1000
    dropout: float = 0.5
    pretrained: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        base = self.subtype.replace("_bn", "")
        reps = _CFGS[base]
        use_bn = self.subtype.endswith("_bn")
        feats = []
        for si, (n, ch) in enumerate(zip(reps, _CHS), start=1):
            for bi in range(n):
                x = ConvBNAct(ch, 3, 1, norm="bn" if use_bn else None,
                              use_bias=not use_bn, act="relu",
                              bn_momentum=0.9, bn_eps=1e-5,
                              name=f"stage{si}_conv{bi}")(x, train)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            if si in self.out_stages and not self.classifier:
                feats.append(x)
        if self.classifier:
            x = jnp.mean(x, axis=(1, 2))  # adaptive avgpool(1) equivalent
            x = nn.Dense(4096, name="fc1")(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
            x = nn.Dense(4096, name="fc2")(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
            return nn.Dense(self.num_classes, name="fc3")(x)
        return tuple(feats)
