"""TinyNet — a 3-stage conv backbone for smoke tests and CI.

No reference counterpart (the reference has no test suite, SURVEY §4);
small enough to converge on synthetic data in tens of steps on CPU."""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...registry import BACKBONES
from ..bricks import ConvBNAct


@BACKBONES.register(name="TinyNet")
class TinyNet(nn.Module):
    subtype: str = "tiny"
    widths: Sequence[int] = (16, 32, 64)
    out_stages: Sequence[int] = (1, 2, 3)
    classifier: bool = False
    num_classes: int = 1000
    pretrained: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = []
        for i, ch in enumerate(self.widths, start=1):
            x = ConvBNAct(ch, 3, 2, act="relu", bn_momentum=0.8,
                          bn_eps=1e-5, name=f"stage{i}")(x, train)
            if i in self.out_stages and not self.classifier:
                feats.append(x)
        if self.classifier:
            x = jnp.mean(x, axis=(1, 2))
            return nn.Dense(self.num_classes, name="fc")(x)
        return tuple(feats)
