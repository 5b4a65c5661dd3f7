"""ConvNeXt T/S/B/L (reference: src/models/backbones/convnext.py wrapping
torchvision; native Flax/NHWC — Liu et al., arXiv:2201.03545).

Stage semantics follow the reference wrapper (convnext.py:51-56): stem =
features[0], stage1 = the first block stack, stage2..4 = downsample+blocks,
so out_stages index into out_channels [C,C,2C,4C,8C].  Upstream quirk NOT
replicated: the wrapper's convnext_large out_channels metadata claims
[256,...,2048] (convnext.py:43) but torchvision convnext_large is
(192,384,768,1536) — the metadata is wrong upstream, actual tensors (and
ours) are torchvision's."""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...registry import BACKBONES
from ..bricks import DropPath

_SPECS = {
    "convnext_tiny": ((3, 3, 9, 3), (96, 192, 384, 768)),
    "convnext_small": ((3, 3, 27, 3), (96, 192, 384, 768)),
    "convnext_base": ((3, 3, 27, 3), (128, 256, 512, 1024)),
    "convnext_large": ((3, 3, 27, 3), (192, 384, 768, 1536)),
}


class ConvNeXtBlock(nn.Module):
    dim: int
    drop_rate: float = 0.0
    layer_scale: float = 1e-6

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(self.dim, (7, 7), padding=3, feature_group_count=self.dim,
                    name="dwconv")(x)
        h = nn.LayerNorm(name="norm")(h)
        h = nn.Dense(4 * self.dim, name="pw1")(h)
        h = nn.gelu(h, approximate=False)  # torch GELU is exact erf
        h = nn.Dense(self.dim, name="pw2")(h)
        gamma = self.param("gamma", nn.initializers.constant(self.layer_scale),
                           (self.dim,))
        h = h * gamma
        return x + DropPath(self.drop_rate, name="drop")(h, train)


@BACKBONES.register(name="ConvNeXt", aliases=("convnext",))
class ConvNeXt(nn.Module):
    subtype: str = "convnext_tiny"
    out_stages: Sequence[int] = (2, 3, 4)
    classifier: bool = False
    num_classes: int = 1000
    drop_path_rate: float = 0.1
    pretrained: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        depths, dims = _SPECS[self.subtype]
        total = sum(depths)
        bi = 0
        feats = []
        for si, (d, dim) in enumerate(zip(depths, dims), start=1):
            if si == 1:
                x = nn.Conv(dim, (4, 4), strides=4, name="stem_conv")(x)
                x = nn.LayerNorm(name="stem_norm")(x)
            else:
                x = nn.LayerNorm(name=f"down{si}_norm")(x)
                x = nn.Conv(dim, (2, 2), strides=2, name=f"down{si}_conv")(x)
            for j in range(d):
                x = ConvNeXtBlock(
                    dim, drop_rate=self.drop_path_rate * bi / max(total - 1, 1),
                    name=f"stage{si}_block{j}")(x, train)
                bi += 1
            if si in self.out_stages and not self.classifier:
                feats.append(x)
        if self.classifier:
            x = jnp.mean(x, axis=(1, 2))
            x = nn.LayerNorm(name="head_norm")(x)
            return nn.Dense(self.num_classes, name="fc")(x)
        return tuple(feats)
