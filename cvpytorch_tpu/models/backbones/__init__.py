"""Backbone factory (reference: src/models/backbones/__init__.py:60-135 —
an if-elif chain over names; here the registry resolves the same names)."""
from __future__ import annotations

from ...registry import BACKBONES

# importing registers
from . import mobilenetv2, resnet, shufflenetv2, vgg  # noqa: F401
from . import csp_darknet, tinynet  # noqa: F401
from . import efficientnet, mobilenetv3, convnext, repvgg, misc_backbones  # noqa: F401
from . import seg_transformers  # noqa: F401
from . import seg_light  # noqa: F401
from . import lfd_resnet  # noqa: F401
from . import regnet  # noqa: F401
from . import efficientnet_lite  # noqa: F401
from . import custom_cspnet  # noqa: F401


def build_backbone(cfg: dict):
    """cfg: {'name': 'ResNet', 'subtype': 'resnet50', ...} — same schema as
    the reference YAML BACKBONE blocks."""
    kwargs = dict(cfg.items() if hasattr(cfg, "items") else cfg)
    name = kwargs.pop("name")
    cls = BACKBONES.get(name)
    # drop keys the flax module doesn't declare
    import dataclasses

    if dataclasses.is_dataclass(cls):
        fields = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in kwargs.items() if k in fields}
    return cls(**kwargs)
