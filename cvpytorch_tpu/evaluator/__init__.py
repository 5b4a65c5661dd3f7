"""Evaluator factory (reference: src/evaluator/__init__.py:19-38 — selects
by cfg.EVALUATOR.NAME)."""
from __future__ import annotations

from ..registry import EVALUATORS
from . import classification  # noqa: F401  (registers)


def build_evaluator(cfg, dataset=None):
    ev_cfg = cfg.EVALUATOR or {}
    name = ev_cfg.get("NAME", "classification")
    eval_type = ev_cfg.get("EVAL_TYPE") or None
    kwargs = {}
    if eval_type:
        kwargs["eval_type"] = eval_type
    iou_types = ev_cfg.get("IOU_TYPES")
    if iou_types:   # e.g. ['bbox', 'segm'] for Mask R-CNN (eval_coco.py)
        kwargs["iou_types"] = tuple(iou_types)
    if name == "segmentation":
        from . import segmentation  # noqa: F401
    if name in ("coco_detection", "coco"):
        from . import coco  # noqa: F401
    if name == "coco_keypoints":
        # reference evaluator/__init__.py:30-31: bbox + OKS keypoints
        from . import coco  # noqa: F401
        name = "coco_detection"
        kwargs.setdefault("iou_types", ("bbox", "keypoints"))
    if name == "voc_detection":
        from . import voc  # noqa: F401
    if name == "keypoint":
        from . import keypoint  # noqa: F401
    return EVALUATORS.get(name)(dataset=dataset, **kwargs)
