"""Anchor generators package (reference: src/models/anchors/).

Most reference generators live next to their models here (YOLO grids in
the detect modules, RetinaNet/EfficientDet anchors in-model, autoanchor
k-means in utils/model_utils.py); this package holds the standalone ones.
The reference's PAA and GridAssigner are empty stubs (paa.py:16-21,
grid_assigner.py:11-17 — `forward: pass`), so only PriorBox carries
behavior worth porting.
"""
from .prior_box import PriorBox, ssd_prior_boxes  # noqa: F401
