"""COCO-protocol detection mAP evaluator
(reference: src/evaluator/eval_coco.py:25-244, which wraps the pycocotools
C extension; that dependency is absent here so the COCO evaluation
protocol is implemented natively in numpy).

Protocol: AP@[.5:.95:.05] with 101-point interpolated precision, greedy
score-ordered matching, each GT matched at most once, best-IoU-first —
the COCOeval algorithm for bbox without crowd/area handling (areas can be
added later; 'performance' = mAP like the reference's Σ-based scalar,
eval_coco.py:186-191)."""
from __future__ import annotations

import numpy as np

from ..registry import EVALUATORS
from .base import BaseEvaluator

IOU_THRS = np.round(np.arange(0.5, 1.0, 0.05), 2)
RECALL_POINTS = np.linspace(0, 1, 101)


def _ap_per_class(dets, gts, num_classes, iou_thrs=IOU_THRS, max_det=100):
    """dets: list over images of (boxes, scores, labels);
    gts: list over images of (boxes, labels).
    Returns ap (C, T) with NaN for classes absent from GT."""
    T = len(iou_thrs)
    ap = np.full((num_classes, T), np.nan)
    for c in range(num_classes):
        # gather per-image detections and gts of class c
        img_dets, img_gts = [], []
        n_gt = 0
        for (db, ds, dl), (gb, gl) in zip(dets, gts):
            sel = dl == c
            d_boxes, d_scores = db[sel], ds[sel]
            order = np.argsort(-d_scores)[:max_det]
            img_dets.append((d_boxes[order], d_scores[order]))
            g = gb[gl == c]
            img_gts.append(g)
            n_gt += len(g)
        if n_gt == 0:
            continue
        # flatten detections with image index
        all_scores = np.concatenate([d[1] for d in img_dets]) if img_dets else np.zeros(0)
        if len(all_scores) == 0:
            ap[c] = 0.0
            continue
        img_idx = np.concatenate([
            np.full(len(d[1]), i) for i, d in enumerate(img_dets)])
        order = np.argsort(-all_scores)
        img_idx = img_idx[order]
        # per-threshold matching
        tps = np.zeros((T, len(order)), bool)
        gt_matched = [np.zeros((T, len(g)), bool) for g in img_gts]
        # precompute IoU per image
        ious = []
        for (d_boxes, _), g in zip(img_dets, img_gts):
            if len(d_boxes) and len(g):
                ious.append(_iou_matrix(d_boxes, g))
            else:
                ious.append(np.zeros((len(d_boxes), len(g))))
        # walk detections in global score order
        ptr = [0] * len(img_dets)
        for k, i in enumerate(img_idx):
            di = ptr[i]
            ptr[i] += 1
            iou_row = ious[i][di] if ious[i].size else np.zeros(0)
            for t in range(T):
                if len(iou_row) == 0:
                    continue
                # best unmatched gt above threshold
                cand = np.where(~gt_matched[i][t] & (iou_row >= iou_thrs[t]))[0]
                if len(cand):
                    best = cand[np.argmax(iou_row[cand])]
                    gt_matched[i][t, best] = True
                    tps[t, k] = True
        # PR curve per threshold
        for t in range(T):
            tp_cum = np.cumsum(tps[t])
            fp_cum = np.cumsum(~tps[t])
            recall = tp_cum / n_gt
            precision = tp_cum / np.maximum(tp_cum + fp_cum, 1e-9)
            # monotone precision envelope
            for k in range(len(precision) - 2, -1, -1):
                precision[k] = max(precision[k], precision[k + 1])
            idx = np.searchsorted(recall, RECALL_POINTS, side="left")
            p = np.where(idx < len(precision), precision[np.minimum(idx, len(precision) - 1)], 0.0)
            ap[c, t] = p.mean()
    return ap


def _iou_matrix(a, b):
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = np.clip(a[:, 2] - a[:, 0], 0, None) * np.clip(a[:, 3] - a[:, 1], 0, None)
    area_b = np.clip(b[:, 2] - b[:, 0], 0, None) * np.clip(b[:, 3] - b[:, 1], 0, None)
    return inter / np.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-9)


@EVALUATORS.register(name="coco_detection", aliases=("coco",))
class CocoEvaluator(BaseEvaluator):
    def __init__(self, dataset=None, num_classes: int | None = None,
                 eval_type: str = "mAP", **_):
        super().__init__(dataset)
        self.num_classes = num_classes or getattr(dataset, "num_classes", None)
        assert self.num_classes, "num_classes required"
        self.eval_type = eval_type
        self.id2name = getattr(dataset, "id2name", {})
        self.reset()

    def reset(self):
        self._dets: list = []
        self._gts: list = []

    def update(self, targets, preds):
        """targets: padded dict {'boxes','labels','valid','pads','scales'}
        (GT in network pixels — un-letterboxed here to original space);
        preds: NMS output dict (already un-letterboxed by the model)."""
        t_boxes = np.asarray(targets["boxes"])
        t_labels = np.asarray(targets["labels"])
        t_valid = np.asarray(targets["valid"])
        pads = np.asarray(targets.get("pads", np.zeros((len(t_boxes), 2))))
        scales = np.asarray(targets.get("scales", np.ones((len(t_boxes), 2))))
        p_boxes = np.asarray(preds["boxes"])
        p_scores = np.asarray(preds["scores"])
        p_labels = np.asarray(preds["labels"])
        p_valid = np.asarray(preds["valid"])
        for i in range(len(t_boxes)):
            gv = t_valid[i]
            gb = t_boxes[i][gv].copy()
            if len(gb):
                gb[:, [0, 2]] = (gb[:, [0, 2]] - pads[i, 0]) / scales[i, 0]
                gb[:, [1, 3]] = (gb[:, [1, 3]] - pads[i, 1]) / scales[i, 1]
            self._gts.append((gb, t_labels[i][gv]))
            pv = p_valid[i]
            self._dets.append((p_boxes[i][pv], p_scores[i][pv],
                               p_labels[i][pv]))

    def evaluate(self) -> dict:
        ap = _ap_per_class(self._dets, self._gts, self.num_classes)
        m_ap = float(np.nanmean(ap)) if np.any(~np.isnan(ap)) else 0.0
        ap50 = float(np.nanmean(ap[:, 0])) if np.any(~np.isnan(ap[:, 0])) else 0.0
        i75 = int(np.argmin(np.abs(IOU_THRS - 0.75)))
        ap75 = float(np.nanmean(ap[:, i75])) if np.any(~np.isnan(ap[:, i75])) else 0.0
        out = {"mAP": m_ap, "AP50": ap50, "AP75": ap75}
        per_cls = np.nanmean(ap, axis=1)
        for c in range(self.num_classes):
            if not np.isnan(per_cls[c]):
                out[f"AP_{self.id2name.get(c, c)}"] = float(per_cls[c])
        out["performance"] = out.get(self.eval_type, m_ap)
        return out
