"""COCO-protocol detection/instance-seg evaluator — native numpy
implementation of the full COCOeval algorithm
(reference: src/evaluator/eval_coco.py:25-244, which wraps the pycocotools
C extension; that dependency is absent here so the protocol is
re-implemented faithfully).

Protocol (matching pycocotools cocoeval.py semantics):
* IoU thresholds 0.50:0.05:0.95, 101 recall points;
* area ranges all/small/medium/large on GT (and unmatched-det) areas;
* maxDets sweep [1, 10, 100];
* crowd handling — iscrowd GT are ignore-matched with IoU =
  intersection/det_area and may match many detections;
* greedy best-IoU matching in global score order, non-ignored GT
  preferred;
* 12-metric summary named like the reference
  (eval_coco.py:40-41: mAP, AP_50, AP_75, AP_small/medium/large,
  Recall_1/10/100, Recall_small/medium/large), keys prefixed with the
  iou_type, and ``performance`` = Σ of mAP over iou types
  (eval_coco.py:186-191).
"""
from __future__ import annotations

import numpy as np

from ..registry import EVALUATORS
from .base import BaseEvaluator

IOU_THRS = np.round(np.arange(0.5, 1.0, 0.05), 2)          # T = 10
RECALL_POINTS = np.round(np.linspace(0.0, 1.00, 101), 2)    # R = 101
MAX_DETS = (1, 10, 100)                                     # M = 3
AREA_RNG = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0 ** 2),
    "medium": (32.0 ** 2, 96.0 ** 2),
    "large": (96.0 ** 2, 1e10),
}
AREA_KEYS = ("all", "small", "medium", "large")

METRIC_NAMES = (
    "mAP", "AP_50", "AP_75", "AP_small", "AP_medium", "AP_large",
    "Recall_1", "Recall_10", "Recall_100",
    "Recall_small", "Recall_medium", "Recall_large",
)


def _box_iou(dt, gt, crowd):
    """IoU matrix (D, G); crowd GT use intersection/det_area
    (pycocotools iou semantics with the iscrowd flag)."""
    lt = np.maximum(dt[:, None, :2], gt[None, :, :2])
    rb = np.minimum(dt[:, None, 2:], gt[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_d = np.clip(dt[:, 2] - dt[:, 0], 0, None) * \
        np.clip(dt[:, 3] - dt[:, 1], 0, None)
    area_g = np.clip(gt[:, 2] - gt[:, 0], 0, None) * \
        np.clip(gt[:, 3] - gt[:, 1], 0, None)
    union = area_d[:, None] + area_g[None, :] - inter
    denom = np.where(crowd[None, :], area_d[:, None], union)
    return inter / np.maximum(denom, 1e-9)


def _mask_iou(dt_masks, gt_masks, crowd):
    """Binary-mask IoU (D, G); crowd → intersection/det_area."""
    D, G = len(dt_masks), len(gt_masks)
    out = np.zeros((D, G))
    if D == 0 or G == 0:
        return out
    d_flat = dt_masks.reshape(D, -1).astype(bool)
    g_flat = gt_masks.reshape(G, -1).astype(bool)
    inter = (d_flat[:, None, :] & g_flat[None, :, :]).sum(-1).astype(float)
    area_d = d_flat.sum(-1).astype(float)
    area_g = g_flat.sum(-1).astype(float)
    union = area_d[:, None] + area_g[None, :] - inter
    denom = np.where(crowd[None, :], area_d[:, None], union)
    return inter / np.maximum(denom, 1e-9)


def _evaluate_img(ious, gt_ignore_base, gt_crowd, gt_areas, dt_areas,
                  area_rng):
    """The COCOeval evaluateImg matching for one (img, cat, areaRng).

    ious (D, G) precomputed with dets in score order; returns
    (dt_matched (T,D) bool, dt_ignore (T,D) bool, npig).
    """
    T = len(IOU_THRS)
    D, G = ious.shape
    gt_ig = gt_ignore_base | (gt_areas < area_rng[0]) | (gt_areas > area_rng[1])
    # non-ignored gts first (stable)
    gt_order = np.argsort(gt_ig, kind="stable")
    npig = int((~gt_ig).sum())
    dtm = np.zeros((T, D), bool)
    dtig = np.zeros((T, D), bool)
    gtm = np.zeros((T, G), bool)
    for t, thr in enumerate(IOU_THRS):
        thr = min(thr, 1 - 1e-10)
        for d in range(D):
            best_iou = thr
            m = -1
            for g in gt_order:
                if gtm[t, g] and not gt_crowd[g]:
                    continue
                if m > -1 and not gt_ig[m] and gt_ig[g]:
                    break  # remaining gts are all ignored; keep current
                if ious[d, g] < best_iou:
                    continue
                best_iou = ious[d, g]
                m = g
            if m == -1:
                continue
            dtm[t, d] = True
            dtig[t, d] = gt_ig[m]
            gtm[t, m] = True
    out_of_rng = (dt_areas < area_rng[0]) | (dt_areas > area_rng[1])
    dtig |= (~dtm) & out_of_rng[None, :]
    return dtm, dtig, npig


class COCOEvalNative:
    """Accumulates per-image records and produces the 12 COCO stats."""

    def __init__(self, num_classes: int, iou_type: str = "bbox"):
        assert iou_type in ("bbox", "segm")
        self.num_classes = num_classes
        self.iou_type = iou_type
        self.reset()

    def reset(self):
        # records[c][area] = list over images of
        #   (scores (D,), dtm (T,D), dtig (T,D), npig)
        self.records = [
            {a: [] for a in AREA_KEYS} for _ in range(self.num_classes)]
        self.any_gt = np.zeros(self.num_classes, bool)

    def add_image(self, gt_boxes, gt_labels, det_boxes, det_scores,
                  det_labels, gt_crowd=None, gt_masks=None, det_masks=None):
        """All arrays unpadded, boxes xyxy original-image pixels."""
        gt_boxes = np.asarray(gt_boxes, np.float64).reshape(-1, 4)
        gt_labels = np.asarray(gt_labels).reshape(-1)
        det_boxes = np.asarray(det_boxes, np.float64).reshape(-1, 4)
        det_scores = np.asarray(det_scores).reshape(-1)
        det_labels = np.asarray(det_labels).reshape(-1)
        if gt_crowd is None:
            gt_crowd = np.zeros(len(gt_boxes), bool)
        gt_crowd = np.asarray(gt_crowd, bool).reshape(-1)
        for c in range(self.num_classes):
            g_sel = gt_labels == c
            d_sel = det_labels == c
            if g_sel.any():
                self.any_gt[c] = True
            if not (g_sel.any() or d_sel.any()):
                continue
            gb, crowd = gt_boxes[g_sel], gt_crowd[g_sel]
            db, ds = det_boxes[d_sel], det_scores[d_sel]
            order = np.argsort(-ds, kind="stable")[:MAX_DETS[-1]]
            db, ds = db[order], ds[order]
            if self.iou_type == "segm":
                gm = np.asarray(gt_masks)[g_sel]
                dm = np.asarray(det_masks)[d_sel][order]
                ious = _mask_iou(dm, gm, crowd)
                gt_areas = gm.reshape(len(gm), -1).astype(bool).sum(-1).astype(float)
                dt_areas = dm.reshape(len(dm), -1).astype(bool).sum(-1).astype(float)
            else:
                ious = _box_iou(db, gb, crowd)
                gt_areas = (np.clip(gb[:, 2] - gb[:, 0], 0, None)
                            * np.clip(gb[:, 3] - gb[:, 1], 0, None))
                dt_areas = (np.clip(db[:, 2] - db[:, 0], 0, None)
                            * np.clip(db[:, 3] - db[:, 1], 0, None))
            for a in AREA_KEYS:
                dtm, dtig, npig = _evaluate_img(
                    ious, gt_crowd[g_sel].copy(), crowd, gt_areas, dt_areas,
                    AREA_RNG[a])
                self.records[c][a].append((ds, dtm, dtig, npig))

    # -- accumulate ---------------------------------------------------------
    def _pr_curves(self, c, area, max_det):
        """Returns (ap (T,) or None, recall (T,) or None) for one cell."""
        recs = self.records[c][area]
        npig = sum(r[3] for r in recs)
        if npig == 0:
            return None, None
        T = len(IOU_THRS)
        scores = np.concatenate([r[0][:max_det] for r in recs]) \
            if recs else np.zeros(0)
        if scores.size == 0:
            return np.zeros(T), np.zeros(T)
        dtm = np.concatenate([r[1][:, :max_det] for r in recs], axis=1)
        dtig = np.concatenate([r[2][:, :max_det] for r in recs], axis=1)
        order = np.argsort(-scores, kind="mergesort")
        dtm, dtig = dtm[:, order], dtig[:, order]
        tps = dtm & ~dtig
        fps = (~dtm) & ~dtig
        tp_cum = np.cumsum(tps, axis=1).astype(np.float64)
        fp_cum = np.cumsum(fps, axis=1).astype(np.float64)
        ap = np.zeros(T)
        rec_out = np.zeros(T)
        for t in range(T):
            tp, fp = tp_cum[t], fp_cum[t]
            rc = tp / npig
            pr = tp / np.maximum(tp + fp, np.spacing(1))
            rec_out[t] = rc[-1] if len(rc) else 0.0
            # monotone precision envelope
            for k in range(len(pr) - 1, 0, -1):
                if pr[k] > pr[k - 1]:
                    pr[k - 1] = pr[k]
            inds = np.searchsorted(rc, RECALL_POINTS, side="left")
            q = np.zeros(len(RECALL_POINTS))
            valid = inds < len(pr)
            q[valid] = pr[inds[valid]]
            ap[t] = q.mean()
        return ap, rec_out

    def summarize(self) -> dict:
        C = self.num_classes
        T = len(IOU_THRS)
        # precision[c] per (area, maxdet) — only 'all'×{1,10,100} and
        # small/medium/large×100 are needed for the 12 stats
        cells_ap = {}   # (area) -> (C, T) with nan
        cells_ar = {}   # (area, maxdet) -> (C, T)
        for area in AREA_KEYS:
            ap_mat = np.full((C, T), np.nan)
            for c in range(C):
                ap, _ = self._pr_curves(c, area, MAX_DETS[-1])
                if ap is not None:
                    ap_mat[c] = ap
            cells_ap[area] = ap_mat
        for area in AREA_KEYS:
            for md in MAX_DETS:
                if area != "all" and md != MAX_DETS[-1]:
                    continue
                ar_mat = np.full((C, T), np.nan)
                for c in range(C):
                    _, rec = self._pr_curves(c, area, md)
                    if rec is not None:
                        ar_mat[c] = rec
                cells_ar[(area, md)] = ar_mat

        def mean(x):
            return float(np.nanmean(x)) if np.any(~np.isnan(x)) else -1.0

        i50 = 0
        i75 = int(np.argmin(np.abs(IOU_THRS - 0.75)))
        stats = {
            "mAP": mean(cells_ap["all"]),
            "AP_50": mean(cells_ap["all"][:, i50]),
            "AP_75": mean(cells_ap["all"][:, i75]),
            "AP_small": mean(cells_ap["small"]),
            "AP_medium": mean(cells_ap["medium"]),
            "AP_large": mean(cells_ap["large"]),
            "Recall_1": mean(cells_ar[("all", 1)]),
            "Recall_10": mean(cells_ar[("all", 10)]),
            "Recall_100": mean(cells_ar[("all", 100)]),
            "Recall_small": mean(cells_ar[("small", 100)]),
            "Recall_medium": mean(cells_ar[("medium", 100)]),
            "Recall_large": mean(cells_ar[("large", 100)]),
        }
        allc = cells_ap["all"]
        self._per_class_ap = np.where(
            np.isnan(allc).all(axis=1), np.nan,
            np.nanmean(np.where(np.isnan(allc), 0.0, allc), axis=1)
            * allc.shape[1]
            / np.maximum((~np.isnan(allc)).sum(axis=1), 1))
        return stats


@EVALUATORS.register(name="coco_detection", aliases=("coco",))
class CocoEvaluator(BaseEvaluator):
    """Trainer-facing evaluator over padded device buffers.

    iou_types: ('bbox',) for detection, ('bbox','segm') for instance seg
    (reference CocoEvaluator iou_types, eval_coco.py:27).
    """

    def __init__(self, dataset=None, num_classes: int | None = None,
                 eval_type: str = "mAP", iou_types=("bbox",), **_):
        super().__init__(dataset)
        self.num_classes = num_classes or getattr(dataset, "num_classes", None)
        assert self.num_classes, "num_classes required"
        self.eval_type = eval_type
        self.iou_types = tuple(iou_types)
        self.id2name = getattr(dataset, "id2name", {})
        self.reset()

    def reset(self):
        self._evals = {
            t: COCOEvalNative(self.num_classes, t) for t in self.iou_types}

    def update(self, targets, preds):
        """targets: padded dict {'boxes','labels','valid','pads','scales'
        [,'crowd'][,'masks']} (GT in network pixels — un-letterboxed here);
        preds: NMS output dict (already un-letterboxed by the model,
        optionally with 'masks' (B,K,H,W) pasted instance masks)."""
        t_boxes = np.asarray(targets["boxes"])
        t_labels = np.asarray(targets["labels"])
        t_valid = np.asarray(targets["valid"])
        B = len(t_boxes)
        pads = np.asarray(targets.get("pads", np.zeros((B, 2))))
        scales = np.asarray(targets.get("scales", np.ones((B, 2))))
        t_crowd = np.asarray(targets["crowd"]) if "crowd" in targets else \
            np.zeros(t_labels.shape, bool)
        p_boxes = np.asarray(preds["boxes"])
        p_scores = np.asarray(preds["scores"])
        p_labels = np.asarray(preds["labels"])
        p_valid = np.asarray(preds["valid"])
        for i in range(B):
            gv = t_valid[i]
            gb = t_boxes[i][gv].copy()
            if len(gb):
                gb[:, [0, 2]] = (gb[:, [0, 2]] - pads[i, 0]) / scales[i, 0]
                gb[:, [1, 3]] = (gb[:, [1, 3]] - pads[i, 1]) / scales[i, 1]
            pv = p_valid[i]
            kw = {}
            for t, ev in self._evals.items():
                if t == "segm":
                    kw = dict(
                        gt_masks=np.asarray(targets["masks"])[i][gv],
                        det_masks=np.asarray(preds["masks"])[i][pv])
                ev.add_image(
                    gb, t_labels[i][gv], p_boxes[i][pv], p_scores[i][pv],
                    p_labels[i][pv], gt_crowd=t_crowd[i][gv], **kw)

    def evaluate(self) -> dict:
        out = {"performance": 0.0}
        for t, ev in self._evals.items():
            stats = ev.summarize()
            for k, v in stats.items():
                out[f"{t}_{k}"] = v
                if k == "mAP":
                    out["performance"] += max(v, 0.0)
            if t == "bbox":
                # legacy aliases used by earlier tests/logs
                out["mAP"] = stats["mAP"]
                out["AP50"] = stats["AP_50"]
                out["AP75"] = stats["AP_75"]
                per_cls = ev._per_class_ap
                for c in range(self.num_classes):
                    if not np.isnan(per_cls[c]):
                        out[f"AP_{self.id2name.get(c, c)}"] = float(per_cls[c])
        if self.eval_type in out:
            out["performance"] = out[self.eval_type]
        return out
