"""VOC-protocol detection evaluator
(reference: src/evaluator/eval_detection.py:73-176 — greedy TP/FP AP at a
single IoU threshold with all-point interpolation)."""
from __future__ import annotations

import numpy as np

from ..registry import EVALUATORS
from .base import BaseEvaluator
from .coco import _box_iou


@EVALUATORS.register(name="voc_detection")
class VOCEvaluator(BaseEvaluator):
    def __init__(self, dataset=None, num_classes: int | None = None,
                 eval_type: str = "mAP", iou_threshold: float = 0.5, **_):
        super().__init__(dataset)
        self.num_classes = num_classes or getattr(dataset, "num_classes", None)
        assert self.num_classes
        self.eval_type = eval_type
        self.iou_threshold = iou_threshold
        self.id2name = getattr(dataset, "id2name", {})
        self.reset()

    def reset(self):
        self._dets, self._gts = [], []

    def update(self, targets, preds):
        t_boxes = np.asarray(targets["boxes"])
        t_labels = np.asarray(targets["labels"])
        t_valid = np.asarray(targets["valid"])
        pads = np.asarray(targets.get("pads", np.zeros((len(t_boxes), 2))))
        scales = np.asarray(targets.get("scales", np.ones((len(t_boxes), 2))))
        for i in range(len(t_boxes)):
            gv = t_valid[i]
            gb = t_boxes[i][gv].copy()
            if len(gb):
                gb[:, [0, 2]] = (gb[:, [0, 2]] - pads[i, 0]) / scales[i, 0]
                gb[:, [1, 3]] = (gb[:, [1, 3]] - pads[i, 1]) / scales[i, 1]
            self._gts.append((gb, t_labels[i][gv]))
            pv = np.asarray(preds["valid"][i])
            self._dets.append((np.asarray(preds["boxes"][i])[pv],
                               np.asarray(preds["scores"][i])[pv],
                               np.asarray(preds["labels"][i])[pv]))

    def state_dict(self):
        return {"dets": self._dets, "gts": self._gts}

    def merge_state_dicts(self, states):
        self._dets = [d for s in states for d in s["dets"]]
        self._gts = [g for s in states for g in s["gts"]]

    def evaluate(self) -> dict:
        aps = {}
        for c in range(self.num_classes):
            scores, matches = [], []
            n_gt = 0
            for (db, ds, dl), (gb, gl) in zip(self._dets, self._gts):
                g = gb[gl == c]
                n_gt += len(g)
                sel = dl == c
                d, s = db[sel], ds[sel]
                order = np.argsort(-s)
                d, s = d[order], s[order]
                used = np.zeros(len(g), bool)
                for k in range(len(d)):
                    scores.append(s[k])
                    if len(g) == 0:
                        matches.append(0)
                        continue
                    ious = _box_iou(d[k:k + 1], g, np.zeros(len(g), bool))[0]
                    best = int(np.argmax(ious))
                    if ious[best] >= self.iou_threshold and not used[best]:
                        used[best] = True
                        matches.append(1)
                    else:
                        matches.append(0)
            if n_gt == 0:
                continue
            if not scores:
                aps[c] = 0.0
                continue
            order = np.argsort(-np.asarray(scores))
            m = np.asarray(matches)[order]
            tp = np.cumsum(m)
            fp = np.cumsum(1 - m)
            recall = tp / n_gt
            precision = tp / np.maximum(tp + fp, 1e-9)
            # all-point interpolation
            mrec = np.concatenate([[0], recall, [1]])
            mpre = np.concatenate([[0], precision, [0]])
            for k in range(len(mpre) - 2, -1, -1):
                mpre[k] = max(mpre[k], mpre[k + 1])
            idx = np.where(mrec[1:] != mrec[:-1])[0]
            aps[c] = float(((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]).sum())
        m_ap = float(np.mean(list(aps.values()))) if aps else 0.0
        out = {"mAP": m_ap}
        for c, v in aps.items():
            out[f"AP_{self.id2name.get(c, c)}"] = v
        out["performance"] = m_ap
        return out
