"""Classification evaluator (reference: src/evaluator/eval_classification.py:12).

Per-class accuracy + mean accuracy; 'performance' = the EVAL_TYPE metric
(mAcc by default)."""
from __future__ import annotations

import numpy as np

from ..registry import EVALUATORS
from .base import BaseEvaluator


@EVALUATORS.register(name="classification")
class ClassificationEvaluator(BaseEvaluator):
    def __init__(self, dataset=None, num_classes: int | None = None,
                 eval_type: str = "mAcc", **_):
        super().__init__(dataset)
        self.num_classes = num_classes or getattr(dataset, "num_classes", None)
        assert self.num_classes, "num_classes required"
        self.eval_type = eval_type
        self.id2name = getattr(dataset, "id2name", {})
        self.reset()

    def reset(self):
        self.correct = np.zeros(self.num_classes, dtype=np.int64)
        self.total = np.zeros(self.num_classes, dtype=np.int64)

    def update(self, targets, preds):
        t = np.asarray(targets).reshape(-1)
        p = np.asarray(preds).reshape(-1)
        for c in range(self.num_classes):
            sel = t == c
            self.total[c] += int(sel.sum())
            self.correct[c] += int((p[sel] == c).sum())

    def state_dict(self):
        return {"correct": self.correct, "total": self.total}

    def merge_state_dicts(self, states):
        self.correct = np.sum([s["correct"] for s in states], axis=0)
        self.total = np.sum([s["total"] for s in states], axis=0)

    def evaluate(self) -> dict:
        with np.errstate(divide="ignore", invalid="ignore"):
            per_class = np.where(self.total > 0, self.correct / np.maximum(self.total, 1), np.nan)
        acc = self.correct.sum() / max(self.total.sum(), 1)
        m_acc = float(np.nanmean(per_class)) if np.any(self.total > 0) else 0.0
        out = {"Acc": float(acc), "mAcc": m_acc}
        for c in range(self.num_classes):
            name = self.id2name.get(c, str(c))
            out[f"Acc_{name}"] = float(per_class[c]) if self.total[c] else float("nan")
        out["performance"] = out.get(self.eval_type, m_acc)
        return out
