"""Evaluator contract (reference: src/evaluator/base_evaluator.py):
``update(targets, preds)`` / ``evaluate() → {metric: float,
'performance': float}`` / ``reset()``.  The 'performance' scalar drives
best-checkpointing and early stop (reference: trainer.py:344-353)."""
from __future__ import annotations


class BaseEvaluator:
    def __init__(self, dataset=None, **kwargs):
        self.dataset = dataset

    def update(self, targets, preds):
        raise NotImplementedError

    def evaluate(self) -> dict:
        raise NotImplementedError

    def reset(self):
        raise NotImplementedError
