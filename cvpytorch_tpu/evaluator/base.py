"""Evaluator contract (reference: src/evaluator/base_evaluator.py):
``update(targets, preds)`` / ``evaluate() → {metric: float,
'performance': float}`` / ``reset()``.  The 'performance' scalar drives
best-checkpointing and early stop (reference: trainer.py:344-353).

Multi-host: each process accumulates its dataloader shard locally; before
``evaluate()`` the trainer gathers every process's ``state_dict()`` and
calls ``merge_state_dicts`` so the metrics cover the FULL val set on every
host (reference: eval_coco.py:205-224 ``synchronize_between_processes``
allgathering per-rank detection lists)."""
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

    def state_dict(self):
        """Picklable local accumulation (for the cross-process gather)."""
        raise NotImplementedError(
            f"{type(self).__name__} does not support multi-process merge")

    def merge_state_dicts(self, states):
        """Replace the local accumulation with the merge of every
        process's ``state_dict()`` (self's included in ``states``)."""
        raise NotImplementedError(
            f"{type(self).__name__} does not support multi-process merge")
