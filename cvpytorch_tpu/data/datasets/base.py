"""Dataset base (replaces torch.utils.data.Dataset usage in the reference).

Constructor signature mirrors the reference datasets
(``(data_cfg, dictionary, transform, target_transform, stage)``,
reference: src/data/datasets/coco.py:35 etc.); samples are dicts
``{'image': ndarray, 'target': ...}``."""
from __future__ import annotations

from typing import Any, Optional


class Dataset:
    def __init__(self, data_cfg=None, dictionary=None, transform=None,
                 target_transform=None, stage: str = "train"):
        self.data_cfg = data_cfg
        self.dictionary = dictionary or []
        self.transform = transform
        self.target_transform = target_transform
        self.stage = stage
        if self.dictionary:
            self.num_classes = len(self.dictionary)
            self.category = [k for d in self.dictionary for k in
                             (d.keys() if hasattr(d, "keys") else [str(d)])]
            self.name2id = {n: i for i, n in enumerate(self.category)}
            self.id2name = {i: n for n, i in self.name2id.items()}

    def __len__(self) -> int:
        raise NotImplementedError

    def __getitem__(self, idx: int) -> dict:
        raise NotImplementedError

    # Optional: static collate_fn, like the reference's CocoDetection
    # (coco.py:131-141).  Default batching stacks numpy arrays.
