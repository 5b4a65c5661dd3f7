"""Pascal VOC datasets (reference: src/data/datasets/voc.py:23-191).

VOCDetection: XML annotation parsing; VOCSegmentation: png masks.
INDICES file lists image ids (one per line); layout follows VOCdevkit
(JPEGImages/, Annotations/, SegmentationClass/)."""
from __future__ import annotations

import os
import xml.etree.ElementTree as ET

import cv2
import numpy as np

from ...registry import DATASETS
from .base import Dataset


@DATASETS.register(name="VOCDetection")
class VOCDetection(Dataset):
    def __init__(self, data_cfg=None, dictionary=None, transform=None,
                 target_transform=None, stage="train"):
        super().__init__(data_cfg, dictionary, transform, target_transform, stage)
        root = data_cfg.IMG_DIR
        self.img_dir = os.path.join(root, "JPEGImages") \
            if os.path.isdir(os.path.join(root, "JPEGImages")) else root
        self.ann_dir = (data_cfg.LABELS.DET_DIR if data_cfg.LABELS else None) \
            or os.path.join(root, "Annotations")
        ids = []
        if data_cfg.INDICES:
            with open(data_cfg.INDICES) as f:
                ids = [l.strip().split()[0] for l in f if l.strip()]
        else:
            ids = [f[:-4] for f in sorted(os.listdir(self.ann_dir))
                   if f.endswith(".xml")]
        self.ids = ids
        if not ids:
            raise RuntimeError(f"no samples under {root}")

    def __len__(self):
        return len(self.ids)

    def _parse_xml(self, path):
        tree = ET.parse(path)
        boxes, labels, difficult = [], [], []
        for obj in tree.findall("object"):
            name = obj.find("name").text.strip()
            if name not in self.name2id:
                continue
            diff = int((obj.find("difficult").text or 0)
                       if obj.find("difficult") is not None else 0)
            bb = obj.find("bndbox")
            box = [float(bb.find(k).text) - (1 if k in ("xmin", "ymin") else 0)
                   for k in ("xmin", "ymin", "xmax", "ymax")]
            boxes.append(box)
            labels.append(self.name2id[name])
            difficult.append(diff)
        return (np.asarray(boxes, np.float32).reshape(-1, 4),
                np.asarray(labels, np.int32),
                np.asarray(difficult, np.int32))

    def __getitem__(self, idx):
        iid = self.ids[idx]
        img = cv2.imread(os.path.join(self.img_dir, iid + ".jpg"))
        if img is None:
            img = cv2.imread(os.path.join(self.img_dir, iid + ".png"))
        if self.stage == "infer":
            sample = {"image": img, "target": None}
        else:
            boxes, labels, difficult = self._parse_xml(
                os.path.join(self.ann_dir, iid + ".xml"))
            sample = {"image": img,
                      "target": {"boxes": boxes, "labels": labels,
                                 "difficult": difficult}}
        if self.transform:
            sample = self.transform(sample)
        return sample


@DATASETS.register(name="VOCSegmentation")
class VOCSegmentation(Dataset):
    def __init__(self, data_cfg=None, dictionary=None, transform=None,
                 target_transform=None, stage="train"):
        super().__init__(data_cfg, dictionary, transform, target_transform, stage)
        root = data_cfg.IMG_DIR
        self.img_dir = os.path.join(root, "JPEGImages") \
            if os.path.isdir(os.path.join(root, "JPEGImages")) else root
        self.seg_dir = (data_cfg.LABELS.SEG_DIR if data_cfg.LABELS else None) \
            or os.path.join(root, "SegmentationClass")
        if data_cfg.INDICES:
            with open(data_cfg.INDICES) as f:
                self.ids = [l.strip().split()[0] for l in f if l.strip()]
        else:
            self.ids = [f[:-4] for f in sorted(os.listdir(self.seg_dir))
                        if f.endswith(".png")]
        if not self.ids:
            raise RuntimeError(f"no samples under {root}")

    def __len__(self):
        return len(self.ids)

    def __getitem__(self, idx):
        iid = self.ids[idx]
        img = cv2.imread(os.path.join(self.img_dir, iid + ".jpg"))
        sample = {"image": img, "target": None}
        if self.stage != "infer":
            mask = cv2.imread(os.path.join(self.seg_dir, iid + ".png"),
                              cv2.IMREAD_GRAYSCALE)
            sample["target"] = mask
        if self.transform:
            sample = self.transform(sample)
        return sample
