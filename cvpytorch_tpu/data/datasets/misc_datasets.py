"""Remaining reference datasets
(reference: src/data/datasets/{ade20k,camvid,portrait,visdrone,widerface,
pennfudan}.py — thin format adapters over the shared machinery)."""
from __future__ import annotations

import glob as globlib
import os

import cv2
import numpy as np

from ...registry import DATASETS
from .base import Dataset


class _PairedSegDataset(Dataset):
    """image/mask folder pairs with suffix substitution."""

    IMG_SUFFIX = ".jpg"
    MASK_SUFFIX = ".png"
    MASK_OFFSET = 0  # subtract from raw mask ids (ADE20K is 1-based)

    def __init__(self, data_cfg=None, dictionary=None, transform=None,
                 target_transform=None, stage="train"):
        super().__init__(data_cfg, dictionary, transform, target_transform, stage)
        img_dir = data_cfg.IMG_DIR
        seg_dir = (data_cfg.LABELS.SEG_DIR if data_cfg.LABELS else None) or img_dir
        suffix = data_cfg.IMG_SUFFIX or ("*" + self.IMG_SUFFIX)
        self._imgs = sorted(globlib.glob(
            os.path.join(img_dir, "**", suffix), recursive=True))
        self._masks = []
        for p in self._imgs:
            rel = os.path.relpath(p, img_dir)
            base = os.path.splitext(rel)[0]
            self._masks.append(os.path.join(seg_dir, base + self.MASK_SUFFIX))
        if not self._imgs:
            raise RuntimeError(f"no images under {img_dir}")

    def __len__(self):
        return len(self._imgs)

    def __getitem__(self, idx):
        img = cv2.imread(self._imgs[idx])
        sample = {"image": img, "target": None}
        if self.stage != "infer":
            mask = cv2.imread(self._masks[idx], cv2.IMREAD_GRAYSCALE)
            if self.MASK_OFFSET:
                mask = mask.astype(np.int32) - self.MASK_OFFSET
                mask = np.where(mask < 0, 255, mask).astype(np.uint8)
            sample["target"] = mask
        if self.transform:
            sample = self.transform(sample)
        return sample


@DATASETS.register(name="ADE20KSegmentation", aliases=("ADE20K",))
class ADE20KSegmentation(_PairedSegDataset):
    """(reference: ade20k.py:19) — 150 classes, masks 1-based with 0=ignore."""

    MASK_OFFSET = 1


@DATASETS.register(name="CamvidSegmentation", aliases=("Camvid",))
class CamvidSegmentation(_PairedSegDataset):
    """(reference: camvid.py:21)"""

    IMG_SUFFIX = ".png"


@DATASETS.register(name="PortraitSegmentation", aliases=("Portrait",))
class PortraitSegmentation(_PairedSegDataset):
    """(reference: portrait.py:15) — binary person matting masks."""


@DATASETS.register(name="VisDroneDetection")
class VisDroneDetection(Dataset):
    """(reference: visdrone.py:29) — per-image txt annotations:
    x,y,w,h,score,category,truncation,occlusion."""

    def __init__(self, data_cfg=None, dictionary=None, transform=None,
                 target_transform=None, stage="train"):
        super().__init__(data_cfg, dictionary, transform, target_transform, stage)
        img_dir = data_cfg.IMG_DIR
        ann_dir = (data_cfg.LABELS.DET_DIR if data_cfg.LABELS else None) or \
            img_dir.replace("images", "annotations")
        self._imgs = sorted(globlib.glob(os.path.join(img_dir, "*.jpg")))
        self._anns = [os.path.join(
            ann_dir, os.path.splitext(os.path.basename(p))[0] + ".txt")
            for p in self._imgs]
        if not self._imgs:
            raise RuntimeError(f"no images under {img_dir}")

    def __len__(self):
        return len(self._imgs)

    def __getitem__(self, idx):
        img = cv2.imread(self._imgs[idx])
        sample = {"image": img, "target": None}
        if self.stage != "infer":
            boxes, labels = [], []
            if os.path.exists(self._anns[idx]):
                for line in open(self._anns[idx]):
                    parts = line.strip().rstrip(",").split(",")
                    if len(parts) < 6:
                        continue
                    x, y, w, h, score, cat = (float(v) for v in parts[:6])
                    # category 0 = ignored regions, 11 = others (reference)
                    if cat < 1 or cat > len(self.dictionary) or w < 2 or h < 2:
                        continue
                    boxes.append([x, y, x + w, y + h])
                    labels.append(int(cat) - 1)
            sample["target"] = {
                "boxes": np.asarray(boxes, np.float32).reshape(-1, 4),
                "labels": np.asarray(labels, np.int32),
            }
        if self.transform:
            sample = self.transform(sample)
        return sample


@DATASETS.register(name="VisDroneTrack")
class VisDroneTrack(Dataset):
    """VisDrone-MOT sequences (reference: visdrone.py:190 — an unfinished
    stub there; functional here).  Layout::

        IMG_DIR/sequences/<seq>/0000001.jpg …
        IMG_DIR/annotations/<seq>.txt   lines:
            frame,target_id,x,y,w,h,score,category,truncation,occlusion

    Each item is one frame's detections; ``track_ids`` carries the MOT
    identity so a tracker head can consume consecutive frames."""

    def __init__(self, data_cfg=None, dictionary=None, transform=None,
                 target_transform=None, stage="train"):
        super().__init__(data_cfg, dictionary, transform, target_transform,
                         stage)
        root = data_cfg.IMG_DIR
        seq_dir = os.path.join(root, "sequences")
        ann_dir = (data_cfg.LABELS.DET_DIR if data_cfg.LABELS else None) or \
            os.path.join(root, "annotations")
        self._frames = []          # (img_path, seq, frame_no)
        self._anns = {}            # (seq, frame_no) → list[(tid, box, cat)]
        for seq in sorted(os.listdir(seq_dir)) if os.path.isdir(seq_dir) else []:
            sdir = os.path.join(seq_dir, seq)
            if not os.path.isdir(sdir):
                continue
            for p in sorted(globlib.glob(os.path.join(sdir, "*.jpg"))):
                fno = int(os.path.splitext(os.path.basename(p))[0])
                self._frames.append((p, seq, fno))
            ann = os.path.join(ann_dir, seq + ".txt")
            if os.path.exists(ann):
                for line in open(ann):
                    parts = line.strip().rstrip(",").split(",")
                    if len(parts) < 8:
                        continue
                    fno, tid = int(parts[0]), int(parts[1])
                    x, y, w, h = (float(v) for v in parts[2:6])
                    cat = int(float(parts[7]))
                    if cat < 1 or w < 2 or h < 2:
                        continue  # 0 = ignored regions
                    self._anns.setdefault((seq, fno), []).append(
                        (tid, [x, y, x + w, y + h], cat - 1))
        if not self._frames:
            raise RuntimeError(f"no sequences under {seq_dir}")

    def __len__(self):
        return len(self._frames)

    def __getitem__(self, idx):
        path, seq, fno = self._frames[idx]
        img = cv2.imread(path)
        sample = {"image": img, "target": None}
        if self.stage != "infer":
            rows = self._anns.get((seq, fno), [])
            nc = max(len(self.dictionary or ()), 1)
            rows = [r for r in rows if r[2] < nc]
            sample["target"] = {
                "boxes": np.asarray([r[1] for r in rows],
                                    np.float32).reshape(-1, 4),
                "labels": np.asarray([r[2] for r in rows], np.int32),
                "track_ids": np.asarray([r[0] for r in rows], np.int32),
            }
        if self.transform:
            sample = self.transform(sample)
        return sample


@DATASETS.register(name="WiderFaceDetection", aliases=("WiderFace",))
class WiderFaceDetection(Dataset):
    """(reference: widerface.py:27) — wider_face_*_bbx_gt.txt list format:
    path / count / one box per line (x y w h + attrs)."""

    def __init__(self, data_cfg=None, dictionary=None, transform=None,
                 target_transform=None, stage="train"):
        super().__init__(data_cfg, dictionary, transform, target_transform, stage)
        self.img_dir = data_cfg.IMG_DIR
        ann_file = (data_cfg.LABELS.DET_DIR if data_cfg.LABELS else None) or \
            data_cfg.ANN_FILE
        self.items = []
        with open(ann_file) as f:
            lines = [l.strip() for l in f]
        i = 0
        while i < len(lines):
            path = lines[i]
            n = int(lines[i + 1]) if i + 1 < len(lines) else 0
            boxes = []
            for j in range(n):
                vals = lines[i + 2 + j].split()
                x, y, w, h = (float(v) for v in vals[:4])
                if w > 2 and h > 2:
                    boxes.append([x, y, x + w, y + h])
            self.items.append((path, np.asarray(boxes, np.float32).reshape(-1, 4)))
            i += 2 + max(n, 1)
        if not self.items:
            raise RuntimeError(f"empty annotation file {ann_file}")

    def __len__(self):
        return len(self.items)

    def __getitem__(self, idx):
        path, boxes = self.items[idx]
        img = cv2.imread(os.path.join(self.img_dir, path))
        sample = {"image": img, "target": None}
        if self.stage != "infer":
            sample["target"] = {
                "boxes": boxes.copy(),
                "labels": np.zeros(len(boxes), np.int32),
            }
        if self.transform:
            sample = self.transform(sample)
        return sample


@DATASETS.register(name="PennFudanDetection", aliases=("PennFudan",))
class PennFudanDetection(Dataset):
    """(reference: pennfudan.py:27) — instance masks → boxes + per-instance
    binary masks (instance ids encoded in the PNG)."""

    MASK_SIZE = 112

    def __init__(self, data_cfg=None, dictionary=None, transform=None,
                 target_transform=None, stage="train"):
        super().__init__(data_cfg, dictionary, transform, target_transform, stage)
        root = data_cfg.IMG_DIR
        self._imgs = sorted(globlib.glob(os.path.join(root, "PNGImages", "*.png")))
        self._masks = [p.replace("PNGImages", "PedMasks").replace(
            ".png", "_mask.png") for p in self._imgs]
        if not self._imgs:
            raise RuntimeError(f"no images under {root}")

    def __len__(self):
        return len(self._imgs)

    def __getitem__(self, idx):
        img = cv2.imread(self._imgs[idx])
        sample = {"image": img, "target": None}
        if self.stage != "infer":
            mask = cv2.imread(self._masks[idx], cv2.IMREAD_GRAYSCALE)
            ids = np.unique(mask)
            ids = ids[ids != 0]
            boxes, insts = [], []
            for i in ids:
                m = (mask == i)
                ys, xs = np.where(m)
                boxes.append([xs.min(), ys.min(), xs.max() + 1, ys.max() + 1])
                insts.append(cv2.resize(m.astype(np.float32),
                                        (self.MASK_SIZE, self.MASK_SIZE),
                                        interpolation=cv2.INTER_NEAREST))
            sample["target"] = {
                "boxes": np.asarray(boxes, np.float32).reshape(-1, 4),
                "labels": np.zeros(len(boxes), np.int32),
                "masks": (np.stack(insts) if insts else
                          np.zeros((0, self.MASK_SIZE, self.MASK_SIZE),
                                   np.float32)),
            }
        if self.transform:
            sample = self.transform(sample)
        return sample
