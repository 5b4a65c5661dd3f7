"""COCO detection / keypoint / segmentation datasets
(reference: src/data/datasets/coco.py:35-306, which wraps pycocotools;
absent here, so annotations are parsed directly from instances_*.json).

Behavior parity:
* invalid-annotation filtering — images whose anns are all crowd/degenerate
  are dropped (reference :72-88);
* category ids remapped to contiguous [0, C) via the dictionary order;
* ``LOAD_NUM`` probabilistic multi-sample fetch for mosaic
  (reference :25-33,106-116): with MOSAIC_PROB the item is a list of 4
  samples for ``RandomAffineWithMosaic``.
"""
from __future__ import annotations

import json
import os
import random

import cv2
import numpy as np

from ...registry import DATASETS
from .base import Dataset


@DATASETS.register(name="CocoDetection")
class CocoDetection(Dataset):
    def __init__(self, data_cfg=None, dictionary=None, transform=None,
                 target_transform=None, stage="train"):
        super().__init__(data_cfg, dictionary, transform, target_transform, stage)
        self.img_dir = data_cfg.IMG_DIR
        ann_file = (data_cfg.LABELS.DET_DIR if data_cfg.LABELS else None) or \
            data_cfg.ANN_FILE
        self.load_num = int(getattr(data_cfg, "LOAD_NUM", None) or 1)
        self.mosaic_prob = float(getattr(data_cfg, "MOSAIC_PROB", None) or
                                 (1.0 if self.load_num > 1 else 0.0))

        with open(ann_file) as f:
            coco = json.load(f)
        # category remap: json category_id → contiguous id by dictionary order
        cats = sorted(coco["categories"], key=lambda c: c["id"])
        if self.dictionary:
            name_order = {n: i for i, n in enumerate(self.category)}
            self.catid2label = {
                c["id"]: name_order[c["name"]] for c in cats
                if c["name"] in name_order
            }
        else:
            self.catid2label = {c["id"]: i for i, c in enumerate(cats)}

        anns_by_img: dict[int, list] = {}
        for a in coco["annotations"]:
            if a.get("iscrowd", 0):
                continue
            x, y, w, h = a["bbox"]
            if w <= 1 or h <= 1 or a["category_id"] not in self.catid2label:
                continue
            anns_by_img.setdefault(a["image_id"], []).append(a)

        self.items = []
        for img in coco["images"]:
            anns = anns_by_img.get(img["id"], [])
            if stage == "train" and not anns:
                continue  # invalid-image filter (reference :72-88)
            self.items.append({
                "id": img["id"],
                "file_name": img["file_name"],
                "height": img["height"],
                "width": img["width"],
                "anns": anns,
            })
        if not self.items:
            raise RuntimeError(f"no usable images in {ann_file}")

        # RAM cache (reference coco.py:143-169: threaded decode of the whole
        # split, persisted next to the image dir keyed by a path hash) —
        # needed to feed a 500+ img/s train step from JPEGs
        self._cache = None
        if bool(getattr(data_cfg, "CACHE", None)):
            self._cache = self._cache_images()

    def _cache_images(self):
        import hashlib
        from concurrent.futures import ThreadPoolExecutor

        paths = [os.path.join(self.img_dir, it["file_name"])
                 for it in self.items]
        # key on path + size + mtime so re-downloaded / fixed images with
        # the same names invalidate the cache (reference cache-versioning)
        sig = "".join(
            f"{p}:{os.path.getsize(p)}:{int(os.path.getmtime(p))}"
            if os.path.isfile(p) else p for p in paths)
        h = hashlib.md5(sig.encode()).hexdigest()
        cache_path = os.path.join(
            os.path.dirname(os.path.abspath(self.img_dir)),
            f"{self.stage}_{h[:12]}.cache.npy")
        if os.path.isfile(cache_path):
            blob = np.load(cache_path, allow_pickle=True).item()
            if blob.get("hash") == h:
                return blob["images"]
        with ThreadPoolExecutor(max_workers=8) as pool:
            images = list(pool.map(cv2.imread, paths))
        for p, im in zip(paths, images):
            if im is None:
                raise IOError(f"failed to read {p}")
        try:
            np.save(cache_path, {"hash": h, "images": images},
                    allow_pickle=True)
        except OSError:
            pass  # cache dir not writable — RAM cache still active
        return images

    def __len__(self):
        return len(self.items)

    def _load_one(self, idx: int) -> dict:
        item = self.items[idx]
        if self._cache is not None:
            img = self._cache[idx].copy()   # transforms mutate in place
        else:
            img = cv2.imread(os.path.join(self.img_dir, item["file_name"]))
        if img is None:
            raise IOError(f"failed to read {item['file_name']}")
        boxes, labels = [], []
        for a in item["anns"]:
            x, y, w, h = a["bbox"]
            boxes.append([x, y, x + w, y + h])
            labels.append(self.catid2label[a["category_id"]])
        target = {
            "boxes": np.asarray(boxes, np.float32).reshape(-1, 4),
            "labels": np.asarray(labels, np.int32),
            "image_id": item["id"],
            "height": item["height"],
            "width": item["width"],
        }
        return {"image": img,
                "target": None if self.stage == "infer" else target}

    def __getitem__(self, idx: int):
        if (self.stage == "train" and self.load_num > 1 and
                random.random() < self.mosaic_prob):
            extra = [random.randrange(len(self)) for _ in range(self.load_num - 1)]
            samples = [self._load_one(i) for i in [idx, *extra]]
            return self.transform(samples) if self.transform else samples
        sample = self._load_one(idx)
        return self.transform(sample) if self.transform else sample


def _rasterize_polygons(segm, height, width, out_size: int = 112):
    """COCO polygon(s) → binary mask at out_size (pycocotools-free;
    reference uses pycocotools RLE, coco.py:15, det_transforms.py:1580)."""
    mask = np.zeros((height, width), np.uint8)
    if isinstance(segm, list):  # polygons
        for poly in segm:
            pts = np.asarray(poly, np.float64).reshape(-1, 2)
            cv2.fillPoly(mask, [pts.astype(np.int32)], 1)
    elif isinstance(segm, dict) and "counts" in segm:
        # RLE — uncompressed (list of counts) or compressed (string, the
        # form COCO JSONs use for iscrowd regions; the reference reads it
        # through pycocotools' C maskUtils, ours through the native codec)
        from ...native import rle_decode_string, rle_to_mask
        counts = segm["counts"]
        if isinstance(counts, (str, bytes)):
            counts = rle_decode_string(counts)
        h, w = segm.get("size", [height, width])
        mask = rle_to_mask(np.asarray(counts, np.int64), h, w)
    return cv2.resize(mask, (out_size, out_size),
                      interpolation=cv2.INTER_NEAREST).astype(np.float32)


@DATASETS.register(name="CocoSegmentation")
class CocoSegmentation(CocoDetection):
    """Instance segmentation: detection targets + per-instance masks
    rasterized at MASK_SIZE (reference: coco.py:252)."""

    MASK_SIZE = 112   # default; override per-dataset with yaml MASK_SIZE

    def __init__(self, data_cfg=None, dictionary=None, transform=None,
                 target_transform=None, stage="train"):
        super().__init__(data_cfg, dictionary, transform, target_transform,
                         stage)
        self.mask_size = int(getattr(data_cfg, "MASK_SIZE", None)
                             or self.MASK_SIZE)

    def _load_one(self, idx: int) -> dict:
        sample = super()._load_one(idx)
        item = self.items[idx]
        if sample["target"] is not None:
            masks = [
                _rasterize_polygons(a.get("segmentation", []),
                                    item["height"], item["width"],
                                    self.mask_size)
                for a in item["anns"]
            ]
            sample["target"]["masks"] = (
                np.stack(masks) if masks
                else np.zeros((0, self.mask_size, self.mask_size),
                              np.float32))
        return sample


@DATASETS.register(name="CocoKeypoint")
class CocoKeypoint(CocoDetection):
    """Keypoint task: person boxes + 17 COCO keypoints
    (reference: coco.py:186)."""

    def _load_one(self, idx: int) -> dict:
        sample = super()._load_one(idx)
        item = self.items[idx]
        if sample["target"] is not None:
            kps = []
            for a in item["anns"]:
                k = np.asarray(a.get("keypoints", [0] * 51),
                               np.float32).reshape(-1, 3)
                kps.append(k)
            sample["target"]["keypoints"] = (
                np.stack(kps) if kps else np.zeros((0, 17, 3), np.float32))
            # pycocotools computeOks normalizes by the annotation
            # 'area' (segmentation area), NOT the box area — carry it
            # through, falling back to box area when absent
            sample["target"]["areas"] = np.asarray(
                [a.get("area") or
                 (a["bbox"][2] * a["bbox"][3]) for a in item["anns"]],
                np.float32)
        return sample
