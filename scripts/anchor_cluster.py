#!/usr/bin/env python
"""k-means anchor clustering over dataset boxes
(reference: scripts/anchor_cluster.py — VOC-xml walker + IoU k-means;
here it also reads COCO json, and delegates to the in-tree
``kmean_anchors`` used by autoanchor).

Usage:
  python scripts/anchor_cluster.py --coco instances_train.json -n 9 --img-size 640
  python scripts/anchor_cluster.py --voc  /data/VOC/Annotations  -n 9
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import xml.etree.ElementTree as ET

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def boxes_from_coco(path: str) -> np.ndarray:
    with open(path) as f:
        coco = json.load(f)
    sizes = {im["id"]: (im["width"], im["height"]) for im in coco["images"]}
    wh = []
    for a in coco["annotations"]:
        if a.get("iscrowd"):
            continue
        w, h = a["bbox"][2], a["bbox"][3]
        iw, ih = sizes[a["image_id"]]
        if w > 1 and h > 1:
            wh.append((w / iw, h / ih))
    return np.asarray(wh, np.float64)


def boxes_from_voc(ann_dir: str) -> np.ndarray:
    wh = []
    for xml in glob.glob(os.path.join(ann_dir, "*.xml")):
        tree = ET.parse(xml)
        size = tree.find("size")
        iw = float(size.find("width").text)
        ih = float(size.find("height").text)
        for obj in tree.iter("object"):
            b = obj.find("bndbox")
            w = float(b.find("xmax").text) - float(b.find("xmin").text)
            h = float(b.find("ymax").text) - float(b.find("ymin").text)
            if w > 1 and h > 1:
                wh.append((w / iw, h / ih))
    return np.asarray(wh, np.float64)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--coco", help="COCO instances json")
    ap.add_argument("--voc", help="VOC Annotations dir")
    ap.add_argument("-n", type=int, default=9, help="number of anchors")
    ap.add_argument("--img-size", type=int, default=640)
    args = ap.parse_args(argv)

    if args.coco:
        wh = boxes_from_coco(args.coco)
    elif args.voc:
        wh = boxes_from_voc(args.voc)
    else:
        ap.error("pass --coco or --voc")
    from cvpytorch_tpu.utils.model_utils import kmean_anchors

    anchors = kmean_anchors(wh * args.img_size, n=args.n,
                            img_size=args.img_size)
    print("anchors (w,h):")
    for w, h in anchors:
        print(f"  [{w:.0f}, {h:.0f}]")
    return anchors


if __name__ == "__main__":
    main()
