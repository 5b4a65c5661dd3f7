#!/usr/bin/env python
"""Dataset preparation utilities — the consolidated equivalent of the
reference's 12 per-dataset scripts (scripts/COCOProc.py,
CityspacesProc.py, VOCProc.py, MiniImageNetProc.py, CamVidProc.py,
ADE20kProc.py, FlowerDataProc.py, PetDataProc.py, PortraitMattingProc.py,
PennFudanProc.py, VisDroneProc.py, WiderFaceProc.py: produce class
dictionaries, img/label list files, folder splits, and per-image
annotation conversions).

Subcommands:
  coco-dict      instances json → conf/dicts yml (COCOProc.produceDict)
  coco-subset    filter an instances json to N images (COCOProc.procJson)
  pair-list      mirror-tree img/label dirs → train.txt "img␣label" lines
                 (CityspacesProc/CamVidProc/ADE20kProc/PortraitMattingProc)
  voc-list       VOC ImageSets split → img/label list (VOCProc)
  split-folders  class-folder tree → train/val split (FlowerDataProc,
                 PetDataProc, MiniImageNetProc.splitSample)
  widerface      wider_face_*_bbx_gt.txt → per-image txt labels
                 (WiderFaceProc.convertimgset)
  visdrone       VisDrone annotation sanity pass / class histogram
                 (VisDroneProc.produceImgAndLabel)
  pennfudan      instance masks → per-image box txt (PennFudanProc)
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import random
import shutil


def coco_dict(args):
    with open(args.ann) as f:
        coco = json.load(f)
    cats = sorted(coco["categories"], key=lambda c: c["id"])
    lines = ["DET_CLASSES:"]
    for c in cats:
        name = c["name"].replace(" ", "_")
        lines.append(f"  - {name}: 1.0")
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {len(cats)} classes to {args.out}")


def coco_subset(args):
    with open(args.ann) as f:
        coco = json.load(f)
    keep = coco["images"][: args.n]
    ids = {im["id"] for im in keep}
    out = {
        "images": keep,
        "annotations": [a for a in coco["annotations"]
                        if a["image_id"] in ids],
        "categories": coco["categories"],
    }
    with open(args.out, "w") as f:
        json.dump(out, f)
    print(f"kept {len(keep)} images / {len(out['annotations'])} anns")


def pair_list(args):
    imgs = sorted(glob.glob(os.path.join(args.img_dir, "**", args.img_glob),
                            recursive=True))
    pairs = []
    for p in imgs:
        rel = os.path.relpath(p, args.img_dir)
        lab = os.path.join(args.label_dir,
                           os.path.splitext(rel)[0] + args.label_suffix)
        if os.path.exists(lab):
            pairs.append(f"{p} {lab}")
    with open(args.out, "w") as f:
        f.write("\n".join(pairs) + "\n")
    print(f"wrote {len(pairs)} pairs to {args.out}")


def voc_list(args):
    split_file = os.path.join(args.root, "ImageSets", args.task,
                              args.split + ".txt")
    names = [ln.split()[0] for ln in open(split_file) if ln.strip()]
    lines = []
    for n in names:
        img = os.path.join(args.root, "JPEGImages", n + ".jpg")
        lab = os.path.join(
            args.root,
            "SegmentationClass" if args.task == "Segmentation"
            else "Annotations",
            n + (".png" if args.task == "Segmentation" else ".xml"))
        lines.append(f"{img} {lab}")
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {len(lines)} entries")


def split_folders(args):
    random.seed(args.seed)
    classes = sorted(d for d in os.listdir(args.src)
                     if os.path.isdir(os.path.join(args.src, d)))
    for c in classes:
        files = sorted(glob.glob(os.path.join(args.src, c, "*")))
        random.shuffle(files)
        n_val = max(1, int(len(files) * args.val_rate))
        for stage, chunk in (("val", files[:n_val]),
                             ("train", files[n_val:])):
            dst = os.path.join(args.dst, stage, c)
            os.makedirs(dst, exist_ok=True)
            for p in chunk:
                shutil.copy(p, dst)
    print(f"split {len(classes)} classes into {args.dst}/(train|val)")


def widerface(args):
    """wider_face_{split}_bbx_gt.txt → <img>.txt with 'x1 y1 x2 y2 1'."""
    n_img = 0
    with open(args.gt) as f:
        lines = [ln.strip() for ln in f]
    i = 0
    while i < len(lines):
        name = lines[i]
        cnt = int(lines[i + 1])
        boxes = lines[i + 2: i + 2 + max(cnt, 1)]
        i += 2 + max(cnt, 1)
        out = os.path.join(args.out_dir,
                           os.path.splitext(name.replace("/", "_"))[0]
                           + ".txt")
        os.makedirs(args.out_dir, exist_ok=True)
        rows = []
        for b in boxes[:cnt]:
            x, y, w, h = (float(v) for v in b.split()[:4])
            if w < 2 or h < 2:
                continue
            rows.append(f"{x:.0f} {y:.0f} {x + w:.0f} {y + h:.0f} 1")
        with open(out, "w") as f:
            f.write("\n".join(rows) + "\n")
        n_img += 1
    print(f"converted {n_img} images")


def visdrone(args):
    hist = {}
    n = 0
    for txt in glob.glob(os.path.join(args.ann_dir, "*.txt")):
        for ln in open(txt):
            parts = ln.strip().rstrip(",").split(",")
            if len(parts) >= 6:
                hist[int(float(parts[5]))] = \
                    hist.get(int(float(parts[5])), 0) + 1
                n += 1
    print(f"{n} boxes; per-class:", dict(sorted(hist.items())))


def pennfudan(args):
    import cv2
    import numpy as np

    os.makedirs(args.out_dir, exist_ok=True)
    n = 0
    for mp in sorted(glob.glob(os.path.join(args.mask_dir, "*.png"))):
        mask = cv2.imread(mp, cv2.IMREAD_GRAYSCALE)
        rows = []
        for iid in np.unique(mask):
            if iid == 0:
                continue
            ys, xs = np.where(mask == iid)
            rows.append(f"{xs.min()} {ys.min()} {xs.max()} {ys.max()} person")
        out = os.path.join(args.out_dir,
                           os.path.splitext(os.path.basename(mp))[0] + ".txt")
        with open(out, "w") as f:
            f.write("\n".join(rows) + "\n")
        n += 1
    print(f"converted {n} masks")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("coco-dict")
    p.add_argument("--ann", required=True)
    p.add_argument("--out", required=True)
    p.set_defaults(fn=coco_dict)

    p = sub.add_parser("coco-subset")
    p.add_argument("--ann", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("-n", type=int, default=100)
    p.set_defaults(fn=coco_subset)

    p = sub.add_parser("pair-list")
    p.add_argument("--img-dir", required=True)
    p.add_argument("--label-dir", required=True)
    p.add_argument("--img-glob", default="*.png")
    p.add_argument("--label-suffix", default=".png")
    p.add_argument("--out", required=True)
    p.set_defaults(fn=pair_list)

    p = sub.add_parser("voc-list")
    p.add_argument("--root", required=True)
    p.add_argument("--task", choices=("Main", "Segmentation"),
                   default="Main")
    p.add_argument("--split", default="train")
    p.add_argument("--out", required=True)
    p.set_defaults(fn=voc_list)

    p = sub.add_parser("split-folders")
    p.add_argument("--src", required=True)
    p.add_argument("--dst", required=True)
    p.add_argument("--val-rate", type=float, default=0.2)
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=split_folders)

    p = sub.add_parser("widerface")
    p.add_argument("--gt", required=True)
    p.add_argument("--out-dir", required=True)
    p.set_defaults(fn=widerface)

    p = sub.add_parser("visdrone")
    p.add_argument("--ann-dir", required=True)
    p.set_defaults(fn=visdrone)

    p = sub.add_parser("pennfudan")
    p.add_argument("--mask-dir", required=True)
    p.add_argument("--out-dir", required=True)
    p.set_defaults(fn=pennfudan)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
