"""Production-scale timing for the native COCOeval (VERDICT r3 missing #5).

Synthesizes a realistic 5k-image × 80-class × 100-det val pass
(the reference evaluates exactly this shape per epoch through the
pycocotools C extension, eval_coco.py:44-61) and times add_image +
summarize end-to-end.

Realistic density model (approximating COCO val2017): ~7 gt instances
over ~3 categories per image; detections concentrated on the gt
categories plus background-noise classes, 100 per image.

Usage: python scripts/bench_eval.py [--images 5000]
Prints one JSON line with wall seconds and per-stage split.
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from cvpytorch_tpu.evaluator.coco import COCOEvalNative  # noqa: E402


def synth_image(rs, C=80, n_gt=7, n_det=100, hw=640):
    cats = rs.choice(C, 3, replace=False)
    gt_boxes, gt_labels = [], []
    for _ in range(n_gt):
        c = cats[rs.randint(3)]
        x, y = rs.rand(2) * hw * 0.7
        w, h = rs.rand(2) * hw * 0.3 + 8
        gt_boxes.append([x, y, x + w, y + h])
        gt_labels.append(c)
    det_boxes, det_labels, det_scores = [], [], []
    # ~70% of dets jitter the gts (TPs at varied IoU), rest random noise
    for i in range(n_det):
        if i < int(0.7 * n_det):
            j = rs.randint(n_gt)
            b = np.asarray(gt_boxes[j]) + rs.randn(4) * hw * 0.02
            det_labels.append(gt_labels[j])
        else:
            x, y = rs.rand(2) * hw * 0.7
            w, h = rs.rand(2) * hw * 0.3 + 8
            b = np.asarray([x, y, x + w, y + h])
            det_labels.append(rs.randint(C))
        det_boxes.append(b)
        det_scores.append(rs.rand())
    return (np.asarray(gt_boxes), np.asarray(gt_labels),
            np.asarray(det_boxes), np.asarray(det_scores),
            np.asarray(det_labels))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=5000)
    ap.add_argument("--classes", type=int, default=80)
    args = ap.parse_args()

    rs = np.random.RandomState(0)
    ev = COCOEvalNative(args.classes, "bbox")
    t0 = time.perf_counter()
    for i in range(args.images):
        gb, gl, db, ds, dl = synth_image(rs, args.classes)
        ev.add_image(gb, gl, db, ds, dl)
    t_match = time.perf_counter() - t0
    t0 = time.perf_counter()
    stats = ev.summarize()
    t_acc = time.perf_counter() - t0
    print(json.dumps({
        "metric": "native_cocoeval_5k_seconds",
        "value": round(t_match + t_acc, 2),
        "unit": f"s for {args.images} imgs x {args.classes} cls x 100 dets "
                "(1-core host)",
        "match_seconds": round(t_match, 2),
        "accumulate_seconds": round(t_acc, 2),
        "mAP_sanity": round(stats["mAP"], 4),
    }))


if __name__ == "__main__":
    main()
