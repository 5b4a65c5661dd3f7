"""On-chip mini-convergence run (VERDICT r3 next #1, real-chip half):
YOLOv5-s 640², a few hundred steps over a painted-boxes synthetic COCO
loader, mAP evaluated every ~100 steps — the committed record of the
trajectory lives in PERF.md.

Unlike bench.py's noise images, these JPEGs PAINT the boxes (solid
class-colored rectangles), so the mapping pixels→boxes is learnable and
mAP must rise if loss+assigner+decode+NMS+eval cohere on the TPU.

Usage: python scripts/convergence_chip.py [--steps 300] [--size 320]
Prints one JSON line per eval point and a final summary line.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synthetic_painted_coco(n_img: int, hw: int):
    import tempfile

    import cv2

    tmp = tempfile.mkdtemp(prefix="conv_chip_")
    rng = np.random.RandomState(0)
    images, anns = [], []
    aid = 0
    for i in range(n_img):
        img = rng.randint(0, 30, (hw, hw, 3), np.uint8)
        n = rng.randint(2, 6)
        for _ in range(n):
            cls = rng.randint(0, 2)
            bw = rng.randint(hw // 8, hw // 3)
            bh = rng.randint(hw // 8, hw // 3)
            x0 = rng.randint(0, hw - bw)
            y0 = rng.randint(0, hw - bh)
            img[y0:y0 + bh, x0:x0 + bw] = (80 + 100 * cls)
            anns.append({"id": aid, "image_id": i, "category_id": cls + 1,
                         "bbox": [float(x0), float(y0),
                                  float(bw), float(bh)],
                         "area": float(bw * bh), "iscrowd": 0})
            aid += 1
        cv2.imwrite(os.path.join(tmp, f"{i}.jpg"), img)
        images.append({"id": i, "file_name": f"{i}.jpg",
                       "height": hw, "width": hw})
    ann_file = os.path.join(tmp, "ann.json")
    json.dump({"images": images, "annotations": anns,
               "categories": [{"id": 1, "name": "a"},
                              {"id": 2, "name": "b"}]},
              open(ann_file, "w"))
    return tmp, ann_file


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--size", type=int, default=320)
    ap.add_argument("--images", type=int, default=32)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()

    import jax

    from cvpytorch_tpu.config import CommonConfiguration
    from cvpytorch_tpu.data.datasets.coco import CocoDetection
    from cvpytorch_tpu.data.loader import DataLoader
    from cvpytorch_tpu.data.transforms import build_transforms
    from cvpytorch_tpu.data.transforms.det_transforms import make_det_collate
    from cvpytorch_tpu.evaluator.coco import CocoEvaluator
    from cvpytorch_tpu.models.yolov5 import YOLOv5
    from cvpytorch_tpu.optim.optimizers import build_optimizer
    from cvpytorch_tpu.optim.schedules import build_lr_scheduler
    from cvpytorch_tpu.parallel.mesh import create_mesh, shard_batch
    from cvpytorch_tpu.train_state import (create_train_state,
                                           make_eval_step, make_train_step)

    HW = args.size
    tmp, ann_file = synthetic_painted_coco(args.images, HW)
    dcfg = CommonConfiguration({"IMG_DIR": tmp, "ANN_FILE": ann_file})
    tf = build_transforms("DET_CLASSES", {
        "Resize": {"size": [HW, HW], "keep_ratio": True},
        "ToTensor": {},
        "Normalize": {"mean": [0, 0, 0], "std": [1, 1, 1]},
    }, "train")
    dictionary = ({"a": 1.0}, {"b": 1.0})
    ds = CocoDetection(data_cfg=dcfg, dictionary=list(dictionary),
                       stage="train")
    ds.transform = tf
    loader = DataLoader(ds, batch_size=args.batch, shuffle=True,
                        num_workers=2, collate_fn=make_det_collate(32),
                        drop_last=True)

    model = YOLOv5(dictionary=dictionary, model_cfg=CommonConfiguration(
        {"TYPE": "yolov5_s",
         "LOSS": {"name": "YOLOv5Loss", "hyp_box": 0.05, "hyp_obj": 1.0,
                  "hyp_cls": 0.5}}))
    tcfg = CommonConfiguration({
        "INIT_LR": 0.01, "N_MAX_EPOCHS": 300,
        "OPTIMIZER": {"TYPE": "Adam"},
        "LR_SCHEDULER": {"TYPE": "CosineAnnealingLR"},
        "WARMUP": {"NAME": "linear", "ITERS": 16, "FACTOR": 0.1},
    })
    steps_per_epoch = max(len(loader), 1)
    tx = build_optimizer(tcfg, build_lr_scheduler(tcfg, steps_per_epoch))
    mesh = create_mesh()

    it = iter(loader)

    def nb():
        nonlocal it
        try:
            return next(it)
        except StopIteration:
            it = iter(loader)
            return next(it)

    first = shard_batch(mesh, nb())
    state = create_train_state(model, tx, jax.random.PRNGKey(0), first,
                               use_ema=False)
    train_step = make_train_step(amp=True)
    eval_step = make_eval_step(use_ema=False)

    def eval_map(state):
        ev = CocoEvaluator(num_classes=2, eval_type="mAP")
        for _ in range(max(args.images // args.batch, 1)):
            b = shard_batch(mesh, nb())
            _, preds = eval_step(state, b)
            ev.update(jax.tree_util.tree_map(np.asarray, b["target"]),
                      jax.tree_util.tree_map(np.asarray, preds))
        return ev.evaluate()

    t0 = time.time()
    traj = []
    for s in range(args.steps + 1):
        if s % max(args.steps // 3, 1) == 0:
            m = eval_map(state)
            traj.append((s, round(m["mAP"], 4), round(m["AP50"], 4)))
            print(json.dumps({"step": s, "mAP": m["mAP"],
                              "AP50": m["AP50"],
                              "t": round(time.time() - t0, 1)}), flush=True)
        state, metrics = train_step(state, shard_batch(mesh, nb()))
    loss = float(metrics["loss"])
    print(json.dumps({
        "metric": "yolov5s_onchip_convergence",
        "trajectory_step_mAP_AP50": traj,
        "final_loss": round(loss, 4),
        "monotone_rising": all(b[1] >= a[1] - 1e-6
                               for a, b in zip(traj, traj[1:])),
    }))


if __name__ == "__main__":
    main()
