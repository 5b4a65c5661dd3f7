"""Headline benchmark: YOLOv5-s 640² training images/sec/chip
(BASELINE.md driver target).  Prints ONE JSON line.

The reference publishes no speed numbers (BASELINE.json ``published`` is
empty), so ``vs_baseline`` is the ratio against a fixed reference figure of
95 img/s/GPU for YOLOv5-s bs32@640 fp16 training — the published
ultralytics V100 figure commonly used as the PyTorch single-GPU anchor.
"""
from __future__ import annotations

import json
import time

import numpy as np

PYTORCH_BASELINE_IPS = 95.0  # YOLOv5-s 640 fp16 train, single V100 anchor


def main():
    import os

    import jax
    import jax.numpy as jnp

    # Headline measures the AMP recipe (PERF.md r5 ledger, both gates
    # A/B'd same-session on-chip: 147.2 → 129.0 ms/step, 869 → 992 img/s):
    # - bf16 BN batch-moment reductions (train-mode only; running stats +
    #   eval normalize stay f32). Convergence-proven at this exact config
    #   on the real chip — flagship 640² mAP 0.2024 under the gate vs
    #   0.186 f32, same budget.
    # - obj-lane one-hot selection matmul (Precision.HIGHEST) in the
    #   YOLOv5 loss — exactness-tested vs the strided slice.
    # Override with CVT_BN_BF16_STATS=0 / CVT_OBJ_SLICE=slice for the
    # fidelity-grade default path.
    os.environ.setdefault("CVT_BN_BF16_STATS", "1")
    os.environ.setdefault("CVT_OBJ_SLICE", "matmul")

    from cvpytorch_tpu.config import CommonConfiguration
    from cvpytorch_tpu.models.yolov5 import YOLOv5
    from cvpytorch_tpu.optim.optimizers import build_optimizer
    from cvpytorch_tpu.optim.schedules import build_lr_scheduler
    from cvpytorch_tpu.parallel.mesh import create_mesh, shard_batch
    from cvpytorch_tpu.train_state import create_train_state, make_train_step

    on_tpu = jax.default_backend() == "tpu"
    # bs128 measured fastest per-chip (r2 sweep: 507@32 / 721@96 / 820@128)
    B = 128 if on_tpu else 4
    HW = 640 if on_tpu else 64
    M = 32
    steps = 20 if on_tpu else 3

    dictionary = tuple({f"c{i}": 1.0} for i in range(80))
    cfg = CommonConfiguration({
        "TYPE": "yolov5_s" if on_tpu else "yolov5_n",
        "LOSS": {"name": "YOLOv5Loss"},
    })
    model = YOLOv5(dictionary=dictionary, model_cfg=cfg)

    rng = np.random.RandomState(0)
    boxes = np.zeros((B, M, 4), np.float32)
    nb = 8
    for i in range(B):
        xy = rng.rand(nb, 2) * (HW * 0.7)
        wh = rng.rand(nb, 2) * (HW * 0.25) + 8
        boxes[i, :nb] = np.concatenate([xy, xy + wh], -1).clip(0, HW - 1)
    batch = {
        # uint8 + device-side /255: 4x less H2D traffic than f32
        "image": (rng.rand(B, HW, HW, 3) * 255).astype(np.uint8),
        "target": {
            "boxes": boxes,
            "labels": rng.randint(0, 80, (B, M)).astype(np.int32),
            "valid": np.arange(M)[None] < nb,
            "pads": np.zeros((B, 2), np.float32),
            "scales": np.ones((B, 2), np.float32),
            "height": np.full((B,), HW, np.int32),
            "width": np.full((B,), HW, np.int32),
        },
    }

    tcfg = CommonConfiguration({
        "INIT_LR": 0.01, "N_MAX_EPOCHS": 300,
        "OPTIMIZER": {"TYPE": "SGD", "MOMENTUM": 0.937,
                      "WEIGHT_PARAMS": {"weight_decay": 5e-4}},
        "LR_SCHEDULER": {"TYPE": "LambdaLR", "LRF": 0.1},
    })
    tx = build_optimizer(tcfg, build_lr_scheduler(tcfg, 100))
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch,
                               use_ema=True)
    mesh = create_mesh()
    sb = shard_batch(mesh, batch)
    train_step = make_train_step(amp=True, ema_decay=0.9999)

    # warmup/compile — fence with a VALUE FETCH: on the axon backend
    # block_until_ready returns before execution finishes, so fetching the
    # scalar is the only reliable completion barrier
    for _ in range(3):
        state, metrics = train_step(state, sb)
        float(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = train_step(state, sb)
    float(metrics["loss"])
    dt = time.perf_counter() - t0

    n_chips = len(jax.devices())
    ips_per_chip = steps * B / dt / n_chips

    # p50 single-image inference latency (BASELINE.md headline metric):
    # full infer path incl. in-graph decode+NMS, fenced by host fetches
    from cvpytorch_tpu.train_state import make_predict_step

    pstep = make_predict_step()
    img1 = jnp.asarray(np.asarray(batch["image"][:1]))
    lats = []
    for i in range(30 if on_tpu else 3):
        t0 = time.perf_counter()
        out = pstep(state, img1)
        float(out["scores"][0, 0])
        lats.append(time.perf_counter() - t0)
    lats = sorted(lats[2:]) or [0.0]
    p50_ms = lats[len(lats) // 2] * 1e3

    # same-run dispatch-floor probe (VERDICT r4 weak #1): a trivial jitted
    # (x+1) round-trip measured in the SAME process/session, so the bs1
    # p50 decomposes into relay floor + real compute, and run-to-run relay
    # jitter is visible as floor movement instead of a phantom regression
    tiny = jax.jit(lambda x: x + 1.0)
    float(tiny(jnp.zeros(())))  # compile + flush
    floors = []
    for _ in range(20 if on_tpu else 3):
        t0 = time.perf_counter()
        float(tiny(jnp.zeros(())))
        floors.append(time.perf_counter() - t0)
    floors = sorted(floors[2:]) or [0.0]
    floor_ms = floors[len(floors) // 2] * 1e3

    out = {
        "metric": "yolov5s_640_train_images_per_sec_per_chip" if on_tpu
        else "yolov5n_64_train_images_per_sec_per_chip(cpu-smoke)",
        "value": round(ips_per_chip, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips_per_chip / PYTORCH_BASELINE_IPS, 3)
        if on_tpu else 0.0,
        "p50_infer_bs1_ms": round(p50_ms, 2),
        "p50_dispatch_floor_ms": round(floor_ms, 2),
        "p50_minus_floor_ms": round(p50_ms - floor_ms, 2),
        "p50_dispatch_floor_note": "floor = same-run trivial-jit "
        "round-trip p50 (relay RTT); p50_minus_floor is the real "
        "decode+NMS compute — compare THAT across rounds, the floor "
        "moves with relay load",
        "batch_size": B,
        # train-mode bf16 BN-moment reductions (AMP_BN_BF16_STATS knob)
        # + obj-lane selection matmul; accuracy-proven config, see
        # PERF.md r5 ledger
        "amp_bn_bf16_stats": os.environ.get("CVT_BN_BF16_STATS") == "1",
        "obj_slice_matmul": os.environ.get("CVT_OBJ_SLICE") == "matmul",
    }
    if on_tpu:
        try:
            out.update(e2e_bench())   # measured fed throughput (r3 #4)
        except Exception as e:        # never lose the headline metric
            out["e2e_error"] = str(e)[:200]
    print(json.dumps(out))


def _synthetic_coco_on_disk(n_img: int = 256, hw=(480, 640)):
    """Synthetic JPEG dataset + COCO json under a temp dir."""
    import os
    import tempfile

    import cv2

    tmp = tempfile.mkdtemp(prefix="bench_pipe_")
    rng = np.random.RandomState(0)
    images, anns = [], []
    for i in range(n_img):
        img = rng.randint(0, 255, (*hw, 3), np.uint8)
        cv2.imwrite(os.path.join(tmp, f"{i}.jpg"), img)
        images.append({"id": i, "file_name": f"{i}.jpg",
                       "height": hw[0], "width": hw[1]})
        for j in range(8):
            x, y = rng.rand(2) * 300
            w, h = rng.rand(2) * 100 + 16
            anns.append({"id": i * 8 + j, "image_id": i, "category_id": 1,
                         "bbox": [float(x), float(y), float(w), float(h)],
                         "area": float(w * h), "iscrowd": 0})
    ann_file = os.path.join(tmp, "ann.json")
    json.dump({"images": images, "annotations": anns,
               "categories": [{"id": 1, "name": "thing"}]},
              open(ann_file, "w"))
    return tmp, ann_file


def e2e_bench():
    """`python bench.py --e2e` (also folded into the default TPU run):
    END-TO-END fed training throughput — the real DEVICE_AUG input path
    (RAM-cached JPEG decode → host letterbox to uint8 half-res tiles →
    H2D → in-graph mosaic/affine/HSV/flip/normalize → jitted train step),
    measured, not extrapolated (VERDICT r2 weak #2; r3 weak #1 asked for
    the per-segment accounting below).

    The aug is fused INTO the train-step jit (``preprocess=``): one relay
    dispatch per step — the r3 bench paid the ~33 ms axon dispatch floor
    ~7× per step on separate asarray/aug/zeros calls and fed only bs16.
    Segments reported: loader-only img/s (host decode+letterbox), H2D
    MB/s (the ~130 MB/s tunnel is this rig's binding constraint: a 640²
    mosaic group is 4×320²×3 B = 1.2 MB → ceiling ≈ tunnel/1.2MB img/s),
    device-resident step img/s (chip ceiling), and the fed number."""
    import time as _time

    import jax
    import jax.numpy as jnp

    from cvpytorch_tpu.config import CommonConfiguration
    from cvpytorch_tpu.data.datasets.coco import CocoDetection
    from cvpytorch_tpu.data.loader import DataLoader
    from cvpytorch_tpu.data.transforms.det_transforms import \
        make_device_aug_collate
    from cvpytorch_tpu.models.yolov5 import YOLOv5
    from cvpytorch_tpu.ops.augment import fused_det_augment
    from cvpytorch_tpu.optim.optimizers import build_optimizer
    from cvpytorch_tpu.optim.schedules import build_lr_scheduler
    from cvpytorch_tpu.train_state import create_train_state, make_train_step

    on_tpu = jax.default_backend() == "tpu"
    B = 64 if on_tpu else 2           # mosaic groups (= images) per step
    SIZE = 640 if on_tpu else 64
    TILE = SIZE // 2
    steps = 16 if on_tpu else 3

    tmp, ann_file = _synthetic_coco_on_disk(128 if on_tpu else 16)
    cfg = CommonConfiguration({"IMG_DIR": tmp, "ANN_FILE": ann_file,
                               "LOAD_NUM": 4, "CACHE": True})
    ds = CocoDetection(data_cfg=cfg, dictionary=[{"thing": 1.0}],
                       stage="train")
    ds.transform = None
    loader = DataLoader(ds, batch_size=B, shuffle=True, num_workers=4,
                        collate_fn=make_device_aug_collate(16, TILE),
                        drop_last=True)

    model = YOLOv5(dictionary=({"thing": 1.0},),
                   model_cfg=CommonConfiguration(
                       {"TYPE": "yolov5_s" if on_tpu else "yolov5_n",
                        "LOSS": {"name": "YOLOv5Loss"}}))
    tcfg = CommonConfiguration({
        "INIT_LR": 0.01, "N_MAX_EPOCHS": 300,
        "OPTIMIZER": {"TYPE": "SGD", "MOMENTUM": 0.937},
        "LR_SCHEDULER": {"TYPE": "LambdaLR", "LRF": 0.1},
    })
    tx = build_optimizer(tcfg, build_lr_scheduler(tcfg, 100))

    def preprocess(batch):
        """Raw uint8 tiles → train batch, traced into the train step
        (mirrors Trainer._device_aug_preprocess)."""
        t = batch["target"]
        key = jax.random.fold_in(jax.random.PRNGKey(7919), t["aug_step"])
        imgs, boxes, keep = fused_det_augment(
            batch["image"], t["boxes"], t["valid"], key, SIZE)
        nB = imgs.shape[0]
        return {"image": imgs, "target": {
            "boxes": boxes,
            "labels": t["labels"].reshape(nB, -1),
            "valid": keep,
            "pads": jnp.zeros((nB, 2), jnp.float32),
            "scales": jnp.ones((nB, 2), jnp.float32),
            "height": jnp.full((nB,), SIZE, jnp.int32),
            "width": jnp.full((nB,), SIZE, jnp.int32),
        }}

    it = iter(loader)

    def next_batch(s):
        nonlocal it
        try:
            b = next(it)
        except StopIteration:
            it = iter(loader)
            b = next(it)
        b["target"]["aug_step"] = np.int32(s)
        return b

    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               preprocess(next_batch(0)), use_ema=True)
    train_step = make_train_step(amp=True, ema_decay=0.9999,
                                 preprocess=preprocess)
    for s in range(2):                  # compile + warm caches
        state, metrics = train_step(state, next_batch(s))
        float(metrics["loss"])

    # -- segment 1: fed end-to-end (loader → H2D → fused aug+step) ------
    # double-buffered device prefetch (data/loader.py::DevicePrefetcher):
    # host decode + H2D for step k+1 overlap device compute for step k,
    # so fed approaches the slowest STAGE, not the serial sum
    from cvpytorch_tpu.data.loader import DevicePrefetcher

    feed = DevicePrefetcher(
        (next_batch(s + 2) for s in range(steps)), depth=2)
    t0 = _time.perf_counter()
    for dbatch in feed:
        state, metrics = train_step(state, dbatch)
    float(metrics["loss"])
    fed_dt = _time.perf_counter() - t0

    # -- segment 2: loader only (host decode + letterbox + collate) -----
    t0 = _time.perf_counter()
    for s in range(steps):
        next_batch(s)
    loader_dt = _time.perf_counter() - t0

    # -- segment 3: H2D steady-state (fresh uint8 batches, pipelined,
    # ONE fence at the end — a single fenced transfer pays the ~33 ms
    # relay dispatch floor and under-reports bandwidth ~2×, which is how
    # BENCH_r04's fed rate 'exceeded' its own ceiling; VERDICT r4 weak #2)
    raw = next_batch(0)
    nbytes = raw["image"].nbytes
    h2d_n = max(steps // 2, 4)
    fresh = [raw["image"].copy() for _ in range(h2d_n)]
    for b in fresh:
        b[0, 0, 0, 0] ^= 1              # distinct content, no dedup
    t0 = _time.perf_counter()
    devs = [jax.device_put(b) for b in fresh]
    # the summed scalar depends on EVERY transfer → one fence covers all
    float(sum(jnp.sum(d[..., 0, 0, 0].astype(jnp.float32)) for d in devs))
    h2d_dt = (_time.perf_counter() - t0) / h2d_n
    del devs

    # -- segment 4: device-resident step (chip ceiling, no feed) --------
    dev_batch = jax.tree_util.tree_map(jax.device_put, raw)
    state, metrics = train_step(state, dev_batch)
    float(metrics["loss"])
    t0 = _time.perf_counter()
    for s in range(steps):
        state, metrics = train_step(state, dev_batch)
    float(metrics["loss"])
    step_dt = _time.perf_counter() - t0

    h2d_mbs = nbytes / h2d_dt / 1e6
    rates = {
        "e2e_loader_only_images_per_sec": round(steps * B / loader_dt, 2),
        "e2e_h2d_ceiling_images_per_sec": round(
            h2d_mbs * 1e6 / (nbytes / B), 2),
        "e2e_device_step_images_per_sec": round(steps * B / step_dt, 2),
    }
    return {
        "e2e_fed_images_per_sec": round(steps * B / fed_dt, 2),
        **rates,
        "e2e_h2d_mb_per_sec": round(h2d_mbs, 1),
        "e2e_pipeline_bound_images_per_sec": round(min(rates.values()), 2),
        "e2e_batch_groups": B,
        "e2e_steps": steps,
        "e2e_note": "double-buffered prefetch: fed ≈ pipeline bound = "
        "min(loader, h2d_ceiling, device_step), each measured "
        "steady-state; on this 1-core/tunneled rig h2d binds, production "
        "hosts (~100 vCPU, PCIe H2D) bind on device_step",
    }


def _det_targets(rng, B, M, HW, n=6, with_masks=False, mask_size=112):
    import numpy as np

    boxes = np.zeros((B, M, 4), np.float32)
    for i in range(B):
        xy = rng.rand(n, 2) * (HW * 0.6)
        wh = rng.rand(n, 2) * (HW * 0.3) + 12
        boxes[i, :n] = np.concatenate([xy, xy + wh], -1).clip(0, HW - 1)
    t = {
        "boxes": boxes,
        "labels": rng.randint(0, 4, (B, M)).astype(np.int32),
        "valid": np.tile(np.arange(M)[None] < n, (B, 1)),
        "pads": np.zeros((B, 2), np.float32),
        "scales": np.ones((B, 2), np.float32),
        "height": np.full((B,), HW, np.int32),
        "width": np.full((B,), HW, np.int32),
    }
    if with_masks:
        m = np.zeros((B, M, mask_size, mask_size), np.float32)
        m[:, :, 8:-8, 8:-8] = 1.0
        t["masks"] = m
    return t


def milestones_bench():
    """`python bench.py --all`: img/s/chip + achieved-TFLOPs/MFU for the
    other four BASELINE.md milestone configs (VERDICT r3 missing #3) —
    NanoDet-Plus-320, UNet 512×1024, Mask R-CNN 800², MobileNetV2-224.
    FLOPs per train step come from XLA's own cost model on the lowered
    train program; MFU is vs the v5e nominal 197 bf16 TFLOP/s (the chip's
    measured sustained matmul envelope here is ~59 TFLOP/s through the
    axon relay — both ratios are printed)."""
    import jax
    import numpy as np

    from cvpytorch_tpu.config import CommonConfiguration
    from cvpytorch_tpu.optim.optimizers import build_optimizer
    from cvpytorch_tpu.optim.schedules import build_lr_scheduler
    from cvpytorch_tpu.parallel.mesh import create_mesh, shard_batch
    from cvpytorch_tpu.registry import MODELS
    import cvpytorch_tpu.models  # noqa: F401

    on_tpu = jax.default_backend() == "tpu"
    rng = np.random.RandomState(0)
    PEAK = 197e12  # v5e nominal bf16
    MEASURED_ENVELOPE = 59e12

    def case_cls():
        B, HW = (256, 224) if on_tpu else (4, 64)
        model = MODELS.get("Classification")(
            dictionary=tuple({f"c{i}": 1.0} for i in range(10)),
            model_cfg=CommonConfiguration(
                {"BACKBONE": {"name": "MobileNetV2", "classifier": True}}))
        batch = {"image": (rng.rand(B, HW, HW, 3) * 255).astype(np.uint8),
                 "target": rng.randint(0, 10, (B,)).astype(np.int32)}
        return "mobilenetv2_224", model, batch, B

    def case_nanodet():
        B, HW = (128, 320) if on_tpu else (4, 64)
        model = MODELS.get("NanoDetPlus")(
            dictionary=tuple({f"c{i}": 1.0} for i in range(4)),
            model_cfg=CommonConfiguration({"TYPE": "nanodet_plus_m"}))
        batch = {"image": (rng.rand(B, HW, HW, 3) * 255).astype(np.uint8),
                 "target": _det_targets(rng, B, 16, HW)}
        return "nanodetplus_320", model, batch, B

    def case_unet():
        B, (H, W) = (8, (512, 1024)) if on_tpu else (2, (32, 64))
        model = MODELS.get("UNet")(
            dictionary=({"bg": 1.0}, {"fg": 1.0}, {"c2": 1.0}))
        batch = {"image": (rng.rand(B, H, W, 3) * 255).astype(np.uint8),
                 "target": rng.randint(0, 3, (B, H, W)).astype(np.int32)}
        return "unet_512x1024", model, batch, B

    def case_maskrcnn():
        B, HW = (8, 800) if on_tpu else (1, 96)
        model = MODELS.get("MaskRCNN")(
            dictionary=tuple({f"c{i}": 1.0} for i in range(4)))
        batch = {"image": (rng.rand(B, HW, HW, 3) * 255).astype(np.uint8),
                 "target": _det_targets(rng, B, 16, HW, with_masks=True)}
        return "maskrcnn_800", model, batch, B

    from cvpytorch_tpu.train_state import create_train_state, make_train_step

    import os as _os

    skip = set((_os.environ.get("BENCH_SKIP") or "").split(","))
    mesh = create_mesh()
    results = {}
    for case in (case_cls, case_nanodet, case_unet, case_maskrcnn):
        name, model, batch, B = case()
        if name in skip:
            continue
        tcfg = CommonConfiguration({
            "INIT_LR": 0.01, "N_MAX_EPOCHS": 300,
            "OPTIMIZER": {"TYPE": "SGD", "MOMENTUM": 0.9},
            "LR_SCHEDULER": {"TYPE": "CosineAnnealingLR"},
        })
        tx = build_optimizer(tcfg, build_lr_scheduler(tcfg, 100))
        state = create_train_state(model, tx, jax.random.PRNGKey(0), batch,
                                   use_ema=False)
        train_step = make_train_step(amp=True)
        sb = shard_batch(mesh, batch)
        flops = None
        try:
            cost = train_step.lower(state, sb).compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0] if cost else {}
            flops = float(cost.get("flops", 0.0)) or None
        except Exception:
            pass
        import time as _t

        for _ in range(2):
            state, metrics = train_step(state, sb)
            float(metrics["loss"])
        steps = 10 if on_tpu else 2
        t0 = _t.perf_counter()
        for _ in range(steps):
            state, metrics = train_step(state, sb)
        float(metrics["loss"])
        dt = _t.perf_counter() - t0
        ips = steps * B / dt
        row = {"images_per_sec_per_chip": round(ips, 2), "batch_size": B}
        if flops:
            achieved = flops * steps / dt
            row["tflops_per_sec"] = round(achieved / 1e12, 2)
            row["mfu_vs_197T_nominal"] = round(achieved / PEAK, 3)
            row["vs_59T_measured_envelope"] = round(
                achieved / MEASURED_ENVELOPE, 3)
        results[name] = row
        print(json.dumps({"milestone": name, **row}), flush=True)
    print(json.dumps({"metric": "milestones", **results}))
    return results


def pipeline_bench():
    """`python bench.py --pipeline`: host input-pipeline throughput —
    real JPEG decode + letterbox/mosaic transforms + padded collate
    through the threaded DataLoader, no device work.  Proves the loader
    can out-feed the ~800 img/s train step (BASELINE.md input-pipeline
    sufficiency; reference pipeline is torch DataLoader + cv2)."""
    import os

    from cvpytorch_tpu.config import CommonConfiguration
    from cvpytorch_tpu.data.datasets.coco import CocoDetection
    from cvpytorch_tpu.data.loader import DataLoader
    from cvpytorch_tpu.data.transforms import build_transforms
    from cvpytorch_tpu.data.transforms.det_transforms import make_det_collate

    tmp, ann_file = _synthetic_coco_on_disk()

    def run_loader(ds, collate, B=32, epochs=2):
        loader = DataLoader(ds, batch_size=B, shuffle=True, num_workers=8,
                            collate_fn=collate, drop_last=True)
        for _ in loader:  # warm epoch: caches + thread spin-up
            pass
        t0 = time.perf_counter()
        n = 0
        for _ in range(epochs):
            for batch in loader:
                n += len(batch["image"])
        return n / (time.perf_counter() - t0)

    # production path: RAM-cached decode, half-res uint8 tiles on host,
    # mosaic/affine/HSV/flip/normalize in-graph (DEVICE_AUG)
    cfg = CommonConfiguration({"IMG_DIR": tmp, "ANN_FILE": ann_file,
                               "LOAD_NUM": 4, "CACHE": True})
    ds = CocoDetection(data_cfg=cfg, dictionary=[{"thing": 1.0}],
                       stage="train")
    ds.transform = None
    from cvpytorch_tpu.data.transforms.det_transforms import \
        make_device_aug_collate

    dev_ips = run_loader(ds, make_device_aug_collate(16, 320), B=8)

    # classic host path: per-sample mosaic + affine + HSV + f32 normalize
    cfg2 = CommonConfiguration({"IMG_DIR": tmp, "ANN_FILE": ann_file,
                                "LOAD_NUM": 4, "CACHE": True})
    ds2 = CocoDetection(data_cfg=cfg2, dictionary=[{"thing": 1.0}],
                        stage="train")
    ds2.transform = build_transforms("DET_CLASSES", {
        "RandomAffineWithMosaic": {"degrees": 0.0, "translate": 0.1,
                                   "scale": 0.5, "size": [640, 640]},
        "RandomHorizontalFlip": {"p": 0.5},
        "ColorHSV": {"hue": 0.015, "saturation": 0.7, "value": 0.4},
        "Resize": {"size": [640, 640], "keep_ratio": True},
        "ToTensor": {},
        "Normalize": {"mean": [0, 0, 0], "std": [1, 1, 1]},
    }, "train")
    host_ips = run_loader(ds2, make_det_collate(64), B=32, epochs=1)

    cores = os.cpu_count() or 1
    print(json.dumps({
        "metric": "input_pipeline_images_per_sec",
        "value": round(dev_ips, 2),
        "unit": f"images/sec on {cores} host core(s) "
                "(DEVICE_AUG path: cached decode + uint8 half-res tiles; "
                "aug runs in-graph)",
        "vs_baseline": round(dev_ips / max(host_ips, 1e-9), 2),
        "host_aug_path_ips": round(host_ips, 2),
    }))


if __name__ == "__main__":
    import sys

    if "--pipeline" in sys.argv:
        pipeline_bench()
    elif "--all" in sys.argv:
        milestones_bench()
    elif "--e2e" in sys.argv:
        print(json.dumps({"metric": "e2e_fed_train_images_per_sec",
                          **e2e_bench()}))
    else:
        main()
