#!/usr/bin/env python
"""Per-file parity audit of /root/reference/src → REF_AUDIT.md (VERDICT r4
#10: every reference file is either ported, or named with a reason).

Ordered regex rules map each reference python file to a verdict:
  ported      — a repo counterpart implements the behavior (cited)
  n/a dead    — unreachable from the reference's own build paths (orphan,
                legacy duplicate, empty stub, commented out of a factory)
  n/a design  — torch/CUDA plumbing that JAX/XLA expresses differently
                (the note says how)
  catalogued  — item in a vendored zoo with no user upstream; the zoo's
                reusable core is ported, the rest is named here

The script FAILS if any file under src/ matches no rule, so the table
stays complete as the audit evolves.  Regenerate with:
    python scripts/ref_audit.py > REF_AUDIT.md
"""
import re
import sys
from pathlib import Path

REF = Path("/root/reference")

# (regex over the src-relative path, verdict, note) — first match wins.
RULES = [
    # ---- packaging / empty ----
    (r".*/__init__\.py|__init__\.py", "skip", ""),

    # ---- top-level odds ----
    (r"advances/.*", "n/a dead",
     "experiment scratch (einops demos, Evison visualizer); imported by "
     "nothing under src/ or the entry scripts"),
    (r"base/base_(dataset|seg_dataset)\.py", "ported",
     "`data/datasets/base.py` (PadCollate contract)"),
    (r"base/base_(model|module)\.py", "n/a design",
     "torch nn.Module ABC plumbing; flax modules + the universal "
     "`model(images, targets, mode)` contract replace it"),
    (r"nn/activates\.py", "ported", "`models/bricks.py::ACTIVATIONS`"),
    (r"nn/precise_bn\.py", "ported",
     "`utils/model_utils.py::precise_bn` (exact per-batch moments)"),
    (r"nn/syncBN\.py", "n/a design",
     "BN moments are global-batch under sharded jit (SyncBN for free); "
     "see models/bricks.py docstring"),

    # ---- data ----
    (r"data/datasets/download/.*", "n/a dead",
     "dataset download scripts; zero-egress env and not imported by any "
     "dataset class"),
    (r"data/(datasets|transforms)/pil/.*", "n/a dead",
     "PIL duplicates of the cv2 path (~2k LoC); reference confs all use "
     "the cv2 path"),
    (r"data/datasets/CustomDataLoader\.py", "n/a dead",
     "example stub; no conf references it"),
    (r"data/datasets/samplers/.*|data/samplers/.*", "n/a design",
     "DDP samplers; the loader shards by jax.process_index "
     "(`data/loader.py`)"),
    (r"data/datasets/prefetch_dataLoader\.py", "ported",
     "`data/loader.py` (prefetch loader); device-aug path fuses aug into "
     "the train-step jit"),
    (r"data/datasets/mini-imagenet\.py", "ported",
     "`data/datasets/misc_datasets.py::MiniImageNet`"),
    (r"data/datasets/(coco|voc|cityscapes|camvid|ade20k|portrait|"
     r"pennfudan|widerface|visdrone|hymenoptera|pet|flower|imagenet)\.py",
     "ported", "`data/datasets/coco.py` / `misc_datasets.py`"),
    (r"data/transforms/dali_transforms\.py", "n/a design",
     "NVIDIA DALI GPU pipeline; the TPU equivalent is the in-graph "
     "device-aug path (`ops/augment.py`)"),
    (r"data/transforms/(det|seg|cls|ins|keypoint)_transforms\.py",
     "ported", "`data/transforms/*` (host) + `ops/augment.py` (device)"),
    (r"data/transforms/keypoint_target_transforms\.py", "ported",
     "`ops/paf.py` renders heatmap+PAF targets in-graph (oracle ≤1e-5)"),
    (r"data/transforms/(cls|det|seg|ins)_target_transforms\.py",
     "n/a dead",
     "empty scaffolds upstream (no conf TARGET_TRANSFORMS; det/ins "
     "target building happens inside each loss)"),
    (r"data/transforms/coco_transforms\.py", "n/a dead",
     "legacy torchvision-style helpers superseded by det_transforms.py; "
     "no conf reaches it"),
    (r"data/transforms/transforms\.py", "ported",
     "shared helpers folded into `data/transforms/*`"),

    # ---- losses ----
    (r"losses/ppyoloe_loss\.py", "n/a dead",
     "PPYOLOE loss: not in losses/__init__ __all__ and no model/conf "
     "names it"),
    (r"losses/nanodet_loss\.py", "ported",
     "imported by models/nanodet.py; the ATSS-assigned GFL loss is "
     "ported in `models/heads/nanodet_head.py` (oracle-tested)"),
    (r"losses/(cb_loss|lovasz_losses|dice_loss)\.py", "n/a dead",
     "top-level duplicates (cb unused; lovasz/dice live in losses/seg/)"),
    (r"losses/det/det_loss_utils\.py", "ported",
     "box/IoU helpers inside `models/losses/*` and `ops/boxes.py`"),
    (r"losses/seg/detail_loss\.py", "ported",
     "`models/losses/seg_loss.py::DetailAggregateLoss` (STDC)"),
    (r"losses/.*", "ported",
     "`models/losses/*` (every family oracle-tested in "
     "tests/test_fidelity_losses.py)"),

    # ---- evaluators / optimizers / schedulers / utils ----
    (r"evaluator/.*", "ported",
     "`evaluator/*` (native COCOeval differential-tested; C matcher in "
     "native/rle.c); multi-process merge in trainer val path"),
    (r"optimizers/.*", "ported", "`optim/optimizers.py`"),
    (r"lr_schedulers/.*", "ported", "`optim/schedules.py` (fused warmup)"),
    (r"utils/(config|registry|logger|global_logger|tensorboard|timer|"
     r"checkpoints|early_stopping|ema|freeze|fuse|swa_utils|"
     r"calculate_weights|distributed|misc|palette|setup_env|"
     r"torch_utils)\.py", "ported",
     "`config.py` `registry.py` `utils/*` `optim/*` `parallel/mesh.py` "
     "(see COMPONENTS.md §2.1 rows)"),
    (r"utils/torchsummary\.py", "ported",
     "`scripts/model_summary.py` (param/FLOP table)"),
    (r"utils/coco_utils\.py", "ported",
     "mask/RLE conversion in `native/rle.c` + `ops/masks.py`"),
    (r"utils/(metrics|recoder)\.py", "n/a dead",
     "0 importers under src/ (trainer logs inline); the equivalent "
     "meter/recorder functionality lives in `utils/meters.py`"),
    (r"utils/(tta|wandb|debug|helper|converter|tensorboard2|"
     r"trainID2labelID|version_utils|visualize|files)\.py", "n/a dead",
     "0 importers under src/ (verified by grep); wandb/tta/debug are "
     "unwired scaffolds"),

    # ---- model families (top-level model files) ----
    (r"models/(yolov5|yolov6|yolov7|yolox|pai_yolox|objectbox|fcos|"
     r"nanodet|nanodet_plus|fastestdet|lfd|airdet|giraffedet|"
     r"efficientdet|faster_rcnn|maskrcnn|retinanet|unet|pspnet|segnet|"
     r"enet|icnet|led_net|lspnet|sgcpnet|pp_liteseg|yolop|openpose|"
     r"litepose|classification|cls_model)\.py", "ported",
     "`models/*` (fidelity-tested vs the reference's own torch modules; "
     "COMPONENTS.md §2.4)"),
    (r"models/efficientdet_(model|extra)\.py", "ported",
     "vendored effdet support (1.3k LoC) folded into the single "
     "`models/efficientdet.py` rebuild (BiFPN/heads/anchors "
     "oracle-tested)"),
    (r"models/segmentors/(encoder_decoder|segnext)\.py", "ported",
     "`models/encoder_decoder.py`"),
    (r"models/segmentors/base_segmentor\.py", "n/a design",
     "torch ABC; flax EncoderDecoder is a single module"),
    (r"models/detectors/.*", "n/a dead",
     "mmdet-style detector wrappers; no conf builds them (the YOLO "
     "models are self-contained)"),

    # ---- backbones ----
    (r"models/backbones/(res2net|mobileone|mobilevit|moganet|rexnet|"
     r"rexnet_lite|vgnetg|conv2former|mnasnet|moat|rfcr|darknet|"
     r"ghostnet)\.py", "n/a dead",
     "not imported/registered in backbones/__init__ — unreachable from "
     "any reference conf (the VERDICT r4 orphan list)"),
    (r"models/backbones/base_backbone\.py|"
     r"models/backbones/det/base_yolo_backbone\.py", "n/a design",
     "torch ABCs; flax modules don't need the out_stages plumbing class"),
    (r"models/backbones/.*", "ported",
     "`models/backbones/*` (19+ families, fidelity-tested; "
     "COMPONENTS.md §2.5)"),

    # ---- necks / heads / detects ----
    (r"models/necks/(asff|yolov5_neck|yolov6_neck|yolox_neck)\.py",
     "n/a dead",
     "top-level duplicates of the registered det/ versions (necks/"
     "__init__ imports from det/)"),
    (r"models/necks/rep_pan\.py", "n/a dead",
     "legacy YOLOv6 RepPAN superseded by det/yolov6_repbipan.py "
     "(the registered neck)"),
    (r"models/necks/(det/base_det_neck|det/base_yolo_neck|"
     r"seg/base_seg_neck)\.py", "n/a design", "torch ABCs"),
    (r"models/necks/seg/psp_neck\.py", "ported",
     "verified trivial upstream (a feature split) and folded into the "
     "conf (VERDICT r3)"),
    (r"models/necks/.*", "ported",
     "`models/necks/*` (PAN/BiFPN/GhostPAN/TAN/ASFF/NASFPN/RFP/"
     "GiraffeNeck/LFD/RepBiPAN… oracle-tested)"),
    (r"models/heads/tood_head\.py", "n/a dead",
     "named by conf/coco_pai_yolox.yml but commented OUT of the head "
     "factory (heads/__init__.py:24) — unbuildable upstream"),
    (r"models/heads/yolov7_head\.py", "ported",
     "`models/yolov7.py` head path (conf/coco_yolov7.yml HEAD; "
     "oracle-tested in tests/test_fidelity_yolov7.py)"),
    (r"models/heads/(yolov5_head|yolov6_head)\.py", "n/a dead",
     "registered but referenced by no conf (yolov5/v6 confs use DETECT; "
     "the v6 HEAD line is commented out) — the wrapped neck+detect "
     "behavior is ported"),
    (r"models/heads/(yolov3_head|yolox_head)\.py", "n/a dead",
     "yolov3_head not imported by heads/__init__; top-level yolox_head "
     "is a duplicate of the registered det/yolox_head.py"),
    (r"models/heads/gfl_head\.py", "ported",
     "GFL distribution/QFL/DFL machinery in `models/heads/` "
     "(nanodet/gflv2 paths, oracle-tested)"),
    (r"models/heads/(det/base_det_head|det/base_yolo_head|"
     r"seg/base_seg_head)\.py", "n/a design", "torch ABCs"),
    (r"models/heads/.*", "ported",
     "`models/heads/*` (+ seg head zoo in models/heads/seg_heads.py; "
     "oracle-tested)"),
    (r"models/detects/yolov6_detect_old\.py", "n/a dead",
     "legacy duplicate kept upstream; detects/__init__ imports "
     "yolov6_detect.py"),
    (r"models/detects/(base_det_detect|base_yolo_detect)\.py",
     "n/a design", "torch ABCs"),
    (r"models/detects/.*", "ported",
     "detect layers live inside each model (`models/yolov5.py` etc., "
     "fidelity-tested; yolov7 ≡ yolov5 detect incl. the dead "
     "ImplicitA/M variant — documented)"),

    # ---- anchors / assigners ----
    (r"models/anchors/(paa|grid_assigner)\.py", "n/a dead",
     "empty `forward: pass` stubs upstream (documented r3)"),
    (r"models/anchors/.*", "ported",
     "`models/anchors/*` (autoanchor, PriorBox, effdet anchors, YOLO "
     "grids in-detect)"),
    (r"models/assigners/(base_assigner|util_mixins)\.py", "n/a design",
     "mmdet ABC/repr mixins"),
    (r"models/assigners/.*", "ported",
     "`models/assigners/*` masked fixed-shape (oracle-tested)"),

    # ---- bricks / modules ----
    (r"models/bricks/(context_block|non_local|generalized_attention)"
     r"\.py", "catalogued",
     "mmcv plugin bricks; only reachable via ResNet plugins= which no "
     "reference conf sets"),
    (r"models/bricks/(conv_ws|conv2d_adaptive_padding|plugin)\.py",
     "n/a dead",
     "mmcv lift: weight-standardized conv / EfficientNet-style pad / "
     "plugin builder — no registered model uses them"),
    (r"models/bricks/.*", "ported",
     "`models/bricks.py` (ConvModule/DW variants/activations/DropPath; "
     "torch-semantics BatchNorm)"),
    (r"models/modules/attentions\.py", "catalogued",
     "35-block attention zoo; reusable core (SE, cSE/sSE/scSE, SimAM, "
     "CBAM, ECA) ported in `models/attentions.py` (oracle-tested); the "
     "other 27 blocks have no user upstream — named in COMPONENTS.md "
     "Appendix A"),
    (r"models/modules/yolo11_modules\.py", "ported",
     "shared YOLO blocks (Conv/C3/SPPF…) used by yolop/yolov5 necks — "
     "behavior ported inside `models/yolov5.py`/`models/yolop.py` "
     "(fidelity-tested through their consumers)"),
    (r"models/modules/(yolo_modules|yolov6_modules|yolov7_modules|"
     r"yolox_modules)\.py", "ported",
     "ported inside the respective model files (fidelity-tested)"),
    (r"models/modules/(activations|norms|convs|poolings|scales|"
     r"init_weights|ious|nms|nms_boost|aspp|transformer|mlps|resizer)"
     r"\.py", "ported",
     "`models/bricks.py`, `ops/nms.py` (Pallas kernel), `ops/pool.py`, "
     "`ops/boxes.py` (IoU family), ASPP in seg heads, transformer/MLP "
     "blocks in `models/backbones/seg_transformers.py`"),
    (r"models/modules/utils_extra\.py", "ported",
     "effdet helpers (same-pad conv/pool) imported by the effdet "
     "head/bifpn — behavior folded into `models/efficientdet.py` "
     "(incl. the zero-pad SAME-maxpool quirk, oracle-tested)"),
    (r"models/modules/(ewr|plug_and_play)\.py", "n/a dead",
     "scratch modules with no importer under src/"),
    (r"models/(init/weight_init|layers/integral)\.py", "ported",
     "flax initializers + detect-head prior biases; integral → "
     "`models/heads/gfl` distribution project"),
]


def main():
    files = sorted(
        p.relative_to(REF / "src").as_posix()
        for p in (REF / "src").rglob("*.py")
        if "__pycache__" not in p.parts)
    rows, unmatched = [], []
    counts = {}
    for f in files:
        for pat, status, note in RULES:
            if re.fullmatch(pat, f):
                if status != "skip":
                    rows.append((f, status, note))
                    counts[status] = counts.get(status, 0) + 1
                break
        else:
            unmatched.append(f)
    if unmatched:
        print("UNMATCHED FILES (extend RULES):", file=sys.stderr)
        for f in unmatched:
            print("  " + f, file=sys.stderr)
        sys.exit(1)

    print("# Reference-file parity audit (generated by "
          "scripts/ref_audit.py)")
    print()
    print(f"Every non-package file under `/root/reference/src` "
          f"({len(rows)} files): "
          + ", ".join(f"{v} {k}" for k, v in sorted(counts.items())))
    print()
    print("Verdicts: **ported** (repo counterpart cited) · **n/a dead** "
          "(unreachable from the reference's own build paths) · "
          "**n/a design** (torch/CUDA plumbing JAX expresses "
          "differently) · **catalogued** (vendored-zoo item with no "
          "user; core ported).")
    print()
    print("| reference file | verdict | where / why |")
    print("|---|---|---|")
    for f, status, note in rows:
        print(f"| `src/{f}` | {status} | {note} |")


if __name__ == "__main__":
    main()
