"""Inference CLI (reference: infer.py:105-148).

``python -m cvpytorch_tpu.infer --setting conf/X.yml --checkpoint path
[--out out_dir]`` — loads cfg + dictionary + dataset(stage='infer') +
model, runs the jitted predict step over the loader, and writes results:
segmentation → palette PNG masks (reference infer.py:29-49,143-148),
classification → a csv of predictions, detection → a json of boxes.
"""
from __future__ import annotations

import argparse
import json
import os

import jax
import numpy as np

from .config import CommonConfiguration, load_dictionary
from .data.loader import DataLoader
from .data.transforms import build_transforms
from .registry import DATASETS, MODELS
from .train_state import create_train_state, make_predict_step
from .utils.checkpoints import Checkpoints
from .utils.logger import setup_logger

# Cityscapes-style palette (reference: infer.py:29-49)
CITYSCAPES_PALETTE = [
    128, 64, 128, 244, 35, 232, 70, 70, 70, 102, 102, 156, 190, 153, 153,
    153, 153, 153, 250, 170, 30, 220, 220, 0, 107, 142, 35, 152, 251, 152,
    70, 130, 180, 220, 20, 60, 255, 0, 0, 0, 0, 142, 0, 0, 70, 0, 60, 100,
    0, 80, 100, 0, 0, 230, 119, 11, 32,
]


def save_seg_mask(pred: np.ndarray, path: str, palette=None):
    from PIL import Image

    img = Image.fromarray(pred.astype(np.uint8), mode="P")
    img.putpalette(palette or CITYSCAPES_PALETTE)
    img.save(path)


def main(argv=None):
    parser = argparse.ArgumentParser("cvpytorch_tpu infer")
    parser.add_argument("--setting", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--out", default="infer_out")
    args = parser.parse_args(argv)

    logger = setup_logger()
    cfg = CommonConfiguration.from_yaml(args.setting)
    dictionary = []
    if cfg.DATASET.DICTIONARY:
        _, dictionary = load_dictionary(cfg.DATASET.DICTIONARY,
                                       cfg.DATASET.DICTIONARY_NAME)
    dictionary_name = cfg.DATASET.DICTIONARY_NAME or "CLS_CLASSES"

    stage_cfg = cfg.DATASET.get("INFER") or cfg.DATASET.get("VAL")
    transform = build_transforms(dictionary_name,
                                 stage_cfg.get("TRANSFORMS"), "infer")
    ds = DATASETS.get(cfg.DATASET.CLASS)(
        data_cfg=stage_cfg, dictionary=dictionary, transform=transform,
        stage="infer",
    )
    loader = DataLoader(ds, batch_size=int(stage_cfg.get("BATCH_SIZE", 1)),
                        shuffle=False,
                        num_workers=int(stage_cfg.get("NUM_WORKER", 4) or 4))

    from . import models as _m  # noqa: F401 (registers)
    import dataclasses

    model_cls = MODELS.get(cfg.USE_MODEL.CLASS)
    extra = {}
    if dataclasses.is_dataclass(model_cls):
        fields = {f.name for f in dataclasses.fields(model_cls)}
        extra = {k: (tuple(v) if isinstance(v, list) else v)
                 for k, v in cfg.USE_MODEL.items()
                 if k in fields and k not in ("dictionary", "model_cfg")}
    model = model_cls(dictionary=tuple(dictionary),
                      model_cfg=cfg.USE_MODEL, **extra)

    first = next(iter(loader))
    import optax

    state = create_train_state(model, optax.sgd(0.0), jax.random.PRNGKey(0),
                               first, use_ema=False)
    state = Checkpoints.load_weights_into(state, args.checkpoint)
    predict = make_predict_step()

    os.makedirs(args.out, exist_ok=True)
    results = []
    idx = 0
    for batch in loader:
        preds = jax.device_get(predict(state, batch["image"]))
        if dictionary_name == "SEG_CLASSES":
            for p in preds:
                save_seg_mask(p, os.path.join(args.out, f"{idx:06d}.png"))
                idx += 1
        elif dictionary_name in ("DET_CLASSES", "INS_CLASSES"):
            for i in range(len(batch["image"])):
                v = preds["valid"][i]
                results.append({
                    "boxes": preds["boxes"][i][v].tolist(),
                    "scores": preds["scores"][i][v].tolist(),
                    "labels": preds["labels"][i][v].tolist(),
                })
                idx += 1
        else:
            results.extend(np.asarray(preds).reshape(-1).tolist())
            idx += len(batch["image"])
    if results:
        with open(os.path.join(args.out, "predictions.json"), "w") as f:
            json.dump(results, f)
    logger.info("wrote %d predictions to %s", idx, args.out)


if __name__ == "__main__":
    main()
