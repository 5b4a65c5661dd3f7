"""LFD / AIRDet / GiraffeDet e2e smoke: train loss decreases, val path
yields padded detections (VERDICT r1 #5)."""
import numpy as np
import jax
import pytest

from cvpytorch_tpu.config import CommonConfiguration
from cvpytorch_tpu.optim.optimizers import build_optimizer
from cvpytorch_tpu.optim.schedules import build_lr_scheduler
from cvpytorch_tpu.registry import MODELS
from cvpytorch_tpu.train_state import (
    create_train_state, make_eval_step, make_train_step,
)

import cvpytorch_tpu.models  # noqa: F401 — registers the zoo


def _batch(rs, B=2, hw=128, M=8):
    boxes = np.zeros((B, M, 4), np.float32)
    boxes[:, 0] = [10, 10, 60, 60]
    boxes[:, 1] = [70, 30, 120, 90]
    valid = np.zeros((B, M), bool)
    valid[:, :2] = True
    return {
        "image": rs.rand(B, hw, hw, 3).astype(np.float32),
        "target": {
            "boxes": boxes,
            "labels": np.array([[0, 2] + [0] * (M - 2)] * B, np.int32),
            "valid": valid,
            "pads": np.zeros((B, 2), np.float32),
            "scales": np.ones((B, 2), np.float32),
            "height": np.full((B,), hw, np.int32),
            "width": np.full((B,), hw, np.int32),
        },
    }


CASES = [
    ("LFD", {"TYPE": "lfd_s",
             "BACKBONE": {"name": "LFDResNet", "subtype": "lfd_xs"},
             "NECK": {"name": "LFDNeck", "out_channels": 64}}),
    ("AIRDet", {"TYPE": "airdet_nano"}),
    ("GiraffeDet", {"TYPE": "giraffedet_s"}),
]


@pytest.mark.parametrize("name,mcfg", CASES, ids=[c[0] for c in CASES])
def test_detector_e2e(name, mcfg):
    rs = np.random.RandomState(0)
    batch = _batch(rs)
    dictionary = tuple({f"c{i}": 1.0} for i in range(4))
    model = MODELS.get(name)(dictionary=dictionary,
                             model_cfg=CommonConfiguration(mcfg))
    cfg = CommonConfiguration({
        "INIT_LR": 0.01, "N_MAX_EPOCHS": 1,
        "OPTIMIZER": {"TYPE": "SGD", "MOMENTUM": 0.9},
        "LR_SCHEDULER": {"TYPE": "CosineAnnealingLR"},
        "GRAD_CLIP": {"TYPE": "norm", "VALUE": 10.0},
    })
    # horizon ≫ the 150 overfit steps so cosine keeps the lr alive
    tx = build_optimizer(cfg, build_lr_scheduler(cfg, 1000))
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    step = make_train_step(amp=False, donate=False)
    losses = []
    for _ in range(12):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all(), losses
    # GFLv2-style losses first RISE as the quality weights (max cls prob)
    # grow from the 0.01 prior, then optimize down — assert the descent
    # from the peak rather than strict monotonicity from step 0
    assert losses[-1] < max(losses), losses
    assert min(losses[6:]) < max(losses[:6]) or losses[-1] < losses[0], losses

    ev = make_eval_step()
    loss_dict, preds = ev(state, batch)
    assert np.isfinite(float(loss_dict["loss"]))
    assert preds["boxes"].shape[0] == 2
    assert preds["boxes"].shape[-1] == 4
    assert "scores" in preds and "valid" in preds

    # decode/NMS → COCO mAP round-trip (VERDICT r2 weak #4): overfit the
    # fixed 2-box scene, then the val path must localize it
    from cvpytorch_tpu.evaluator.coco import CocoEvaluator

    for _ in range(138):                     # 12 + 138 = 150 steps
        state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
    _, preds = ev(state, batch)

    class _DS:
        id2name = {}

    evaluator = CocoEvaluator(_DS(), num_classes=4)
    evaluator.update(batch["target"], jax.device_get(preds))
    stats = evaluator.evaluate()
    assert stats["AP50"] >= 0.3, stats
