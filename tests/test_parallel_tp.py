"""Tensor-parallel (model-axis) sharding on the 8-device virtual mesh.

Beyond the reference's DDP (SURVEY §2.10): weights are width-sharded over
the ``model`` axis via `parallel/mesh.tp_shardings`; GSPMD inserts the
collectives.  dp×tp must reproduce the pure-DP loss bit-for-bit-ish —
same math, different layout.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvpytorch_tpu.config import CommonConfiguration
from cvpytorch_tpu.models.yolov5 import YOLOv5
from cvpytorch_tpu.optim.optimizers import build_optimizer
from cvpytorch_tpu.optim.schedules import build_lr_scheduler
from cvpytorch_tpu.parallel.mesh import (
    MODEL_AXIS,
    create_mesh,
    shard_batch,
    shard_train_state,
    tp_shardings,
)
from cvpytorch_tpu.train_state import create_train_state, make_train_step


def test_tp_sharding_rule():
    mesh = create_mesh(data=4, model=2)
    tree = {
        "conv": {"kernel": jnp.zeros((3, 3, 32, 64)),
                 "bias": jnp.zeros((64,))},
        "dense": {"kernel": jnp.zeros((256, 128))},
        "tiny": jnp.zeros((4, 6)),           # too small → replicated
        "odd": jnp.zeros((8, 8, 9)),         # 9 % 2 → replicated
    }
    specs = tp_shardings(tree, mesh)
    assert specs["conv"]["kernel"].spec == jax.sharding.PartitionSpec(
        None, None, None, MODEL_AXIS)
    assert specs["conv"]["bias"].spec == jax.sharding.PartitionSpec()
    assert specs["dense"]["kernel"].spec == jax.sharding.PartitionSpec(
        None, MODEL_AXIS)
    assert specs["tiny"].spec == jax.sharding.PartitionSpec()
    assert specs["odd"].spec == jax.sharding.PartitionSpec()


def _batch(B=8, hw=64, M=8):
    boxes = np.zeros((B, M, 4), np.float32)
    boxes[:, 0] = [10, 10, 40, 40]
    valid = np.zeros((B, M), bool)
    valid[:, 0] = True
    return {
        "image": np.random.RandomState(0).rand(B, hw, hw, 3).astype(
            np.float32),
        "target": {
            "boxes": boxes, "labels": np.zeros((B, M), np.int32),
            "valid": valid,
            "pads": np.zeros((B, 2), np.float32),
            "scales": np.ones((B, 2), np.float32),
            "height": np.full((B,), hw, np.int32),
            "width": np.full((B,), hw, np.int32),
        },
    }


def test_dp_tp_train_step_matches_dp():
    dictionary = tuple({f"c{i}": 1.0} for i in range(4))
    cfg = CommonConfiguration({
        "TYPE": "yolov5_n",
        "LOSS": {"name": "YOLOv5Loss"},
    })
    tcfg = CommonConfiguration({
        "INIT_LR": 0.01, "N_MAX_EPOCHS": 1,
        "OPTIMIZER": {"TYPE": "SGD", "MOMENTUM": 0.9},
        "LR_SCHEDULER": {"TYPE": "CosineAnnealingLR"},
    })
    batch = _batch()
    losses = {}
    for tp in (1, 2):
        model = YOLOv5(dictionary=dictionary, model_cfg=cfg)
        tx = build_optimizer(tcfg, build_lr_scheduler(tcfg, 10))
        state = create_train_state(model, tx, jax.random.PRNGKey(0), batch,
                                   use_ema=False)
        mesh = create_mesh(model=tp)
        if tp > 1:
            state = shard_train_state(state, mesh)
            n_sharded = sum(
                1 for s in jax.tree_util.tree_leaves(
                    tp_shardings(state.params, mesh))
                if s.spec != jax.sharding.PartitionSpec())
            assert n_sharded > 10  # the rule actually bites
        step = make_train_step(amp=False, ema_decay=0.0)
        sb = shard_batch(mesh, batch)
        state, metrics = step(state, sb)
        state, metrics = step(state, sb)
        losses[tp] = float(metrics["loss"])
    assert np.isfinite(losses[1]) and np.isfinite(losses[2])
    np.testing.assert_allclose(losses[2], losses[1], rtol=2e-4)
