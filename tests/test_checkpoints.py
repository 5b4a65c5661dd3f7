"""Checkpoint save → restore → continue-training round trip.

Guards the restore_into container-type bug: a structure-free orbax
restore turns optax namedtuple opt_states into dicts, which crashes the
first tx.update after resume (reference resume semantics:
src/utils/checkpoints.py:43-51).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import flax.linen as nn

from cvpytorch_tpu.config import CommonConfiguration
from cvpytorch_tpu.optim.optimizers import build_optimizer
from cvpytorch_tpu.optim.schedules import build_lr_scheduler
from cvpytorch_tpu.train_state import (
    create_train_state, make_train_step,
)
from cvpytorch_tpu.utils.checkpoints import Checkpoints


class TinyModel(nn.Module):
    @nn.compact
    def __call__(self, images, targets=None, mode="train"):
        x = nn.Conv(8, (3, 3))(images)
        x = nn.BatchNorm(use_running_average=(mode != "train"),
                         momentum=0.97)(x)
        x = nn.relu(x).mean(axis=(1, 2))
        logits = nn.Dense(4)(x)
        if mode == "infer":
            return {"logits": logits}
        labels = targets["labels"]
        loss = -jax.nn.log_softmax(logits)[jnp.arange(labels.shape[0]), labels]
        loss = loss.mean()
        if mode == "train":
            return loss, {"ce": loss}
        return {"ce": loss}, {"logits": logits}


def _batch(rs):
    return {
        "image": rs.rand(4, 16, 16, 3).astype(np.float32),
        "target": {"labels": rs.randint(0, 4, (4,)).astype(np.int32)},
    }


@pytest.mark.parametrize("opt_type", ["SGD", "AdamW"])
def test_save_restore_train_roundtrip(tmp_path, opt_type):
    rs = np.random.RandomState(0)
    batch = _batch(rs)
    cfg = CommonConfiguration({
        "INIT_LR": 0.01, "N_MAX_EPOCHS": 2,
        "OPTIMIZER": {"TYPE": opt_type, "MOMENTUM": 0.9,
                      "WEIGHT_PARAMS": {"weight_decay": 5e-4}},
        "LR_SCHEDULER": {"TYPE": "CosineAnnealingLR"},
    })
    tx = build_optimizer(cfg, build_lr_scheduler(cfg, 4))
    state = create_train_state(TinyModel(), tx, jax.random.PRNGKey(0),
                               batch, use_ema=True)
    step = make_train_step(amp=False, ema_decay=0.999, donate=False)
    state, _ = step(state, batch)
    state, m0 = step(state, batch)

    ckpts = Checkpoints(str(tmp_path), "exp", "tiny", timestamp="t")
    ckpts.autosave_checkpoint(state, epoch=1, is_best=True,
                              extra={"performance": 0.5})

    # fresh state (different rng) + restore
    fresh = create_train_state(TinyModel(), tx, jax.random.PRNGKey(1),
                               batch, use_ema=True)
    restored = Checkpoints.restore_into(
        fresh, f"{ckpts.save_dir}/last")

    assert int(restored.step) == int(state.step)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        restored.params, state.params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        restored.ema_params, state.ema_params)
    # opt_state must round-trip with container types intact
    assert jax.tree_util.tree_structure(restored.opt_state) == \
        jax.tree_util.tree_structure(state.opt_state)

    # the real regression check: training continues after resume
    restored, m1 = step(restored, batch)
    assert np.isfinite(float(m1["loss"]))

    # weights-only deploy load
    loaded = Checkpoints.load_weights_into(fresh, f"{ckpts.save_dir}/deploy")
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        loaded.params, state.ema_params)


def test_async_save_restore_roundtrip(tmp_path):
    """async_save=True: fetch+write on a daemon thread; wait() then
    restore must reproduce the exact state (overlapped-epoch save)."""
    rs = np.random.RandomState(1)
    batch = _batch(rs)
    cfg = CommonConfiguration({
        "INIT_LR": 0.01, "N_MAX_EPOCHS": 2,
        "OPTIMIZER": {"TYPE": "SGD", "MOMENTUM": 0.9},
        "LR_SCHEDULER": {"TYPE": "CosineAnnealingLR"},
    })
    tx = build_optimizer(cfg, build_lr_scheduler(cfg, 4))
    state = create_train_state(TinyModel(), tx, jax.random.PRNGKey(0),
                               batch, use_ema=True)
    step = make_train_step(amp=False, ema_decay=0.9)
    state, _ = step(state, batch)
    ck = Checkpoints(str(tmp_path), "async", "tiny", async_save=True)
    expect_params = [np.asarray(x)
                     for x in jax.tree_util.tree_leaves(state.params)]
    expect_step = int(state.step)
    ck.autosave_checkpoint(state, epoch=0, is_best=True)
    # the next step DONATES state's buffers while the save is in flight —
    # the snapshot inside Checkpoints must keep the save immune to that
    state2, _ = step(state, batch)
    ck.wait()
    restored = Checkpoints.restore_into(state2, f"{ck.save_dir}/last")
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    expect_params):
        np.testing.assert_array_equal(np.asarray(a), b)
    assert int(restored.step) == expect_step
    # and training continues after resume (opt_state containers intact)
    state3, metrics = step(restored, batch)
    assert np.isfinite(float(metrics["loss"]))
    import os

    assert os.path.isdir(f"{ck.save_dir}/best")
    assert os.path.isdir(f"{ck.save_dir}/deploy")
