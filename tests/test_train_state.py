"""End-to-end substrate test: tiny conv model under the universal forward
contract, trained on an 8-device CPU mesh — validates sharded jit,
cross-replica BN-free path, EMA, schedules, optimizer groups."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from cvpytorch_tpu.config import CommonConfiguration
from cvpytorch_tpu.optim.optimizers import build_optimizer
from cvpytorch_tpu.optim.schedules import build_lr_scheduler
from cvpytorch_tpu.parallel.mesh import shard_batch
from cvpytorch_tpu.train_state import (
    create_train_state,
    make_eval_step,
    make_train_step,
)


class TinyModel(nn.Module):
    num_classes: int = 4

    @nn.compact
    def __call__(self, images, targets=None, mode="infer"):
        x = nn.Conv(8, (3, 3), padding="SAME", name="conv")(images)
        x = nn.BatchNorm(use_running_average=(mode != "train"), name="bn")(x)
        x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))
        logits = nn.Dense(self.num_classes, name="fc")(x)
        if mode == "infer":
            return jnp.argmax(logits, -1)
        onehot = jax.nn.one_hot(targets, self.num_classes)
        loss = optax.softmax_cross_entropy(logits, onehot).mean()
        if mode == "train":
            return loss, {"ce_loss": loss}
        return {"ce_loss": loss}, jnp.argmax(logits, -1)


def _make_cfg():
    return CommonConfiguration(
        {
            "INIT_LR": 0.1,
            "N_MAX_EPOCHS": 100,
            "OPTIMIZER": {"TYPE": "SGD", "MOMENTUM": 0.9,
                          "WEIGHT_PARAMS": {"weight_decay": 1e-4}},
            "LR_SCHEDULER": {"TYPE": "CosineAnnealingLR"},
            "GRAD_CLIP": {"TYPE": "norm", "VALUE": 10.0},
        }
    )


def _batch(rng, n=16):
    k1, k2 = jax.random.split(rng)
    target = jax.random.randint(k2, (n,), 0, 4)
    # class-conditional mean shift makes the task learnable in a few steps
    image = jax.random.normal(k1, (n, 8, 8, 3)) * 0.1 + target[:, None, None, None].astype(jnp.float32)
    return {"image": image, "target": target}


def test_train_step_learns(mesh8, rng):
    model = TinyModel()
    cfg = _make_cfg()
    sched = build_lr_scheduler(cfg, iters_per_epoch=10)
    tx = build_optimizer(cfg, sched)
    batch = _batch(rng)
    state = create_train_state(model, tx, rng, batch, use_ema=True)
    train_step = make_train_step(amp=False, ema_decay=0.999)

    sbatch = shard_batch(mesh8, batch)
    losses = []
    for _ in range(30):
        state, metrics = train_step(state, sbatch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.8, losses
    assert int(state.step) == 30
    # EMA trailing but moving
    d = jax.tree_util.tree_map(
        lambda e, p: float(jnp.abs(e - p).max()), state.ema_params, state.params
    )
    assert max(jax.tree_util.tree_leaves(d)) > 0


def test_eval_step_uses_ema(mesh8, rng):
    model = TinyModel()
    cfg = _make_cfg()
    tx = build_optimizer(cfg, build_lr_scheduler(cfg, 10))
    batch = _batch(rng)
    state = create_train_state(model, tx, rng, batch, use_ema=True)
    eval_step = make_eval_step(use_ema=True)
    sbatch = shard_batch(mesh8, batch)
    loss_dict, preds = eval_step(state, sbatch)
    assert preds.shape == (16,)
    assert np.isfinite(float(loss_dict["ce_loss"]))


def test_amp_bf16_step(mesh8, rng):
    model = TinyModel()
    cfg = _make_cfg()
    tx = build_optimizer(cfg, build_lr_scheduler(cfg, 10))
    batch = _batch(rng)
    state = create_train_state(model, tx, rng, batch)
    train_step = make_train_step(amp=True)
    sbatch = shard_batch(mesh8, batch)
    state, metrics = train_step(state, sbatch)
    assert np.isfinite(float(metrics["loss"]))
    # master params stay fp32
    assert state.params["fc"]["kernel"].dtype == jnp.float32


def test_bias_lr_multiplier_and_decay_mask(rng):
    cfg = _make_cfg()
    cfg.OPTIMIZER.update({"BIAS_LR_MULTIPLIER": 2.0})
    tx = build_optimizer(cfg, lambda s: 0.1)
    model = TinyModel()
    batch = _batch(rng)
    state = create_train_state(model, tx, rng, batch)
    # one step with uniform grads: bias update should be ~2x weight update
    grads = jax.tree_util.tree_map(jnp.ones_like, state.params)
    updates, _ = tx.update(grads, state.opt_state, state.params)
    bias_u = float(jnp.abs(updates["fc"]["bias"]).mean())
    # compare against a 1-D norm-labeled leaf (bn scale) which gets 1x lr
    scale_u = float(jnp.abs(updates["bn"]["scale"]).mean())
    assert bias_u > 1.5 * scale_u


def test_backbone_lr_and_freeze(rng):
    """BACKBONE_LR scales backbone updates; FREEZE_PATTERNS zero them."""
    cfg = _make_cfg()
    cfg.update({"BACKBONE_LR": 0.01, "INIT_LR": 0.1})
    tx = build_optimizer(cfg, lambda s: 0.1)
    # fake param tree with a 'backbone' subtree
    params = {"backbone": {"conv": {"kernel": jnp.ones((3, 3, 3, 4))}},
              "head": {"kernel": jnp.ones((4, 2))}}
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    bb_u = float(jnp.abs(updates["backbone"]["conv"]["kernel"]).mean())
    hd_u = float(jnp.abs(updates["head"]["kernel"]).mean())
    assert bb_u < hd_u * 0.2  # ~10x smaller lr

    cfg2 = _make_cfg()
    cfg2.update({"FREEZE_PATTERNS": ["backbone"]})
    tx2 = build_optimizer(cfg2, lambda s: 0.1)
    st2 = tx2.init(params)
    up2, _ = tx2.update(grads, st2, params)
    assert float(jnp.abs(up2["backbone"]["conv"]["kernel"]).max()) == 0.0
    assert float(jnp.abs(up2["head"]["kernel"]).max()) > 0.0
