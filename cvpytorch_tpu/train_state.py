"""Functional training state + jitted train/eval steps.

Replaces the reference's mutable ``Trainer.run_step`` hot loop
(reference: trainer.py:145-233) with one ``jit``-compiled pure function
``train_step(state, batch) -> (state, metrics)`` over a device mesh.
AMP GradScaler is unnecessary on TPU — bf16 compute keeps fp32 range —
so the bf16 policy is a simple cast (SURVEY §7.1).  EMA is a ``tree_map``
inside the step (replaces reference src/utils/ema.py:13-58, including the
ramp ``d·(1−e^{−t/2000})``).

Model forward contract (mirrors the reference's universal
``model(imgs, targets, mode)``, trainer.py:177-213):

* a Flax module whose ``__call__(images, targets=None, mode='infer')``
  returns ``(total_loss, loss_dict)`` in 'train' mode,
  ``(loss_dict, predictions)`` in 'val' mode and predictions in 'infer';
  ``mode`` is static under jit.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict


@struct.dataclass
class TrainState:
    step: jnp.ndarray                      # int32 scalar
    params: Any
    batch_stats: Any                       # BN running stats ({} if none)
    opt_state: Any
    ema_params: Any                        # None or pytree like params
    ema_batch_stats: Any
    rng: jax.Array

    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)


def ema_decay_schedule(base_decay: float, step: jnp.ndarray,
                       tau: float = 2000.0) -> jnp.ndarray:
    """Warmup-ramped EMA decay (reference: src/utils/ema.py:22-27)."""
    return base_decay * (1.0 - jnp.exp(-step.astype(jnp.float32) / tau))


def create_train_state(
    model,
    tx: optax.GradientTransformation,
    rng: jax.Array,
    sample_batch: Any,
    use_ema: bool = False,
) -> TrainState:
    """Initialize params/batch_stats from one (host) sample batch."""
    init_rng, state_rng = jax.random.split(rng)
    variables = model.init(
        {"params": init_rng, "dropout": init_rng},
        sample_batch["image"],
        targets=sample_batch.get("target"),
        mode="train",
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict({}))
    opt_state = tx.init(params)
    ema_params = jax.tree_util.tree_map(jnp.copy, params) if use_ema else None
    ema_bs = jax.tree_util.tree_map(jnp.copy, batch_stats) if use_ema else None
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        ema_params=ema_params,
        ema_batch_stats=ema_bs,
        rng=state_rng,
        apply_fn=model.apply,
        tx=tx,
    )


def _cast_floats(tree, dtype):
    def _c(x):
        if isinstance(x, jnp.ndarray) and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(_c, tree)


def prepare_images(images, dtype=jnp.float32):
    """Device-side normalization: uint8 batches (4× less infeed than f32 —
    the H2D link is the bottleneck, SURVEY §2.9) become [0,1] floats
    in-graph; float batches pass through with a dtype cast."""
    if images.dtype == jnp.uint8:
        return images.astype(dtype) / 255.0
    if jnp.issubdtype(images.dtype, jnp.floating):
        return images.astype(dtype)
    return images


def make_train_step(
    amp: bool = False,
    ema_decay: float = 0.0,
    donate: bool = True,
    preprocess=None,
    donate_batch: bool = False,
):
    """Build the jitted train step.

    Under a sharded ``jit`` the batch arrives split on the mesh's ``data``
    axis; differentiating the *global* mean loss makes XLA emit the gradient
    all-reduce (replacing DDP, reference: trainer.py:313), and metrics are
    global means with no host-side reduce_dict.

    ``preprocess`` (optional, traceable ``batch -> batch``) runs INSIDE the
    jit — the device-aug path (raw uint8 tiles → mosaic/affine/HSV/flip →
    train batch) fuses into the same program, so one relay dispatch covers
    aug + fwd + bwd + update instead of ~7 (the r3 e2e bench paid the
    ~33 ms axon dispatch floor per un-fused call).
    """

    def train_step(state: TrainState, batch: Any) -> tuple[TrainState, dict]:
        if preprocess is not None:
            batch = preprocess(batch)
        step_rng = jax.random.fold_in(state.rng, state.step)

        def loss_fn(params):
            p = _cast_floats(params, jnp.bfloat16) if amp else params
            imgs = prepare_images(
                batch["image"], jnp.bfloat16 if amp else jnp.float32)
            out, mutated = state.apply_fn(
                {"params": p, "batch_stats": state.batch_stats},
                imgs,
                targets=batch.get("target"),
                mode="train",
                mutable=["batch_stats"],
                rngs={"dropout": step_rng},
            )
            total, loss_dict = out
            total = total.astype(jnp.float32)
            return total, (loss_dict, mutated.get("batch_stats", state.batch_stats))

        (total, (loss_dict, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        grads = _cast_floats(grads, jnp.float32) if amp else grads

        updates, new_opt_state = state.tx.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)

        new_ema_params = state.ema_params
        new_ema_bs = state.ema_batch_stats
        if state.ema_params is not None and ema_decay > 0:
            d = ema_decay_schedule(ema_decay, state.step + 1)
            blend = lambda e, p: d * e + (1.0 - d) * p.astype(e.dtype)
            new_ema_params = jax.tree_util.tree_map(
                blend, state.ema_params, new_params
            )
            new_ema_bs = jax.tree_util.tree_map(blend, state.ema_batch_stats, new_bs)

        metrics = {"loss": total,
                   **{k: jnp.asarray(v, jnp.float32)
                      for k, v in loss_dict.items()}}
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt_state,
            ema_params=new_ema_params,
            ema_batch_stats=new_ema_bs,
            rng=state.rng,
        )
        return new_state, metrics

    # donate_batch frees the batch buffers for reuse inside the step —
    # safe when every step feeds a FRESH host batch (the Trainer loop
    # does); attacks the loss-layout copies surviving state donation
    # (PERF.md r3 trace: ~6 ms of copies)
    dn = ((0, 1) if donate_batch else (0,)) if donate else ()
    return jax.jit(train_step, donate_argnums=dn)


def make_eval_step(use_ema: bool = False):
    """Jitted eval step: returns (loss_dict, predictions).

    Uses EMA weights when available (reference evaluates the EMA model,
    trainer.py:337-340).
    """

    def eval_step(state: TrainState, batch: Any):
        params = state.ema_params if (use_ema and state.ema_params is not None) else state.params
        bs = (
            state.ema_batch_stats
            if (use_ema and state.ema_batch_stats is not None)
            else state.batch_stats
        )
        out = state.apply_fn(
            {"params": params, "batch_stats": bs},
            prepare_images(batch["image"]),
            targets=batch.get("target"),
            mode="val",
        )
        return out

    return jax.jit(eval_step)


def make_predict_step(use_ema: bool = False):
    def predict_step(state: TrainState, images):
        params = state.ema_params if (use_ema and state.ema_params is not None) else state.params
        bs = (
            state.ema_batch_stats
            if (use_ema and state.ema_batch_stats is not None)
            else state.batch_stats
        )
        return state.apply_fn(
            {"params": params, "batch_stats": bs}, prepare_images(images),
            mode="infer"
        )

    return jax.jit(predict_step)
