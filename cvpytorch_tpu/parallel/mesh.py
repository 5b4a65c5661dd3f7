"""Device mesh + sharding helpers — replaces the reference's NCCL/DDP stack.

Reference parallelism (SURVEY §2.10): single-node multi-GPU DDP over NCCL
(reference: trainer.py:313, src/utils/distributed.py:82-98).  TPU-native
equivalent: a single-controller ``jax.sharding.Mesh`` over ICI/DCN, with the
train step ``jit``-ted under ``NamedSharding`` annotations — XLA inserts the
gradient/metric collectives.  There is no DDP wrapper, no explicit
all_reduce, no DistributedSampler: batches are sharded along the ``data``
axis, gradients of the *global* loss are already averaged, and BatchNorm
moments computed on the logical global batch give SyncBN semantics for free.

Axes:
  * ``data``  — batch sharding (data parallel; replaces DDP)
  * ``model`` — reserved for tensor parallel (width-sharded convs/matmuls)
"""
from __future__ import annotations

import os
from functools import partial
from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_distributed():
    """Multi-host init (replaces torch.distributed.init_process_group,
    reference: distributed.py:82-98).  No-op unless the standard JAX
    coordinator env vars are present."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    ):
        jax.distributed.initialize()


def create_mesh(
    data: int | None = None,
    model: int = 1,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a ``(data, model)`` mesh.

    ``data=None`` consumes all remaining devices.  The data axis is placed
    outermost so DP gradient reductions ride ICI rings.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-dim batch sharding for array batches."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a host batch pytree onto the mesh, sharded on dim 0.

    Replaces DistributedSampler + per-rank H2D copies
    (reference: trainer.py:97,156-175).
    """
    n_data = mesh.shape[DATA_AXIS]

    def _put(x):
        x = np.asarray(x)
        if x.ndim == 0 or x.shape[0] % n_data:
            # last partial val batch (drop_last=False) can't split evenly
            # across the data axis — place it replicated instead of crashing
            return jax.device_put(x, replicated(mesh))
        return jax.device_put(x, NamedSharding(mesh, P(DATA_AXIS, *([None] * (x.ndim - 1)))))

    return jax.tree_util.tree_map(_put, batch)


def replicate_tree(mesh: Mesh, tree: Any) -> Any:
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), tree)


def tp_shardings(tree: Any, mesh: Mesh, min_elems: int = 4096) -> Any:
    """Tensor-parallel ``NamedSharding`` tree (the scaling-book recipe:
    annotate the weights, let GSPMD insert the collectives).

    Any leaf with ndim ≥ 2 whose trailing (output-channel) dim splits
    evenly over the ``model`` axis is sharded there — conv kernels are
    HWIO and dense kernels IO, so this width-shards every layer's output
    features; XLA propagates the activation shardings and places the
    all-gather/reduce-scatter pairs on ICI.  Small leaves and 1-D
    vectors (bias/BN) replicate — sharding them saves nothing and adds
    reshard traffic.  Optimizer moments mirror param shapes, so the same
    shape rule lays them out identically to their parameters.
    """
    n_model = mesh.shape[MODEL_AXIS]
    rep = replicated(mesh)

    def spec(x):
        shp = getattr(x, "shape", ())
        if (
            n_model > 1
            and len(shp) >= 2
            and shp[-1] % n_model == 0
            and int(np.prod(shp)) >= min_elems
        ):
            return NamedSharding(
                mesh, P(*([None] * (len(shp) - 1)), MODEL_AXIS))
        return rep

    return jax.tree_util.tree_map(spec, tree)


def shard_train_state(state: Any, mesh: Mesh, min_elems: int = 4096) -> Any:
    """Lay a TrainState out for dp×tp: params / EMA / optimizer moments
    width-sharded per :func:`tp_shardings`, everything else replicated.
    The jitted train step keeps these shardings (committed inputs),
    so each step's weights, grads and moments stay model-sharded."""
    return jax.tree_util.tree_map(
        jax.device_put, state, tp_shardings(state, mesh, min_elems))


def process_batch_slice(global_batch_size: int) -> slice:
    """Each host feeds its slice of the global batch (per-host input
    pipelines replace DistributedSampler; SURVEY §5.8)."""
    n_proc = jax.process_count()
    if global_batch_size % n_proc:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by {n_proc} hosts"
        )
    per = global_batch_size // n_proc
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def local_device_count() -> int:
    return jax.local_device_count()


def is_main_process() -> bool:
    """Rank-0 gating idiom (reference: distributed.py:66)."""
    return jax.process_index() == 0
