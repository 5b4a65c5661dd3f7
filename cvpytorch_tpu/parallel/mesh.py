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
  * ``data``    — batch sharding (data parallel; replaces DDP)
  * ``model``   — tensor parallel (width-sharded convs/matmuls)
  * ``spatial`` — image-height sharding for activation-bound seg training
    (1024×2048 Cityscapes through UNet/SegNeXt exceeds per-chip HBM at
    batch).  TRAIN-capable: the batch's H dim is annotated inside the
    ordinary jit train step and GSPMD spatially partitions every conv,
    inserting the halo exchanges itself and computing BatchNorm moments
    over the logical global extent — semantics-preserving, so sharded
    training is EXACT vs unsharded (test_parallel_spatial).  The
    explicit overlap-tile ``shard_map`` path (parallel/spatial.py)
    remains the lower-comm eval/inference alternative.
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
SPATIAL_AXIS = "spatial"


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
    spatial: int = 1,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a ``(data, model, spatial)`` mesh.

    ``data=None`` consumes all remaining devices.  The data axis is placed
    outermost so DP gradient reductions ride ICI rings; spatial innermost
    so conv halo exchanges are nearest-neighbor hops.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % (model * spatial):
            raise ValueError(
                f"{n} devices not divisible by model={model}*spatial={spatial}")
        data = n // (model * spatial)
    if data * model * spatial != n:
        raise ValueError(f"mesh {data}x{model}x{spatial} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, model, spatial)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS, SPATIAL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-dim batch sharding for array batches."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a host batch pytree onto the mesh, sharded on dim 0 — and,
    when the mesh has a ``spatial`` axis, images (4-D/5-D ``image`` leaf)
    additionally sharded on their height dim: GSPMD spatially partitions
    the convs under jit, inserting halo exchanges and keeping BN moments
    global (exact train-mode spatial parallelism).

    Replaces DistributedSampler + per-rank H2D copies
    (reference: trainer.py:97,156-175).
    """
    n_data = mesh.shape[DATA_AXIS]
    n_sp = dict(mesh.shape).get(SPATIAL_AXIS, 1)

    def _put(x, h_dim=None):
        x = np.asarray(x)
        if x.ndim == 0 or x.shape[0] % n_data:
            # last partial val batch (drop_last=False) can't split evenly
            # across the data axis — place it replicated instead of crashing
            return jax.device_put(x, replicated(mesh))
        spec = [DATA_AXIS] + [None] * (x.ndim - 1)
        if h_dim is not None and n_sp > 1 and x.shape[h_dim] % n_sp == 0:
            spec[h_dim] = SPATIAL_AXIS
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    if isinstance(batch, dict) and "image" in batch:
        img = np.asarray(batch["image"])
        # (B,H,W,C) trained batches; (B,G,H,W,C) raw device-aug tile groups
        h_dim = 1 if img.ndim == 4 else (2 if img.ndim == 5 else None)
        rest = {k: v for k, v in batch.items() if k != "image"}
        out = jax.tree_util.tree_map(_put, rest)
        out["image"] = _put(img, h_dim=h_dim)
        return out
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


def allgather_pickled(obj: Any) -> list:
    """Gather one picklable object from every process; returns the list
    ordered by process index (single-process: ``[obj]``).

    The multi-host analog of the reference's
    ``synchronize_between_processes`` detection-list allgather
    (reference: eval_coco.py:205-224, distributed.py:161-172): payloads
    are pickled to uint8, padded to the global max length, and shipped
    with ``multihost_utils.process_allgather`` (one DCN collective for
    the sizes, one for the data).
    """
    import pickle

    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils as mh

    data = np.frombuffer(pickle.dumps(obj), np.uint8)
    sizes = mh.process_allgather(np.array([data.size], np.int64))
    sizes = np.asarray(sizes).reshape(-1)
    padded = np.zeros(int(sizes.max()), np.uint8)
    padded[: data.size] = data
    gathered = np.asarray(mh.process_allgather(padded))
    return [
        pickle.loads(gathered[p, : int(sizes[p])].tobytes())
        for p in range(jax.process_count())
    ]
