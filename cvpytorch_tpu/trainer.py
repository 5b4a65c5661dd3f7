"""Trainer — generic epoch loop for every task
(reference: trainer.py:53-494, the single entry point; its 3 byte-identical
clones are deliberately NOT replicated, SURVEY §7.4).

TPU-native differences from the reference:

* the hot path is ONE jitted ``train_step`` over a device mesh — no DDP
  wrap, no GradScaler, no per-step ``cuda.synchronize`` (reference
  trainer.py:313,299,381);
* warmup is fused into the optax LR schedule instead of a temporary
  optimizer (reference trainer.py:239-264);
* EMA/optimizer/RNG state ride inside the checkpointed TrainState;
* metrics crossing hosts are already global (computed on the logical
  global batch under sharded jit).

CLI: ``python -m cvpytorch_tpu.trainer --setting conf/X.yml`` —
same flag as the reference (trainer.py:458-494).
"""
from __future__ import annotations

import argparse
import math
import time
from typing import Any, Optional

import jax
import numpy as np

from .config import CommonConfiguration, load_dictionary
from .data import loader as loader_mod
from .data.loader import DataLoader
from .data.transforms import build_transforms
from .evaluator import build_evaluator
from .optim.optimizers import build_optimizer
from .optim.schedules import build_lr_scheduler
from .parallel import mesh as pmesh
from .registry import DATASETS, MODELS
from .train_state import (
    create_train_state,
    make_eval_step,
    make_train_step,
)
from .utils.checkpoints import Checkpoints, EarlyStopping
from .utils.logger import setup_logger
from .utils.meters import LossLogger
from .utils.seed import DEFAULT_SEED, setup_seed
from .utils.tensorboard import DummyWriter
from .utils.timer import Timer

# importing registers the model/dataset zoo
from . import models as _models  # noqa: F401
from .data import datasets as _datasets  # noqa: F401


class Trainer:
    def __init__(self, cfg: CommonConfiguration):
        self.cfg = cfg
        # AMP_BN_BF16_STATS: True drops the f32 up-convert on the BN
        # batch-moment reductions (train mode only; running stats and
        # normalize stay f32).  ~22 ms of convert_reduce fusions in the
        # flagship 640 step → 861→940 img/s measured (PERF.md r5 ledger,
        # with a flagship-640 convergence proof).  Opt-in: moments lose
        # ~2 decimal digits, so fidelity-grade parity keeps f32 default.
        import os
        if cfg.AMP_BN_BF16_STATS:
            os.environ["CVT_BN_BF16_STATS"] = "1"
        else:  # don't leak a previous Trainer's setting across instances
            os.environ.pop("CVT_BN_BF16_STATS", None)
        pmesh.initialize_distributed()
        self.rank0 = pmesh.is_main_process()
        self.logger = setup_logger(rank=0 if self.rank0 else 1)
        self.rng = setup_seed(int(cfg.SEED or DEFAULT_SEED))
        self.start_epoch = -1
        self.n_epochs = int(cfg.N_MAX_EPOCHS or 1)
        # PARALLEL: {MODEL: n, SPATIAL: m} — width-shard weights over a
        # tensor-parallel axis and/or shard image HEIGHT over a spatial
        # axis (GSPMD conv halo exchange + global BN moments — exact
        # train-mode spatial parallelism for activation-bound seg configs;
        # both beyond the reference's DDP; parallel/mesh.py)
        par = cfg.PARALLEL
        get_par = par.get if (par and hasattr(par, "get")) else \
            (lambda k, d=None: d)
        self.tp = int(get_par("MODEL", 1) or 1)
        self.sp = int(get_par("SPATIAL", 1) or 1)
        self.mesh = pmesh.create_mesh(model=self.tp, spatial=self.sp)
        self.logger.info(
            "devices: %d (%s), mesh: %s",
            len(jax.devices()), jax.devices()[0].platform, self.mesh.shape,
        )

        self._parser_dict()
        self._parser_datasets()
        self._parser_model()

    # ------------------------------------------------------------------
    def _parser_dict(self):
        """(reference: trainer.py:73-84)"""
        self.dictionary = []
        if self.cfg.DATASET and self.cfg.DATASET.DICTIONARY:
            _, self.dictionary = load_dictionary(
                self.cfg.DATASET.DICTIONARY,
                self.cfg.DATASET.DICTIONARY_NAME)
        self.dictionary_name = (
            self.cfg.DATASET.DICTIONARY_NAME if self.cfg.DATASET else "CLS_CLASSES"
        ) or "CLS_CLASSES"

    def _parser_datasets(self):
        """(reference: trainer.py:86-118)"""
        ds_cls = DATASETS.get(self.cfg.DATASET.CLASS)
        self.datasets, self.dataloaders = {}, {}
        for stage in ("train", "val"):
            stage_cfg = self.cfg.DATASET.get(stage.upper())
            if stage_cfg is None:
                continue
            transform = build_transforms(
                self.dictionary_name, stage_cfg.get("TRANSFORMS"), stage
            )
            ds = ds_cls(
                data_cfg=stage_cfg, dictionary=self.dictionary,
                transform=transform, stage=stage,
            )
            self.datasets[stage] = ds
            collate = None
            if self.dictionary_name in ("DET_CLASSES", "INS_CLASSES",
                                        "KEYPOINT_CLASSES"):
                # keypoint batches ride the same padded det collate
                # (boxes/labels/keypoints/areas all fixed-shape)
                dev_aug = stage_cfg.get("DEVICE_AUG") \
                    if stage == "train" else None
                if dev_aug:
                    # mosaic/affine/HSV/flip/normalize run in-graph
                    # (ops/augment.fused_det_augment); host only
                    # letterboxes the LOAD_NUM=4 raw tiles
                    from .data.transforms.det_transforms import \
                        make_device_aug_collate

                    size = int(dev_aug.get("SIZE", 640)) \
                        if hasattr(dev_aug, "get") else 640
                    # TILE < SIZE letterboxes the raw tiles at reduced
                    # resolution (default SIZE/2): each tile covers ~a
                    # quadrant of the mosaic, and on weak hosts the
                    # letterbox/memcpy bytes dominate the input pipeline
                    tile = int(dev_aug.get("TILE", size // 2)) \
                        if hasattr(dev_aug, "get") else size // 2
                    collate = make_device_aug_collate(
                        int(self.cfg.DATASET.MAX_BOXES or 64) // 4, tile)
                    self._device_aug_size = size
                else:
                    from .data.transforms.det_transforms import \
                        make_det_collate

                    collate = make_det_collate(
                        int(self.cfg.DATASET.MAX_BOXES or 64))
            self.dataloaders[stage] = DataLoader(
                ds,
                collate_fn=collate,
                batch_size=int(stage_cfg.get("BATCH_SIZE", 1)),
                shuffle=bool(stage_cfg.get("SHUFFLE", stage == "train")),
                num_workers=int(stage_cfg.get("NUM_WORKER", 4) or 4),
                drop_last=(stage == "train"),
                seed=int(self.cfg.SEED or DEFAULT_SEED),
                process_index=jax.process_index(),
                process_count=jax.process_count(),
            )
        self.batch_size = int(self.cfg.DATASET.TRAIN.get("BATCH_SIZE", 1))
        self.iters_per_epoch = max(len(self.dataloaders["train"]), 1)
        self.evaluator = (
            build_evaluator(self.cfg, self.datasets.get("val"))
            if self.cfg.EVALUATOR and "val" in self.datasets
            else None
        )

    def _parser_model(self):
        """(reference: trainer.py:121-131).  Lowercase USE_MODEL keys that
        the model dataclass declares are forwarded as constructor kwargs
        (e.g. UNet base_channels/depth)."""
        import dataclasses

        model_cls = MODELS.get(self.cfg.USE_MODEL.CLASS)
        extra = {}
        if dataclasses.is_dataclass(model_cls):
            fields = {f.name for f in dataclasses.fields(model_cls)}
            for k, v in self.cfg.USE_MODEL.items():
                if k in fields and k not in ("dictionary", "model_cfg"):
                    extra[k] = tuple(v) if isinstance(v, list) else v
            # the dataset's instance-mask raster size (DATASET.*.MASK_SIZE)
            # must match the model's mask-paste canvas or segm eval breaks
            ds = self.datasets.get("train") or self.datasets.get("val")
            if ("mask_size" in fields and "mask_size" not in extra
                    and ds is not None and hasattr(ds, "mask_size")):
                extra["mask_size"] = int(ds.mask_size)
        self.model = model_cls(
            dictionary=tuple(
                tuple(d.items())[0] and d for d in self.dictionary
            ) if self.dictionary else (),
            model_cfg=self.cfg.USE_MODEL,
            **extra,
        )

    # ------------------------------------------------------------------
    def _build_train_state(self, sample_batch):
        lr = float(self.cfg.INIT_LR or 0.01)
        scale_lr = float(self.cfg.SCALE_LR or 0)
        if scale_lr:
            # linear LR scaling on global batch (reference SCALE_LR key)
            lr = lr * self.batch_size * jax.process_count() / scale_lr
            self.cfg.INIT_LR = lr
        self.lr_schedule = build_lr_scheduler(self.cfg, self.iters_per_epoch)
        tx = build_optimizer(self.cfg, self.lr_schedule)
        use_ema = bool(self.cfg.EMA)
        state = create_train_state(self.model, tx, self.rng, sample_batch,
                                   use_ema=use_ema)
        n_params = sum(
            int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(state.params)
        )
        self.logger.info("model %s: %.2fM params", self.cfg.USE_MODEL.CLASS,
                         n_params / 1e6)
        if self.cfg.PRETRAIN_MODEL:
            if self.cfg.RESUME:
                state = Checkpoints.restore_into(state, self.cfg.PRETRAIN_MODEL)
                self.start_epoch = int(state.step) // self.iters_per_epoch - 1
                self.logger.info("resumed from %s @ step %d",
                                 self.cfg.PRETRAIN_MODEL, int(state.step))
            else:
                state = Checkpoints.load_weights_into(state, self.cfg.PRETRAIN_MODEL)
                self.logger.info("loaded weights from %s", self.cfg.PRETRAIN_MODEL)
        if self.tp > 1:
            state = pmesh.shard_train_state(state, self.mesh)
        return state

    # ------------------------------------------------------------------
    def run(self):
        """(reference: trainer.py:266-366)"""
        cfg = self.cfg
        train_loader = self.dataloaders["train"]
        first = next(iter(train_loader))
        if getattr(self, "_device_aug_size", None):
            first = self._apply_device_aug(first, 0)
        state = self._build_train_state(first)

        ema_decay = 0.0
        if cfg.EMA:
            # EMA: True → reference ModelEMA default decay (ema.py:13);
            # EMA: {DECAY: d} → configurable
            ema_decay = float(cfg.EMA.get("DECAY", 0.9999)) \
                if hasattr(cfg.EMA, "get") else 0.9999
        train_step = make_train_step(
            amp=bool(cfg.AMP), ema_decay=ema_decay,
            # device aug runs INSIDE the train-step jit: one dispatch per
            # step (the separate _apply_device_aug call paid an extra
            # relay round-trip per step; kept only for state init above)
            preprocess=self._device_aug_preprocess()
            if getattr(self, "_device_aug_size", None) else None)
        eval_step = make_eval_step(use_ema=bool(cfg.EMA))

        ckpts = writer = None
        if self.rank0:
            ckpts = Checkpoints(
                cfg.CHECKPOINT_DIR or "checkpoints",
                cfg.EXPERIMENT_NAME or "exp",
                str(cfg.USE_MODEL.CLASS).split(".")[-1],
                # epoch-boundary saves overlap the next epoch's training
                async_save=cfg.ASYNC_CHECKPOINT is not False,
            )
            writer = DummyWriter(
                cfg.TENSORBOARD_LOG_DIR if cfg.TENSORBOARD else None,
                enabled=bool(cfg.TENSORBOARD),
            )
        stopper = EarlyStopping(int(cfg.PATIENCE or 0) or 10**9)
        eval_intervals = int(
            (cfg.EVALUATOR.get("EVAL_INTERVALS", 1) if cfg.EVALUATOR else 1) or 1
        )
        save_intervals = int(cfg.N_EPOCHS_TO_SAVE_MODEL or 1)
        display = int(cfg.N_ITERS_TO_DISPLAY_STATUS or 50)

        best_perf = -math.inf
        for epoch in range(self.start_epoch + 1, self.n_epochs):
            train_loader.set_epoch(epoch)
            state = self.train_epoch(epoch, state, train_step, train_loader,
                                     writer, display)
            if self.evaluator and (epoch + 1) % eval_intervals == 0:
                perf, metrics = self.val_epoch(epoch, state, eval_step, writer)
                is_best = perf > best_perf
                best_perf = max(best_perf, perf)
                if ckpts:
                    ckpts.autosave_checkpoint(state, epoch, is_best)
                if stopper(epoch, perf):
                    break
            elif ckpts and (epoch + 1) % save_intervals == 0:
                ckpts.autosave_checkpoint(state, epoch, is_best=False)
        if writer:
            writer.close()
        if ckpts:
            ckpts.wait()
        if getattr(self, "_prof_active", False):
            jax.profiler.stop_trace()
            self._prof_active = False
        self.state = state
        return state

    def _apply_device_aug(self, batch, step: int):
        """Raw (B,4,S,S,3) uint8 tiles → augmented train batch, one fused
        XLA program on device (SURVEY §7.1 device-aug north star)."""
        import jax.numpy as jnp

        from .ops.augment import fused_det_augment

        size = self._device_aug_size
        key = jax.random.fold_in(
            jax.random.PRNGKey(int(self.cfg.SEED or 0) + 7919), step)
        imgs, boxes, keep = fused_det_augment(
            jnp.asarray(batch["image"]),
            jnp.asarray(batch["target"]["boxes"]),
            jnp.asarray(batch["target"]["valid"]), key, size)
        B = imgs.shape[0]
        labels = jnp.asarray(batch["target"]["labels"]).reshape(B, -1)
        return {
            "image": imgs,
            "target": {
                "boxes": boxes, "labels": labels, "valid": keep,
                "pads": jnp.zeros((B, 2), jnp.float32),
                "scales": jnp.ones((B, 2), jnp.float32),
                "height": jnp.full((B,), size, jnp.int32),
                "width": jnp.full((B,), size, jnp.int32),
            },
        }

    def _device_aug_preprocess(self):
        """Traceable raw-tiles → train-batch transform for
        ``make_train_step(preprocess=...)``: the same fused mosaic/affine/
        HSV/flip program as :meth:`_apply_device_aug`, but traced into the
        train-step jit so aug + fwd + bwd + update is ONE dispatch.  The
        per-step RNG folds in the traced ``target['aug_step']`` scalar —
        no retrace across steps."""
        import jax.numpy as jnp

        from .ops.augment import fused_det_augment

        size = self._device_aug_size
        seed = int(self.cfg.SEED or 0) + 7919

        def preprocess(batch):
            t = batch["target"]
            key = jax.random.fold_in(jax.random.PRNGKey(seed),
                                     t["aug_step"])
            imgs, boxes, keep = fused_det_augment(
                batch["image"], t["boxes"], t["valid"], key, size)
            B = imgs.shape[0]
            new_t = {
                "boxes": boxes,
                "labels": t["labels"].reshape(B, -1),
                "valid": keep,
                "pads": jnp.zeros((B, 2), jnp.float32),
                "scales": jnp.ones((B, 2), jnp.float32),
                "height": jnp.full((B,), size, jnp.int32),
                "width": jnp.full((B,), size, jnp.int32),
            }
            if "epoch" in t:
                new_t["epoch"] = t["epoch"]
            return {**batch, "image": imgs, "target": new_t}

        return preprocess

    def _profiler_hook(self, step: int):
        """YAML-driven jax.profiler trace (SURVEY §5.1 TPU plan; the
        reference has no profiler hook at all).
        ``PROFILER: {DIR: 'traces', START_STEP: 20, NUM_STEPS: 5}``
        captures XLA+host timelines viewable in TensorBoard/Perfetto."""
        prof = self.cfg.PROFILER
        if not prof or not hasattr(prof, "get"):
            return
        start = prof.get("START_STEP")
        start = 10 if start is None else int(start)
        num = prof.get("NUM_STEPS")
        num = 5 if num is None else int(num)
        if step == start:
            jax.profiler.start_trace(str(prof.get("DIR", "traces")))
            self._prof_active = True
            self.logger.info("profiler trace started @ step %d", step)
        elif step == start + num and getattr(self, "_prof_active", False):
            jax.profiler.stop_trace()
            self._prof_active = False
            self.logger.info("profiler trace written to %s",
                             prof.get("DIR", "traces"))

    def train_epoch(self, epoch, state, train_step, loader, writer, display):
        """(reference: trainer.py:370-409)"""
        loss_logger = LossLogger()
        timer = Timer()
        timer.tic()
        pending = None  # (metrics, iter) — read one step late: no sync stall
        it = 0
        dev_aug = getattr(self, "_device_aug_size", None)

        def prepared():
            for i, batch in enumerate(loader):
                if isinstance(batch.get("target"), dict):
                    # traced scalars: epoch-scheduled losses (YOLOv6
                    # ATSS→TAL warmup) switch via lax.cond, and the in-jit
                    # device-aug RNG folds in aug_step — neither retraces
                    # across steps (reference trainer.py:180)
                    extra = {"epoch": np.int32(epoch)}
                    if dev_aug:
                        extra["aug_step"] = np.int32(epoch * len(loader) + i)
                    batch = {**batch, "target": {**batch["target"], **extra}}
                yield batch

        # double-buffered device feed: host decode + H2D for step k+1
        # overlap device compute for step k (reference
        # prefetch_dataLoader.py's CUDA-stream prefetch, TPU analog)
        feed = loader_mod.DevicePrefetcher(
            prepared(), transfer=lambda b: pmesh.shard_batch(self.mesh, b))
        for it, sbatch in enumerate(feed):
            gstep = epoch * len(loader) + it
            self._profiler_hook(gstep)
            state, metrics = train_step(state, sbatch)
            if pending is not None and (pending[1] + 1) % display == 0:
                m = {k: float(v) for k, v in pending[0].items()}
                loss_logger.update(m)
                timer.toc(display)
                lr = float(self.lr_schedule(int(state.step) - 1))
                self.logger.info(
                    "epoch %d iter %d/%d lr %.5f %s (%.1f im/s)",
                    epoch, pending[1] + 1, len(loader), lr, loss_logger,
                    timer.ips(self.batch_size),
                )
                timer.reset()
                timer.tic()
            pending = (metrics, it)
        if pending is not None:
            loss_logger.update({k: float(v) for k, v in pending[0].items()})
        if writer:
            for k, m in loss_logger.meters.items():
                writer.add_scalar(f"loss/train_{k}", m.global_avg, epoch)
        return state

    def val_epoch(self, epoch, state, eval_step, writer):
        """(reference: trainer.py:412-455)"""
        self.evaluator.reset()
        loss_logger = LossLogger()
        for batch in self.dataloaders["val"]:
            targets_host = batch.get("target")
            if isinstance(batch.get("target"), dict):
                # thread the epoch into val targets too, so epoch-scheduled
                # losses (YOLOv6 ATSS→TAL warmup) report val losses with the
                # SAME assigner branch the train step is using (ADVICE r4 #3)
                batch = {**batch, "target": {**batch["target"],
                                             "epoch": np.int32(epoch)}}
            sbatch = pmesh.shard_batch(
                self.mesh,
                {k: v for k, v in batch.items() if k != "target" or not isinstance(v, list)},
            )
            if isinstance(targets_host, list):
                sbatch = dict(sbatch)
            loss_dict, preds = eval_step(state, sbatch)
            loss_logger.update({k: float(v) for k, v in loss_dict.items()})
            self.evaluator.update(targets_host, jax.device_get(preds))
        if jax.process_count() > 1:
            # each host scored only its dataloader shard — gather every
            # process's accumulation so best-checkpoint/early-stop see the
            # FULL val set (reference eval_coco.py:205-224
            # synchronize_between_processes)
            self.evaluator.merge_state_dicts(
                pmesh.allgather_pickled(self.evaluator.state_dict()))
        metrics = self.evaluator.evaluate()
        perf = float(metrics.get("performance", 0.0))
        self.logger.info(
            "epoch %d VAL %s | %s",
            epoch, loss_logger,
            ", ".join(
                f"{k}: {v:.4f}" for k, v in metrics.items()
                if isinstance(v, float) and not k.startswith("Acc_")
            ),
        )
        if writer:
            for k, m in loss_logger.meters.items():
                writer.add_scalar(f"loss/val_{k}", m.global_avg, epoch)
            for k, v in metrics.items():
                if isinstance(v, float) and math.isfinite(v):
                    writer.add_scalar(f"performance/{k}", v, epoch)
        return perf, metrics


def main(argv=None):
    parser = argparse.ArgumentParser("cvpytorch_tpu trainer")
    parser.add_argument("--setting", required=True, help="path to conf yml")
    args = parser.parse_args(argv)
    cfg = CommonConfiguration.from_yaml(args.setting)
    trainer = Trainer(cfg)
    trainer.run()


if __name__ == "__main__":
    main()
