"""LR schedules (reference: src/lr_schedulers/, 352 LoC).

The reference runs a *separate temporary optimizer* for warmup
(reference: trainer.py:239-264, lr_schedulers/warmup.py:8) then steps an
epoch-based torch scheduler.  TPU-native design: ONE per-iteration optax
schedule ``step -> lr`` with warmup fused via ``optax.join_schedules`` —
no optimizer swap, no epoch/iter split, fully traceable under jit.

Supported names mirror the reference YAML ``LR_SCHEDULER.TYPE``:
MultiStepLR, StepLR, CosineAnnealingLR, PolyLR, LambdaLR (YOLO cosine
lambda, reference: lr_schedulers/__init__.py:64), ExponentialLR, plus
warmup methods constant/linear/exp (reference: warmup.py:8-21).
"""
from __future__ import annotations

import math
from typing import Callable

import optax

from ..registry import LR_SCHEDULERS

Schedule = Callable[[int], float]


def _warmup(method: str, base_lr: float, warmup_iters: int,
            factor: float = 1.0 / 3) -> Schedule:
    method = (method or "linear").lower()
    if method == "constant":
        return lambda step: base_lr * factor
    if method == "linear":
        return optax.linear_schedule(base_lr * factor, base_lr, warmup_iters)
    if method == "exp":
        def sched(step):
            alpha = step / max(warmup_iters, 1)
            return base_lr * (factor ** (1.0 - alpha))
        return sched
    raise ValueError(f"unknown warmup method {method!r}")


@LR_SCHEDULERS.register(name="MultiStepLR")
def multi_step_lr(base_lr, iters_per_epoch, epochs, milestones=(30, 60, 90),
                  gamma=0.1, **_):
    bounds = {int(m * iters_per_epoch): gamma for m in milestones}
    return optax.piecewise_constant_schedule(base_lr, bounds)


@LR_SCHEDULERS.register(name="StepLR")
def step_lr(base_lr, iters_per_epoch, epochs, step_size=30, gamma=0.1, **_):
    def sched(step):
        epoch = step // iters_per_epoch
        return base_lr * gamma ** (epoch // step_size)
    return sched


@LR_SCHEDULERS.register(name="CosineAnnealingLR")
def cosine_lr(base_lr, iters_per_epoch, epochs, eta_min=0.0, **_):
    total = max(int(iters_per_epoch * epochs), 1)
    return optax.cosine_decay_schedule(base_lr, total, alpha=eta_min / max(base_lr, 1e-12))


@LR_SCHEDULERS.register(name="PolyLR")
def poly_lr(base_lr, iters_per_epoch, epochs, power=0.9, eta_min=0.0, **_):
    """Per-iteration poly decay (reference: lr_schedulers/poly_lr.py:10)."""
    total = max(int(iters_per_epoch * epochs), 1)
    def sched(step):
        frac = 1.0 - (step / total) if hasattr(step, "dtype") else 1.0 - min(step, total) / total
        return (base_lr - eta_min) * (frac ** power) + eta_min
    return sched


@LR_SCHEDULERS.register(name="LambdaLR", aliases=("YoloCosineLR",))
def yolo_cosine_lr(base_lr, iters_per_epoch, epochs, lrf=0.2, **_):
    """YOLO one-cycle cosine lambda (reference: lr_schedulers/__init__.py:64):
    lr(e) = base * ((1+cos(e·π/E))/2 · (1−lrf) + lrf), stepped per epoch."""
    def sched(step):
        epoch = step // max(iters_per_epoch, 1)
        import jax.numpy as jnp
        cos = (1 + jnp.cos(epoch * math.pi / max(epochs, 1))) / 2
        return base_lr * (cos * (1 - lrf) + lrf)
    return sched


@LR_SCHEDULERS.register(name="ExponentialLR")
def exponential_lr(base_lr, iters_per_epoch, epochs, gamma=0.95, **_):
    def sched(step):
        epoch = step // max(iters_per_epoch, 1)
        return base_lr * gamma ** epoch
    return sched


def build_lr_scheduler(cfg, iters_per_epoch: int) -> Schedule:
    """cfg: the full trainer config (uses INIT_LR, N_MAX_EPOCHS,
    LR_SCHEDULER.{TYPE,...}, WARMUP.{NAME,ITERS,FACTOR})."""
    base_lr = float(cfg.INIT_LR)
    epochs = int(cfg.N_MAX_EPOCHS or 1)
    sch_cfg = cfg.LR_SCHEDULER or {}
    name = (sch_cfg.get("TYPE") if hasattr(sch_cfg, "get") else None) or "CosineAnnealingLR"
    kwargs = {
        k.lower(): v
        for k, v in (sch_cfg.to_dict() if hasattr(sch_cfg, "to_dict") else dict(sch_cfg)).items()
        if k != "TYPE"
    }
    main = LR_SCHEDULERS.get(name)(base_lr, iters_per_epoch, epochs, **kwargs)

    warm_cfg = cfg.WARMUP
    if warm_cfg and int(warm_cfg.get("ITERS", 0) or 0) > 0:
        iters = int(warm_cfg.get("ITERS"))
        w = _warmup(
            warm_cfg.get("NAME", "linear"),
            base_lr,
            iters,
            float(warm_cfg.get("FACTOR", 1.0 / 3) or 1.0 / 3),
        )
        return optax.join_schedules([w, main], [iters])
    return main
