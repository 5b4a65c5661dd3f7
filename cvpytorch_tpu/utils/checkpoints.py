"""Checkpointing (reference: src/utils/checkpoints.py:13-74).

Same layout semantics — a run directory
``CHECKPOINT_DIR/<EXPERIMENT>#<Model>#<timestamp>`` holding ``last`` /
``best`` / ``deploy`` (weights-only copy of best) — but orbax-backed and
*complete*: unlike the reference (SURVEY §5.4 gaps), EMA params, optimizer
state, step and RNG are all checkpointed, so resume is exact.
"""
from __future__ import annotations

import os
import threading
import time
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from .logger import setup_logger

logger = setup_logger()


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


class Checkpoints:
    def __init__(self, checkpoint_dir: str, experiment_name: str = "exp",
                 model_name: str = "model", timestamp: str | None = None,
                 async_save: bool = False):
        """``async_save=True`` runs the device→host fetch AND the orbax
        write on a daemon thread so the (20-30 s on TPU) save overlaps the
        next epoch's training; JAX arrays are immutable so the captured
        state is a consistent snapshot.  One save in flight at a time;
        call :meth:`wait` before reading the files back."""
        stamp = timestamp or time.strftime("%Y-%m-%d-%H-%M-%S")
        self.save_dir = os.path.abspath(
            os.path.join(checkpoint_dir, f"{experiment_name}#{model_name}#{stamp}")
        )
        os.makedirs(self.save_dir, exist_ok=True)
        self._ckptr = ocp.PyTreeCheckpointer()
        self.async_save = async_save
        self._pending: Optional[threading.Thread] = None
        self._save_error: Optional[BaseException] = None

    def wait(self):
        """Block until any in-flight async save has landed on disk.
        Re-raises any exception the background save hit (disk full,
        serialization error) — a silent failure here would let training
        finish "successfully" with a truncated last/best checkpoint."""
        if self._pending is not None:
            self._pending.join()
            self._pending = None
        if self._save_error is not None:
            err, self._save_error = self._save_error, None
            raise RuntimeError("async checkpoint save failed") from err

    @staticmethod
    def _snapshot(state):
        """Device-side copy of every array leaf.  The jitted train step
        donates the state's buffers (train_state.py:169), so an async
        save reading the live state would hit deleted arrays once the
        next step runs; an HBM copy is cheap and decouples the two."""
        return jax.tree_util.tree_map(
            lambda x: x.copy() if isinstance(x, jax.Array) else x, state)

    def _launch(self, work):
        self.wait()
        if self.async_save:
            def guarded():
                try:
                    work()
                except BaseException as e:   # surfaced by the next wait()
                    logger.error("async checkpoint save failed: %s", e)
                    self._save_error = e

            self._pending = threading.Thread(target=guarded, daemon=True)
            self._pending.start()
        else:
            work()

    # -- save --------------------------------------------------------------
    def _payload(self, state, extra: dict | None) -> dict:
        payload = {
            "step": np.asarray(state.step),
            "params": _to_host(state.params),
            "batch_stats": _to_host(state.batch_stats),
            "opt_state": _to_host(state.opt_state),
            "rng": np.asarray(state.rng),
        }
        if state.ema_params is not None:
            payload["ema_params"] = _to_host(state.ema_params)
            payload["ema_batch_stats"] = _to_host(state.ema_batch_stats)
        if extra:
            payload["extra"] = extra
        return payload

    def save_checkpoint(self, state, name: str = "last", extra: dict | None = None):
        if self.async_save:
            state = self._snapshot(state)

        def work():
            path = os.path.join(self.save_dir, name)
            self._ckptr.save(path, self._payload(state, extra), force=True)
            logger.info("saved checkpoint %s", path)

        self._launch(work)

    def autosave_checkpoint(self, state, epoch: int, is_best: bool,
                            extra: dict | None = None):
        """'last' every call; 'best' + weights-only 'deploy' on improvement
        (reference: checkpoints.py:53-74)."""
        extra = dict(extra or {}, epoch=epoch)
        if self.async_save:
            state = self._snapshot(state)

        def work():
            payload = self._payload(state, extra)
            self._ckptr.save(os.path.join(self.save_dir, "last"), payload,
                             force=True)
            if is_best:
                self._ckptr.save(os.path.join(self.save_dir, "best"),
                                 payload, force=True)
                deploy = {
                    "params": _to_host(
                        state.ema_params if state.ema_params is not None
                        else state.params
                    ),
                    "batch_stats": _to_host(
                        state.ema_batch_stats
                        if state.ema_batch_stats is not None
                        else state.batch_stats
                    ),
                }
                self._ckptr.save(os.path.join(self.save_dir, "deploy"),
                                 deploy, force=True)
            logger.info("saved checkpoint(s) in %s (best=%s)",
                        self.save_dir, is_best)

        self._launch(work)

    # -- load --------------------------------------------------------------
    @staticmethod
    def load(path: str) -> dict:
        return ocp.PyTreeCheckpointer().restore(os.path.abspath(path))

    @staticmethod
    def restore_into(state, path: str):
        """Full resume: model+opt+EMA+step+rng (reference resume_checkpoint
        restores only model/optimizer/epoch, checkpoints.py:43-51).

        A structure-free orbax restore returns optax namedtuple/tuple
        opt_state nodes as dicts/lists, which crashes the first
        ``tx.update``; restore against an item template built from the
        live state so every container type survives the round trip.
        """
        raw = Checkpoints.load(path)
        item = {
            "step": np.asarray(state.step),
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "rng": np.asarray(state.rng),
        }
        if "ema_params" in raw:
            item["ema_params"] = (
                state.ema_params if state.ema_params is not None else state.params
            )
            if "ema_batch_stats" in raw:
                item["ema_batch_stats"] = (
                    state.ema_batch_stats
                    if state.ema_batch_stats is not None
                    else state.batch_stats
                )
        if "extra" in raw:
            item["extra"] = raw["extra"]
        payload = ocp.PyTreeCheckpointer().restore(os.path.abspath(path),
                                                   item=item)
        kwargs = dict(
            step=jax.numpy.asarray(payload["step"]),
            params=payload["params"],
            batch_stats=payload.get("batch_stats", state.batch_stats),
            opt_state=payload.get("opt_state", state.opt_state),
            rng=jax.numpy.asarray(payload["rng"]) if "rng" in payload else state.rng,
        )
        if "ema_params" in payload:
            kwargs["ema_params"] = payload["ema_params"]
            kwargs["ema_batch_stats"] = payload.get("ema_batch_stats")
        return state.replace(**kwargs)

    @staticmethod
    def load_weights_into(state, path: str):
        """Weights-only load (reference load_checkpoint, strict=False)."""
        payload = Checkpoints.load(path)
        return state.replace(
            params=payload["params"],
            batch_stats=payload.get("batch_stats", state.batch_stats),
        )


class EarlyStopping:
    """Patience on the scalar 'performance' metric
    (reference: src/utils/early_stopping.py:10-30)."""

    def __init__(self, patience: int = 30):
        self.patience = patience if patience and patience > 0 else float("inf")
        self.best_epoch = 0
        self.best_perf = -float("inf")

    def __call__(self, epoch: int, performance: float) -> bool:
        if performance >= self.best_perf:
            self.best_perf = performance
            self.best_epoch = epoch
        stop = (epoch - self.best_epoch) >= self.patience
        if stop:
            logger.info(
                "early stop at epoch %d (best %.4f @ epoch %d)",
                epoch, self.best_perf, self.best_epoch,
            )
        return stop
