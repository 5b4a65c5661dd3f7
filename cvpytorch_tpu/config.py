"""Configuration system.

TPU-native re-implementation of the reference's YAML config layer
(reference: src/utils/config.py:14-138).  Semantics preserved:

* ``Configuration`` — a dict with attribute access and *recursive* update,
  nested dicts become ``Configuration`` instances.
* ``CommonConfiguration`` — adds ``from_yaml`` / ``from_json`` / ``from_dict``
  constructors and the soft-miss behaviour the whole trainer relies on:
  reading an absent key returns ``None`` (with a one-time warning) instead of
  raising, so ``cfg.PRETRAIN_MODEL is not None`` style guards work with
  sparse YAML files (reference: src/utils/config.py:104-110).

Keys are UPPERCASE by convention (``DATASET.CLASS``, ``USE_MODEL.CLASS``,
``TRANSFORMS`` …) — see the reference's conf/*.yml schema.
"""
from __future__ import annotations

import copy
import json
import logging
from collections import UserDict
from typing import Any, Mapping

import yaml

logger = logging.getLogger("cvpytorch_tpu")


class Configuration(UserDict):
    """Dict with attribute access; nested mappings auto-wrap."""

    def __init__(self, initial: Mapping[str, Any] | None = None, **kwargs):
        super().__init__()
        if initial:
            self.update(initial)
        if kwargs:
            self.update(kwargs)

    # -- attribute access -------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        if name.startswith("_") or name == "data":
            raise AttributeError(name)
        try:
            return self.data[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name: str, value: Any) -> None:
        if name == "data" or name.startswith("_"):
            super().__setattr__(name, value)
        else:
            self[name] = value

    def __setitem__(self, key: str, value: Any) -> None:
        self.data[key] = self._wrap(value)

    @classmethod
    def _wrap(cls, value: Any) -> Any:
        if isinstance(value, Configuration):
            return value
        if isinstance(value, Mapping):
            return cls(value)
        if isinstance(value, (list, tuple)):
            return type(value)(cls._wrap(v) for v in value)
        return value

    # -- recursive update (reference: config.py:46-57) --------------------
    def update(self, other=None, **kwargs):  # type: ignore[override]
        merged = {}
        if other:
            merged.update(dict(other))
        merged.update(kwargs)
        for key, value in merged.items():
            if (
                key in self.data
                and isinstance(self.data[key], Configuration)
                and isinstance(value, Mapping)
            ):
                self.data[key].update(value)
            else:
                self[key] = value

    def to_dict(self) -> dict:
        out = {}
        for k, v in self.data.items():
            if isinstance(v, Configuration):
                out[k] = v.to_dict()
            elif isinstance(v, (list, tuple)):
                out[k] = type(v)(
                    i.to_dict() if isinstance(i, Configuration) else i for i in v
                )
            else:
                out[k] = v
        return out

    def clone(self) -> "Configuration":
        return type(self)(copy.deepcopy(self.to_dict()))


class CommonConfiguration(Configuration):
    """Configuration with soft-missing keys and file constructors.

    Missing attribute/key reads return ``None`` and log a warning once per
    key — matching the reference trainer's pervasive
    ``if cfg.SOME_OPTIONAL_KEY is not None`` pattern
    (reference: src/utils/config.py:99-138, trainer.py:318).
    """

    _warned: set

    def __init__(self, initial: Mapping[str, Any] | None = None, **kwargs):
        super().__setattr__("_warned", set())
        super().__init__(initial, **kwargs)

    def __getattr__(self, name: str) -> Any:
        if name.startswith("_") or name == "data":
            raise AttributeError(name)
        if name in self.data:
            return self.data[name]
        if name not in self._warned:
            self._warned.add(name)
            logger.debug("config key %r missing; returning None", name)
        return None

    def get(self, key, default=None):
        return self.data.get(key, default)

    @classmethod
    def _wrap(cls, value: Any) -> Any:
        # nested nodes share the soft-miss behaviour
        if isinstance(value, CommonConfiguration):
            return value
        if isinstance(value, Mapping):
            return cls(value)
        if isinstance(value, (list, tuple)):
            return type(value)(cls._wrap(v) for v in value)
        return value

    # -- constructors (reference: config.py:112-138) ----------------------
    @classmethod
    def from_yaml(cls, path: str) -> "CommonConfiguration":
        with open(path, "r") as f:
            payload = yaml.safe_load(f) or {}
        return cls(payload)

    @classmethod
    def from_json(cls, path: str) -> "CommonConfiguration":
        with open(path, "r") as f:
            payload = json.load(f)
        return cls(payload)

    @classmethod
    def from_dict(cls, payload: Mapping[str, Any]) -> "CommonConfiguration":
        return cls(payload)


def load_dictionary(path: str, task: str | None = None) -> list[dict]:
    """Load a class-dictionary yml (reference: conf/dicts/*_dict.yml).

    Returns ``(task_key, classes)`` — the list under the task key
    (CLS_CLASSES / SEG_CLASSES / DET_CLASSES / INS_CLASSES /
    KEYPOINT_CLASSES); each element is a one-item mapping
    ``{class_name: loss_weight}``.  Some reference dicts (voc, pennfudan,
    pet) carry several task sections in one file — pass ``task`` (the
    config's DICTIONARY_NAME) to select, as the reference loader does.
    """
    with open(path, "r") as f:
        payload = yaml.safe_load(f)
    if not isinstance(payload, Mapping) or not payload:
        raise ValueError(f"dictionary yml must map task keys: {path}")
    if task is not None and task in payload:
        return task, payload[task]
    if len(payload) != 1:
        raise ValueError(
            f"dictionary yml has {len(payload)} task keys; pass the "
            f"DICTIONARY_NAME to select one: {path}")
    (task_key, classes), = payload.items()
    return task_key, classes


def dictionary_to_names_weights(classes: list) -> tuple[list[str], list[float]]:
    """Flatten [{name: weight}, ...] into (names, weights)."""
    names, weights = [], []
    for item in classes:
        if isinstance(item, Mapping):
            (name, weight), = item.items()
        else:
            name, weight = str(item), 1.0
        names.append(name)
        weights.append(float(weight))
    return names, weights
