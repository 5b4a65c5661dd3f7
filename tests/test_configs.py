"""Every shipped conf/*.yml must parse, resolve its classes through the
registry, and build its model (data paths are placeholders, so datasets
are not instantiated here)."""
import glob
import os

import jax
import jax.numpy as jnp
import pytest

from cvpytorch_tpu.config import CommonConfiguration, load_dictionary
from cvpytorch_tpu.registry import DATASETS, MODELS
import cvpytorch_tpu.models  # noqa: F401
import cvpytorch_tpu.data.datasets  # noqa: F401

CONF_DIR = os.path.join(os.path.dirname(__file__), "..", "conf")
CONFIGS = sorted(glob.glob(os.path.join(CONF_DIR, "*.yml")))


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.basename(p) for p in CONFIGS])
def test_config_resolves_and_builds(path, rng):
    cfg = CommonConfiguration.from_yaml(path)
    assert cfg.DATASET.CLASS in DATASETS
    assert cfg.USE_MODEL.CLASS in MODELS

    dict_path = cfg.DATASET.DICTIONARY
    if dict_path and not os.path.isabs(dict_path):
        dict_path = os.path.join(CONF_DIR, "..", dict_path)
    dictionary = []
    if dict_path and os.path.exists(dict_path):
        _, dictionary = load_dictionary(dict_path, cfg.DATASET.DICTIONARY_NAME)
        assert len(dictionary) > 0

    import dataclasses

    model_cls = MODELS.get(cfg.USE_MODEL.CLASS)
    extra = {}
    if dataclasses.is_dataclass(model_cls):
        fields = {f.name for f in dataclasses.fields(model_cls)}
        extra = {k: (tuple(v) if isinstance(v, list) else v)
                 for k, v in cfg.USE_MODEL.items()
                 if k in fields and k not in ("dictionary", "model_cfg")}
    model = model_cls(dictionary=tuple(dictionary) or ({"a": 1}, {"b": 1}),
                      model_cfg=cfg.USE_MODEL, **extra)
    assert model is not None
