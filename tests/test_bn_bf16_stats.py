"""AMP_BN_BF16_STATS knob (PERF.md r5 ledger): drops the f32 up-convert
on BN batch-moment reductions.  Brick-level gate semantics + Trainer
YAML wiring.  Accuracy/perf evidence: flagship-640 convergence + 861->940
img/s A/B, both measured on-chip (PERF.md)."""
import os
import textwrap

import jax.numpy as jnp
import numpy as np
import pytest

from cvpytorch_tpu.models.bricks import BatchNorm


def _apply_bn(x):
    bn = BatchNorm(use_running_average=False, momentum=0.97, epsilon=1e-3,
                   dtype=jnp.bfloat16)
    variables = bn.init(jax.random.PRNGKey(0), x)
    y, mutated = bn.apply(variables, x, mutable=["batch_stats"])
    return np.asarray(y, np.float32), mutated["batch_stats"]


import jax  # noqa: E402  (after jnp to keep the import block tight)


@pytest.fixture()
def _clean_env(monkeypatch):
    monkeypatch.delenv("CVT_BN_BF16_STATS", raising=False)


def test_gate_changes_moment_precision(_clean_env, monkeypatch):
    # bf16 input whose VALUES are representable (N(1, 0.5); bf16 ulp at
    # 1.0 is ~0.004) but whose 4096-element moment REDUCTION loses
    # precision when accumulated in bf16 instead of f32.  (A large-offset
    # trick like 256+0.05·randn doesn't work: casting the input to bf16
    # rounds every element to exactly 256 before the reduction even runs.)
    rng = np.random.RandomState(0)
    x = (1.0 + rng.randn(4, 16, 16, 8) * 0.5).astype(np.float32)
    xb = jnp.asarray(x, jnp.bfloat16)
    xf = np.asarray(xb, np.float32)  # oracle over the actual bf16 values

    y_f32, stats_f32 = _apply_bn(xb)
    monkeypatch.setenv("CVT_BN_BF16_STATS", "1")
    y_bf16, stats_bf16 = _apply_bn(xb)

    # Same contract (shape/dtype; running stats still stored f32)...
    assert y_bf16.shape == y_f32.shape
    assert stats_bf16["mean"].dtype == jnp.float32
    assert stats_bf16["var"].dtype == jnp.float32
    # ...but genuinely different reduction precision (measured: max
    # output delta ~0.047 on this input).
    assert not np.allclose(y_bf16, y_f32, atol=1e-3), (
        "bf16-stat gate had no effect on the computed moments")
    # and the f32 path matches the exact-moment oracle far better than
    # the bf16 path (measured: 0.008 vs 0.051).
    mu = xf.mean((0, 1, 2))
    var = xf.var((0, 1, 2))
    ref = (xf - mu) / np.sqrt(var + 1e-3)
    err_f32 = np.abs(y_f32 - ref).max()
    err_bf16 = np.abs(y_bf16 - ref).max()
    assert err_f32 < 0.02 < err_bf16, (err_f32, err_bf16)


def test_trainer_yaml_knob_sets_and_clears_env(_clean_env, tmp_path):
    from cvpytorch_tpu.config import CommonConfiguration
    from cvpytorch_tpu.trainer import Trainer

    dict_yml = tmp_path / "dict.yml"
    dict_yml.write_text("CLS_CLASSES:\n  - a: 1.0\n  - b: 1.0\n")

    def make_cfg(knob):
        cfg_yml = tmp_path / f"cfg_{knob}.yml"
        cfg_yml.write_text(textwrap.dedent(f"""
            EXPERIMENT_NAME: 'bn_knob'
            AMP_BN_BF16_STATS: {knob}
            DATASET:
              CLASS: 'SyntheticClassification'
              DICTIONARY: '{dict_yml}'
              DICTIONARY_NAME: 'CLS_CLASSES'
              TRAIN:
                LENGTH: 8
                SIZE: [16, 16]
                BATCH_SIZE: 4
                NUM_WORKER: 1
                TRANSFORMS:
                  ToTensor:
              VAL:
                LENGTH: 8
                SIZE: [16, 16]
                BATCH_SIZE: 4
                NUM_WORKER: 1
                TRANSFORMS:
                  ToTensor:
            USE_MODEL:
              CLASS: 'src.models.classification.Classification'
              BACKBONE: {{ 'name': 'TinyNet', 'classifier': True }}
            CHECKPOINT_DIR: '{tmp_path}/ckpts'
            N_MAX_EPOCHS: 1
            INIT_LR: 0.01
            OPTIMIZER: {{ TYPE: 'SGD' }}
            LR_SCHEDULER: {{ TYPE: 'CosineAnnealingLR' }}
        """))
        return CommonConfiguration.from_yaml(str(cfg_yml))

    Trainer(make_cfg("True"))
    assert os.environ.get("CVT_BN_BF16_STATS") == "1"
    Trainer(make_cfg("False"))  # a later Trainer must not inherit it
    assert "CVT_BN_BF16_STATS" not in os.environ
