"""End-to-end classification slice: YAML config → Trainer.run() on
synthetic data over the 8-device CPU mesh (config→data→model→loss→eval→ckpt
plumbing, SURVEY §7.2 step 2)."""
import textwrap

import jax
import pytest

from cvpytorch_tpu.config import CommonConfiguration
from cvpytorch_tpu.trainer import Trainer


@pytest.fixture()
def cls_cfg(tmp_path):
    dict_yml = tmp_path / "dict.yml"
    dict_yml.write_text(
        "CLS_CLASSES:\n  - a: 1.0\n  - b: 1.0\n  - c: 1.0\n  - d: 1.0\n"
    )
    cfg_yml = tmp_path / "cfg.yml"
    cfg_yml.write_text(textwrap.dedent(f"""
        EXPERIMENT_NAME: 'cls_smoke'
        DATASET:
          CLASS: 'SyntheticClassification'
          DICTIONARY: '{dict_yml}'
          DICTIONARY_NAME: 'CLS_CLASSES'
          TRAIN:
            LENGTH: 128
            SIZE: [32, 32]
            BATCH_SIZE: 16
            NUM_WORKER: 2
            SHUFFLE: True
            TRANSFORMS:
              RandomHorizontalFlip: {{ p: 0.5 }}
              ToTensor:
              Normalize: {{ mean: [0.485, 0.456, 0.406], std: [0.229, 0.224, 0.225] }}
          VAL:
            LENGTH: 32
            SIZE: [32, 32]
            BATCH_SIZE: 16
            NUM_WORKER: 2
            SHUFFLE: False
            TRANSFORMS:
              ToTensor:
              Normalize: {{ mean: [0.485, 0.456, 0.406], std: [0.229, 0.224, 0.225] }}
        USE_MODEL:
          CLASS: 'src.models.classification.Classification'
          BACKBONE: {{ 'name': 'TinyNet', 'classifier': True }}
        EVALUATOR:
          NAME: 'classification'
          EVAL_TYPE: 'mAcc'
          EVAL_INTERVALS: 2
        CHECKPOINT_DIR: '{tmp_path}/ckpts'
        N_EPOCHS_TO_SAVE_MODEL: 10
        N_MAX_EPOCHS: 6
        INIT_LR: 0.01
        OPTIMIZER:
          TYPE: 'Adam'
          WEIGHT_PARAMS: {{ weight_decay: 0.0001 }}
        LR_SCHEDULER:
          TYPE: 'CosineAnnealingLR'
        WARMUP: {{ NAME: 'linear', ITERS: 4, FACTOR: 0.1 }}
        AMP: False
        EMA: True
        PATIENCE: 100
        GRAD_CLIP: {{ TYPE: 'norm', VALUE: 10.0 }}
        N_ITERS_TO_DISPLAY_STATUS: 2
        TENSORBOARD: False
    """))
    return CommonConfiguration.from_yaml(str(cfg_yml))


def test_trainer_runs_and_learns(cls_cfg):
    trainer = Trainer(cls_cfg)
    trainer.run()
    # after 4 epochs on synthetic blobs the model should beat chance (0.25)
    perf, metrics = trainer.val_epoch(
        99, trainer.state,
        __import__("cvpytorch_tpu.train_state", fromlist=["make_eval_step"]).make_eval_step(use_ema=True),
        None,
    )
    assert perf > 0.4, metrics
    # checkpoints written
    import os

    assert any("best" in d or "last" in d for d in os.listdir(trainer_dir(cls_cfg)))


def trainer_dir(cfg):
    import os

    root = cfg.CHECKPOINT_DIR
    runs = os.listdir(root)
    assert runs
    return os.path.join(root, runs[0])


def test_profiler_hook_writes_trace(cls_cfg, tmp_path):
    """PROFILER YAML block captures a jax.profiler trace window
    (SURVEY §5.1; the reference has no profiling hook)."""
    cls_cfg.PROFILER = CommonConfiguration(
        {"DIR": str(tmp_path / "traces"), "START_STEP": 1, "NUM_STEPS": 2})
    cls_cfg.N_MAX_EPOCHS = 1
    trainer = Trainer(cls_cfg)
    trainer.run()
    import glob

    assert glob.glob(str(tmp_path / "traces" / "**" / "*.xplane.pb"),
                     recursive=True)


def test_trainer_resume_roundtrip(cls_cfg):
    """Full Trainer-level resume (reference trainer.py:319-320 restores
    model/opt/epoch; ours restores params+opt+EMA+step+RNG exactly).
    Phase 1 trains 2 epochs and checkpoints; a RESUME run with the same
    epoch budget restores bit-exact state and trains zero extra steps;
    phase 2 continues to 4 epochs with step continuity."""
    import os

    import numpy as np

    cls_cfg.N_MAX_EPOCHS = 2
    t1 = Trainer(cls_cfg)
    s1 = t1.run()
    steps1 = int(s1.step)
    assert steps1 == 2 * t1.iters_per_epoch
    last = os.path.join(trainer_dir(cls_cfg), "last")

    # resume with the SAME budget: loop body never runs → returned state
    # must be the restored checkpoint, bit-exact vs phase-1 final
    cls_cfg.PRETRAIN_MODEL = last
    cls_cfg.RESUME = True
    t2 = Trainer(cls_cfg)
    s2 = t2.run()
    assert int(s2.step) == steps1
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(s1.ema_params),
                    jax.tree_util.tree_leaves(s2.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # continue training: 2 more epochs, step counter carries on
    cls_cfg.N_MAX_EPOCHS = 4
    t3 = Trainer(cls_cfg)
    s3 = t3.run()
    assert t3.start_epoch == 1  # resumed past epochs 0-1
    assert int(s3.step) == 4 * t3.iters_per_epoch
