"""End-to-end detection: YAML → Trainer.run() with YOLOv5-n on synthetic
boxes (SURVEY §7.2 step 4)."""
import textwrap

from cvpytorch_tpu.config import CommonConfiguration
from cvpytorch_tpu.trainer import Trainer


def test_yolov5_trainer_e2e(tmp_path):
    dict_yml = tmp_path / "dict.yml"
    dict_yml.write_text("DET_CLASSES:\n  - thing: 1.0\n  - stuff: 1.0\n")
    cfg_yml = tmp_path / "cfg.yml"
    cfg_yml.write_text(textwrap.dedent(f"""
        EXPERIMENT_NAME: 'det_smoke'
        DATASET:
          CLASS: 'SyntheticDetection'
          DICTIONARY: '{dict_yml}'
          DICTIONARY_NAME: 'DET_CLASSES'
          MAX_BOXES: 16
          TRAIN:
            LENGTH: 32
            SIZE: [96, 96]
            BATCH_SIZE: 8
            NUM_WORKER: 2
            SHUFFLE: True
            TRANSFORMS:
              Resize: {{ size: [64, 64], keep_ratio: True }}
              RandomHorizontalFlip: {{ p: 0.5 }}
              ToTensor:
              Normalize: {{ mean: [0, 0, 0], std: [1, 1, 1] }}
          VAL:
            LENGTH: 16
            SIZE: [96, 96]
            BATCH_SIZE: 8
            NUM_WORKER: 2
            SHUFFLE: False
            TRANSFORMS:
              Resize: {{ size: [64, 64], keep_ratio: True }}
              ToTensor:
              Normalize: {{ mean: [0, 0, 0], std: [1, 1, 1] }}
        USE_MODEL:
          CLASS: 'src.models.yolov5.YOLOv5'
          TYPE: 'yolov5_n'
          LOSS: {{ 'name': 'YOLOv5Loss', 'hyp_box': 0.05, 'hyp_obj': 1.0, 'hyp_cls': 0.5 }}
        EVALUATOR:
          NAME: 'coco_detection'
          EVAL_TYPE: 'mAP'
          EVAL_INTERVALS: 2
        CHECKPOINT_DIR: '{tmp_path}/ckpts'
        N_MAX_EPOCHS: 2
        INIT_LR: 0.01
        OPTIMIZER:
          TYPE: 'SGD'
          MOMENTUM: 0.9
        LR_SCHEDULER:
          TYPE: 'CosineAnnealingLR'
        AMP: False
        EMA: False
        TENSORBOARD: False
        N_ITERS_TO_DISPLAY_STATUS: 2
    """))
    cfg = CommonConfiguration.from_yaml(str(cfg_yml))
    trainer = Trainer(cfg)
    trainer.run()
    # plumbing check: loss finite, eval produced a mAP dict and checkpoints
    import os

    runs = os.listdir(f"{tmp_path}/ckpts")
    assert runs
    from cvpytorch_tpu.train_state import make_eval_step

    perf, metrics = trainer.val_epoch(99, trainer.state,
                                      make_eval_step(use_ema=False), None)
    assert "mAP" in metrics and perf >= 0.0


def test_yolov5_trainer_device_aug_e2e(tmp_path):
    """DEVICE_AUG path: host only letterboxes LOAD_NUM=4 raw tiles;
    mosaic/affine/HSV/flip/normalize run as one fused XLA program
    (SURVEY §7.1 device-aug north star; reference does all of this on
    host in det_transforms.py)."""
    dict_yml = tmp_path / "dict.yml"
    dict_yml.write_text("DET_CLASSES:\n  - thing: 1.0\n  - stuff: 1.0\n")
    cfg_yml = tmp_path / "cfg.yml"
    cfg_yml.write_text(textwrap.dedent(f"""
        EXPERIMENT_NAME: 'det_devaug_smoke'
        DATASET:
          CLASS: 'SyntheticDetection'
          DICTIONARY: '{dict_yml}'
          DICTIONARY_NAME: 'DET_CLASSES'
          MAX_BOXES: 16
          TRAIN:
            LENGTH: 16
            SIZE: [96, 96]
            BATCH_SIZE: 8
            NUM_WORKER: 2
            SHUFFLE: True
            LOAD_NUM: 4
            DEVICE_AUG: {{ SIZE: 64 }}
          VAL:
            LENGTH: 8
            SIZE: [96, 96]
            BATCH_SIZE: 8
            NUM_WORKER: 2
            SHUFFLE: False
            TRANSFORMS:
              Resize: {{ size: [64, 64], keep_ratio: True }}
              ToTensor:
              Normalize: {{ mean: [0, 0, 0], std: [1, 1, 1] }}
        USE_MODEL:
          CLASS: 'src.models.yolov5.YOLOv5'
          TYPE: 'yolov5_n'
          LOSS: {{ 'name': 'YOLOv5Loss', 'hyp_box': 0.05, 'hyp_obj': 1.0, 'hyp_cls': 0.5 }}
        EVALUATOR:
          NAME: 'coco_detection'
          EVAL_TYPE: 'mAP'
          EVAL_INTERVALS: 5
        CHECKPOINT_DIR: '{tmp_path}/ckpts'
        N_MAX_EPOCHS: 1
        INIT_LR: 0.01
        OPTIMIZER:
          TYPE: 'SGD'
          MOMENTUM: 0.9
        LR_SCHEDULER:
          TYPE: 'CosineAnnealingLR'
        AMP: False
        EMA: False
        TENSORBOARD: False
        N_ITERS_TO_DISPLAY_STATUS: 2
    """))
    cfg = CommonConfiguration.from_yaml(str(cfg_yml))
    trainer = Trainer(cfg)
    state = trainer.run()
    import jax
    import numpy as np

    flat = jax.tree_util.tree_leaves(state.params)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)
