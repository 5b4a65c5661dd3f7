"""End-to-end segmentation: YAML → Trainer.run() with UNet on synthetic
rectangles (SURVEY §7.2 step 3)."""
import textwrap

import pytest

from cvpytorch_tpu.config import CommonConfiguration
from cvpytorch_tpu.trainer import Trainer


def test_unet_trainer_e2e(tmp_path):
    dict_yml = tmp_path / "dict.yml"
    dict_yml.write_text("SEG_CLASSES:\n  - background: 1.0\n  - box: 1.0\n")
    cfg_yml = tmp_path / "cfg.yml"
    cfg_yml.write_text(textwrap.dedent(f"""
        EXPERIMENT_NAME: 'seg_smoke'
        DATASET:
          CLASS: 'SyntheticSegmentation'
          DICTIONARY: '{dict_yml}'
          DICTIONARY_NAME: 'SEG_CLASSES'
          TRAIN:
            LENGTH: 64
            SIZE: [32, 32]
            BATCH_SIZE: 8
            NUM_WORKER: 2
            SHUFFLE: True
            TRANSFORMS:
              RandomHorizontalFlip: {{ p: 0.5 }}
              ToTensor:
              Normalize: {{ mean: [0.485, 0.456, 0.406], std: [0.229, 0.224, 0.225] }}
          VAL:
            LENGTH: 16
            SIZE: [32, 32]
            BATCH_SIZE: 8
            NUM_WORKER: 2
            SHUFFLE: False
            TRANSFORMS:
              ToTensor:
              Normalize: {{ mean: [0.485, 0.456, 0.406], std: [0.229, 0.224, 0.225] }}
        USE_MODEL:
          CLASS: 'src.models.unet.UNet'
          base_channels: 8
          depth: 2
        EVALUATOR:
          NAME: 'segmentation'
          EVAL_TYPE: 'mIoU'
          EVAL_INTERVALS: 2
        CHECKPOINT_DIR: '{tmp_path}/ckpts'
        N_MAX_EPOCHS: 4
        INIT_LR: 0.01
        OPTIMIZER:
          TYPE: 'Adam'
        LR_SCHEDULER:
          TYPE: 'PolyLR'
          POWER: 0.9
        AMP: False
        EMA: False
        TENSORBOARD: False
        N_ITERS_TO_DISPLAY_STATUS: 4
    """))
    cfg = CommonConfiguration.from_yaml(str(cfg_yml))
    trainer = Trainer(cfg)
    trainer.run()
    from cvpytorch_tpu.train_state import make_eval_step

    perf, metrics = trainer.val_epoch(99, trainer.state,
                                      make_eval_step(use_ema=False), None)
    # rectangles on dark background: should segment well above chance fast
    assert perf > 0.4, metrics
