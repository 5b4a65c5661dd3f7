"""CLI: params/FLOPs table for a config's model (reference surface:
utils/visualize.py:11 + utils/torchsummary.py:11).

    python scripts/model_summary.py --setting conf/coco_yolov5_s.yml \
        [--size 640]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=1")
    import jax

    jax.config.update("jax_platforms", "cpu")   # summaries never need TPU

    import dataclasses

    from cvpytorch_tpu.config import CommonConfiguration, load_dictionary
    from cvpytorch_tpu.registry import MODELS
    from cvpytorch_tpu.utils.summary import format_summary, model_summary
    import cvpytorch_tpu.models  # noqa: F401  (registers)

    ap = argparse.ArgumentParser()
    ap.add_argument("--setting", required=True)
    ap.add_argument("--size", type=int, default=None,
                    help="square input size (default: a small smoke size)")
    args = ap.parse_args(argv)

    cfg = CommonConfiguration.from_yaml(args.setting)
    dict_path = cfg.DATASET.DICTIONARY
    dictionary = []
    if dict_path and os.path.exists(dict_path):
        _, dictionary = load_dictionary(dict_path,
                                        cfg.DATASET.DICTIONARY_NAME)
    model_cls = MODELS.get(cfg.USE_MODEL.CLASS)
    extra = {}
    if dataclasses.is_dataclass(model_cls):
        fields = {f.name for f in dataclasses.fields(model_cls)}
        extra = {k: (tuple(v) if isinstance(v, list) else v)
                 for k, v in cfg.USE_MODEL.items()
                 if k in fields and k not in ("dictionary", "model_cfg")}
    model = model_cls(dictionary=tuple(dictionary),
                      model_cfg=cfg.USE_MODEL, **extra)
    size = args.size or 128
    info = model_summary(model, (1, size, size, 3))
    print(format_summary(info, name=str(cfg.USE_MODEL.CLASS)))


if __name__ == "__main__":
    main()
