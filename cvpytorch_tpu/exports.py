"""Deploy exporters (reference: exports/export_onnx.py:11-35,
exports/export_torchscript.py:12-29 — load ckpt → fuse → trace/export).

TPU-native equivalents (SURVEY §2.9 table): StableHLO via ``jax.export``
and TensorFlow SavedModel via ``jax2tf`` (which itself yields ONNX through
tf2onnx downstream).  Conv+BN fusion (utils.model_utils.fuse_model_conv_bn)
mirrors the reference's ``.fuse()`` step.

CLI: ``python -m cvpytorch_tpu.exports --setting conf/X.yml
--checkpoint ckpt --format stablehlo|savedmodel --out path``
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def export_stablehlo(apply_fn, variables, input_shape, out_path: str,
                     dtype=jnp.float32):
    """Serialize the infer path to portable StableHLO bytes."""
    from jax import export as jexport

    def fn(images):
        return apply_fn(variables, images, mode="infer")

    x = jax.ShapeDtypeStruct(input_shape, dtype)
    exported = jexport.export(jax.jit(fn))(x)
    blob = exported.serialize()
    with open(out_path, "wb") as f:
        f.write(blob)
    return out_path


def export_savedmodel(apply_fn, variables, input_shape, out_dir: str,
                      dtype=jnp.float32):
    """TF SavedModel via jax2tf (ONNX-convertible downstream)."""
    import tensorflow as tf
    from jax.experimental import jax2tf

    def fn(images):
        return apply_fn(variables, images, mode="infer")

    tf_fn = tf.function(
        jax2tf.convert(jax.jit(fn), with_gradient=False),
        input_signature=[tf.TensorSpec(input_shape, tf.as_dtype(np.dtype(dtype)))],
        autograph=False,
    )
    module = tf.Module()
    module.f = tf_fn
    tf.saved_model.save(module, out_dir)
    return out_dir


def load_stablehlo(path: str):
    from jax import export as jexport

    with open(path, "rb") as f:
        return jexport.deserialize(f.read())


def main(argv=None):
    parser = argparse.ArgumentParser("cvpytorch_tpu exports")
    parser.add_argument("--setting", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--format", default="stablehlo",
                        choices=["stablehlo", "savedmodel"])
    parser.add_argument("--out", default="export_out")
    parser.add_argument("--input-size", type=int, nargs=2, default=[640, 640])
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--fuse", action="store_true",
                        help="fuse conv+BN before export (reference .fuse())")
    args = parser.parse_args(argv)

    from .config import CommonConfiguration, load_dictionary
    from .registry import MODELS
    from .utils.checkpoints import Checkpoints
    from . import models as _m  # noqa: F401

    cfg = CommonConfiguration.from_yaml(args.setting)
    dictionary = []
    if cfg.DATASET and cfg.DATASET.DICTIONARY:
        _, dictionary = load_dictionary(cfg.DATASET.DICTIONARY,
                                       cfg.DATASET.DICTIONARY_NAME)
    model = MODELS.get(cfg.USE_MODEL.CLASS)(
        dictionary=tuple(dictionary), model_cfg=cfg.USE_MODEL)
    payload = Checkpoints.load(args.checkpoint)
    params = payload.get("ema_params") or payload["params"]
    batch_stats = payload.get("ema_batch_stats") or payload.get(
        "batch_stats", {})
    if args.fuse:
        from .utils.model_utils import fuse_model_conv_bn

        params, batch_stats = fuse_model_conv_bn(params, batch_stats)
    variables = {"params": params, "batch_stats": batch_stats}
    shape = (args.batch, args.input_size[0], args.input_size[1], 3)
    if args.format == "stablehlo":
        out = export_stablehlo(model.apply, variables, shape,
                               args.out if args.out.endswith(".hlo")
                               else args.out + ".hlo")
    else:
        out = export_savedmodel(model.apply, variables, shape, args.out)
    print(f"exported {args.format} to {out}")


if __name__ == "__main__":
    main()
