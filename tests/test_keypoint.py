"""Keypoint pipeline: heatmap render/decode round-trip, pose models, PCK."""
import jax
import jax.numpy as jnp
import numpy as np

from cvpytorch_tpu.evaluator.keypoint import KeypointEvaluator
from cvpytorch_tpu.models.keypoint import (
    OpenPose,
    SimplePose,
    decode_heatmaps,
    render_gaussian_heatmaps,
)


def test_heatmap_render_decode_roundtrip():
    kps = jnp.array([[[5.0, 9.0], [20.0, 3.0]]])
    valid = jnp.array([[True, True]])
    hm = render_gaussian_heatmaps(kps, valid, (32, 32), sigma=1.5)
    assert hm.shape == (1, 32, 32, 2)
    dec = np.asarray(decode_heatmaps(hm))
    assert np.allclose(dec[0, :, :2], np.asarray(kps[0]), atol=0.5)
    assert (dec[0, :, 2] > 0.9).all()


def test_invalid_keypoints_zero_heatmap():
    kps = jnp.array([[[5.0, 9.0]]])
    hm = render_gaussian_heatmaps(kps, jnp.array([[False]]), (16, 16))
    assert float(jnp.abs(hm).max()) == 0.0


def test_simplepose_contract(rng):
    model = SimplePose(num_keypoints=4)
    imgs = jax.random.normal(rng, (1, 64, 64, 3))
    # ResNet stride 32 + 3 deconvs → heatmaps at stride 4 (16x16 for 64px)
    hm_t = render_gaussian_heatmaps(
        jnp.array([[[4.0, 4], [8, 8], [12, 12], [15, 15]]]),
        jnp.ones((1, 4), bool), (16, 16))
    tgts = {"heatmaps": hm_t, "valid": jnp.ones((1, 4), bool)}
    v = model.init({"params": rng, "dropout": rng}, imgs, tgts, mode="train")
    (loss, ld), _ = model.apply(v, imgs, tgts, mode="train",
                                mutable=["batch_stats"])
    assert np.isfinite(float(loss))
    preds = model.apply(v, imgs, mode="infer")
    assert preds.shape == (1, 4, 3)


def test_openpose_contract(rng):
    """OpenPose renders its own heatmap/PAF targets in-graph from padded
    COCO keypoints (no precomputed fixtures; see test_paf.py for the
    renderer's oracle parity and the trainer e2e)."""
    model = OpenPose(num_stages=2, model_cfg={
        "BACKBONE": {"name": "ResNet", "subtype": "resnet18",
                     "out_stages": (2,)}})
    imgs = jax.random.normal(rng, (1, 64, 64, 3))
    kp = np.zeros((1, 2, 17, 3), np.float32)
    kp[0, :, :, 0] = np.linspace(8, 56, 17)
    kp[0, 0, :, 1] = np.linspace(8, 56, 17)
    kp[0, 1, :, 1] = np.linspace(56, 8, 17)
    kp[..., 2] = 2.0
    tgts = {"keypoints": jnp.asarray(kp), "valid": jnp.ones((1, 2))}
    v = model.init({"params": rng, "dropout": rng}, imgs, tgts, mode="train")
    (loss, ld), _ = model.apply(v, imgs, tgts, mode="train",
                                mutable=["batch_stats"])
    assert np.isfinite(float(loss))
    assert {"heatmap_loss", "paf_loss"} <= set(ld)
    assert float(ld["paf_loss"]) > 0
    out = model.apply(v, imgs, mode="infer")
    assert out["heatmaps"].shape == (1, 8, 8, 19)
    assert out["pafs"].shape == (1, 8, 8, 38)


def test_pck_evaluator():
    ev = KeypointEvaluator(num_keypoints=2, pck_threshold=0.5)
    targets = {"keypoints": np.array([[[10.0, 10], [20, 20]]]),
               "valid": np.array([[True, True]]),
               "bbox_size": np.array([10.0])}
    preds = np.array([[[11.0, 10, 0.9], [40, 40, 0.8]]])  # 1 close, 1 far
    ev.update(targets, preds)
    m = ev.evaluate()
    assert abs(m["PCK"] - 0.5) < 1e-6
    assert 0 <= m["OKS_AP"] <= 1


def test_litepose_contract(rng):
    import jax
    import jax.numpy as jnp

    from cvpytorch_tpu.models.keypoint import LitePose

    model = LitePose(dictionary=({"person": 1.0},), num_keypoints=5,
                     deconv_channels=(32, 16, 16), num_outputs=2)
    imgs = jax.random.normal(rng, (2, 64, 64, 3))
    kp = jnp.concatenate([
        jax.random.uniform(rng, (2, 5, 2), minval=4, maxval=60),
        jnp.full((2, 5, 1), 2.0)], -1)
    t = {"keypoints": kp, "valid": jnp.ones((2, 5), bool)}
    vars_ = model.init(rng, imgs, t, mode="train")
    (loss, losses), _ = model.apply(vars_, imgs, t, mode="train",
                                    mutable=["batch_stats"])
    assert bool(jnp.isfinite(loss)) and "heatmap_loss" in losses
    preds = model.apply(vars_, imgs, mode="infer")
    # final scale is stride 4 on a (2,3,5,7) MobileNetV2 fusion ladder
    assert preds.shape == (2, 5, 3)
    ldict, preds2 = model.apply(vars_, imgs, t, mode="val")
    assert preds2.shape == (2, 5, 3)


def test_simplepose_to_oks_evaluator_e2e(rng):
    """Full keypoint path: heatmap decode → instance bridge → OKS COCO
    evaluator (beyond the reference, whose coco_keypoints branch is never
    wired to a model)."""
    from cvpytorch_tpu.evaluator.coco import CocoEvaluator
    from cvpytorch_tpu.models.keypoint import (decode_heatmaps,
                                               keypoints_to_instances,
                                               render_gaussian_heatmaps)

    K = 17
    kp = np.zeros((1, K, 2), np.float32)
    kp[0, :, 0] = np.linspace(4, 14, K)
    kp[0, :, 1] = np.linspace(3, 13, K)
    hm = render_gaussian_heatmaps(jnp.asarray(kp), jnp.ones((1, K), bool),
                                  (16, 16))
    dec = decode_heatmaps(hm)
    inst = keypoints_to_instances(dec, (64, 64), (16, 16))
    assert inst["keypoints"].shape == (1, 1, K, 3)
    assert bool(inst["valid"][0, 0])

    # GT = the same keypoints in image px → perfect bbox + OKS AP
    gt_k = np.asarray(inst["keypoints"])[:, 0].copy()
    targets = {
        "boxes": np.asarray(inst["boxes"]),
        "labels": np.zeros((1, 1), np.int64),
        "valid": np.ones((1, 1), bool),
        "pads": np.zeros((1, 2)), "scales": np.ones((1, 2)),
        "keypoints": gt_k[:, None],
    }
    ev = CocoEvaluator(num_classes=1, iou_types=("bbox", "keypoints"))
    ev.update(targets, {k: np.asarray(v) for k, v in inst.items()})
    out = ev.evaluate()
    assert out["keypoints_mAP"] == 1.0
    assert out["bbox_mAP"] == 1.0
