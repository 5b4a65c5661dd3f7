"""Transform-parity additions: perspective warp, mosaic9, photometric det
transforms, seg RandAugment, keypoint pipeline."""
import random

import numpy as np
import pytest

from cvpytorch_tpu.data.transforms import build_transforms
from cvpytorch_tpu.data.transforms.det_transforms import (
    CLAHE, EqualizeHist, RandomAffine, RandomAffineWithMosaic, RandomFog,
    RandomGamma, random_perspective)
from cvpytorch_tpu.data.transforms.seg_transforms import RandAugment
from cvpytorch_tpu.data.transforms import keypoint_transforms as KT


def _det_sample(h=96, w=128, n=5, seed=0):
    rs = np.random.RandomState(seed)
    img = rs.randint(0, 255, (h, w, 3), np.uint8)
    xy = rs.rand(n, 2) * [w * 0.6, h * 0.6]
    wh = rs.rand(n, 2) * [w * 0.3, h * 0.3] + 4
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    labels = rs.randint(0, 10, (n,)).astype(np.int64)
    return {"image": img, "target": {"boxes": boxes, "labels": labels}}


def test_perspective_warp_is_applied():
    random.seed(3)
    s = _det_sample()
    img_p, boxes_p, _ = random_perspective(
        s["image"].copy(), s["target"]["boxes"].copy(),
        s["target"]["labels"].copy(), perspective=(0.001, 0.001))
    random.seed(3)
    img_a, _, _ = random_perspective(
        s["image"].copy(), s["target"]["boxes"].copy(),
        s["target"]["labels"].copy(), perspective=0.0)
    # a non-zero P row must change the output vs the pure-affine path
    assert img_p.shape == img_a.shape
    assert not np.array_equal(img_p, img_a)
    h, w = img_p.shape[:2]
    if len(boxes_p):
        assert (boxes_p[:, [0, 2]] <= w).all() and (boxes_p[:, [1, 3]] <= h).all()
        assert (boxes_p >= 0).all()


def test_random_affine_passes_perspective():
    t = RandomAffine(p=1.0, degrees=5, perspective=(0.0005, 0.0005))
    assert t.kw["perspective"] == (0.0005, 0.0005)


def test_mosaic9():
    random.seed(0)
    t = RandomAffineWithMosaic(p=1.0, degrees=0, translate=0.1, scale=0.2,
                               size=(64, 64))
    out = t([_det_sample(48, 56, 3, seed=i) for i in range(9)])
    assert out["image"].shape == (64, 64, 3)
    b = out["target"]["boxes"]
    assert b.ndim == 2 and b.shape[1] == 4
    assert (b >= 0).all() and (b[:, [0, 2]] <= 64).all()
    # mosaic4 dispatch still works
    out4 = t([_det_sample(48, 56, 3, seed=i) for i in range(4)])
    assert out4["image"].shape == (64, 64, 3)


@pytest.mark.parametrize("cls,kw", [
    (RandomGamma, {}), (EqualizeHist, {}),
    (CLAHE, {"clip_limit": (2.0, 4.0)}), (RandomFog, {}),
])
def test_photometric_transforms(cls, kw):
    random.seed(1)
    np.random.seed(1)
    s = _det_sample()
    before = s["image"].copy()
    out = cls(p=1.0, **kw)(s)
    assert out["image"].shape == before.shape
    assert out["image"].dtype == np.uint8
    assert not np.array_equal(out["image"], before)
    # p=0 is a no-op
    s2 = _det_sample()
    before2 = s2["image"].copy()
    out2 = cls(p=0.0, **kw)(s2)
    assert np.array_equal(out2["image"], before2)


def test_seg_randaugment():
    random.seed(2)
    rs = np.random.RandomState(2)
    img = rs.randint(0, 255, (40, 48, 3), np.uint8)
    mask = rs.randint(0, 4, (40, 48), np.uint8)
    out = RandAugment(p=1.0, n_ops=3, magnitude=0.7, ops="full",
                      ignore_value=255)({"image": img, "target": mask})
    assert out["image"].shape == (40, 48, 3)
    assert out["target"].shape == (40, 48)
    # affine ops may only introduce the ignore fill, never new classes
    assert set(np.unique(out["target"])) <= set(range(4)) | {255}


def test_seg_randaugment_registered():
    tf = build_transforms("SEG_CLASSES", {
        "RandAugment": {"p": 1.0, "n_ops": 2, "magnitude": 0.5}})
    rs = np.random.RandomState(0)
    out = tf({"image": rs.randint(0, 255, (32, 32, 3), np.uint8),
              "target": rs.randint(0, 3, (32, 32), np.uint8)})
    assert out["image"].shape[:2] == (32, 32)


def _kp_sample(h=60, w=80, n=2, k=17, seed=0):
    rs = np.random.RandomState(seed)
    boxes = np.array([[5, 5, 40, 50], [30, 10, 70, 55]], np.float32)[:n]
    kps = np.zeros((n, k, 3), np.float32)
    kps[..., 0] = rs.rand(n, k) * (w - 1)
    kps[..., 1] = rs.rand(n, k) * (h - 1)
    kps[..., 2] = 2.0
    img = rs.randint(0, 255, (h, w, 3), np.uint8)
    return {"image": img,
            "target": {"boxes": boxes, "labels": np.zeros((n,), np.int64),
                       "keypoints": kps}}


def test_keypoint_hflip_mirrors_and_swaps():
    s = _kp_sample()
    orig = s["target"]["keypoints"].copy()
    w = s["image"].shape[1]
    out = KT.RandomHorizontalFlip(p=1.0)(s)
    k = out["target"]["keypoints"]
    # left shoulder (5) lands where right shoulder (6) was, mirrored
    np.testing.assert_allclose(k[:, 5, 0], w - 1 - orig[:, 6, 0], atol=1e-5)
    np.testing.assert_allclose(k[:, 5, 1], orig[:, 6, 1], atol=1e-5)
    b = out["target"]["boxes"]
    assert (b[:, 2] >= b[:, 0]).all()


def test_keypoint_resize_letterbox():
    s = _kp_sample(h=60, w=80)
    orig = s["target"]["keypoints"].copy()
    out = KT.Resize(size=(64, 64))(s)
    assert out["image"].shape[:2] == (64, 64)
    t = out["target"]
    sx, sy = t["scales"]
    ox, oy = t["pads"]
    np.testing.assert_allclose(
        t["keypoints"][..., 0], orig[..., 0] * sx + ox, atol=1e-4)
    np.testing.assert_allclose(
        t["keypoints"][..., 1], orig[..., 1] * sy + oy, atol=1e-4)


def test_keypoint_random_resized_crop_zeroes_offcrop():
    random.seed(0)
    s = _kp_sample()
    out = KT.RandomResizedCrop(size=(48, 48), scale=(0.3, 0.5))(s)
    assert out["image"].shape[:2] == (48, 48)
    k = out["target"]["keypoints"]
    assert k.shape[-1] == 3
    # every still-visible keypoint is inside the letterboxed frame
    vis = k[..., 2] > 0
    assert (k[..., 0][vis] >= 0).all() and (k[..., 0][vis] <= 48).all()


def test_keypoint_crop_with_factor():
    s = _kp_sample(h=50, w=70)
    out = KT.CropWithFactor(size=64, factor=32)(s)
    h, w = out["image"].shape[:2]
    assert h % 32 == 0 and w % 32 == 0
    assert float(out["target"]["scales"][0]) == pytest.approx(64 / 50)


def test_keypoint_namespace_registered():
    tf = build_transforms("KEYPOINT_CLASSES", {
        "Resize": {"size": [32, 32]}, "ToTensor": {}})
    out = tf(_kp_sample())
    assert out["image"].shape[:2] == (32, 32)
