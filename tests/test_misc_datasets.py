"""Format adapters: ADE20K offset, VisDrone txt, WiderFace list, PennFudan masks."""
import os

import cv2
import numpy as np
import pytest

from cvpytorch_tpu.config import CommonConfiguration
from cvpytorch_tpu.data.datasets.misc_datasets import (
    ADE20KSegmentation,
    PennFudanDetection,
    VisDroneDetection,
    WiderFaceDetection,
)


def test_ade20k_mask_offset(tmp_path):
    (tmp_path / "imgs").mkdir()
    (tmp_path / "anns").mkdir()
    cv2.imwrite(str(tmp_path / "imgs" / "a.jpg"), np.zeros((8, 8, 3), np.uint8))
    mask = np.array([[0, 1], [2, 3]], np.uint8).repeat(4, 0).repeat(4, 1)
    cv2.imwrite(str(tmp_path / "anns" / "a.png"), mask)
    ds = ADE20KSegmentation(
        data_cfg=CommonConfiguration({"IMG_DIR": str(tmp_path / "imgs"),
                                      "LABELS": {"SEG_DIR": str(tmp_path / "anns")}}),
        dictionary=[{"x": 1.0}] * 3)
    t = ds[0]["target"]
    assert t[0, 0] == 255      # raw 0 → ignore
    assert t[0, 4] == 0        # raw 1 → class 0
    assert t[4, 4] == 2        # raw 3 → class 2


def test_visdrone_txt(tmp_path):
    (tmp_path / "images").mkdir()
    (tmp_path / "annotations").mkdir()
    cv2.imwrite(str(tmp_path / "images" / "v.jpg"), np.zeros((32, 32, 3), np.uint8))
    (tmp_path / "annotations" / "v.txt").write_text(
        "5,5,10,10,1,2,0,0\n0,0,5,5,1,0,0,0\n")  # cat 0 filtered
    ds = VisDroneDetection(
        data_cfg=CommonConfiguration({"IMG_DIR": str(tmp_path / "images")}),
        dictionary=[{"c": 1.0}] * 10)
    t = ds[0]["target"]
    assert t["boxes"].shape == (1, 4)
    assert np.allclose(t["boxes"][0], [5, 5, 15, 15])
    assert t["labels"][0] == 1


def test_widerface_list(tmp_path):
    (tmp_path / "sub").mkdir(parents=True)
    cv2.imwrite(str(tmp_path / "sub" / "f.jpg"), np.zeros((16, 16, 3), np.uint8))
    ann = tmp_path / "gt.txt"
    ann.write_text("sub/f.jpg\n2\n1 1 5 5 0 0\n8 8 6 6 0 0\n")
    ds = WiderFaceDetection(
        data_cfg=CommonConfiguration({"IMG_DIR": str(tmp_path),
                                      "ANN_FILE": str(ann)}),
        dictionary=[{"face": 1.0}])
    t = ds[0]["target"]
    assert t["boxes"].shape == (2, 4)
    assert np.allclose(t["boxes"][1], [8, 8, 14, 14])


def test_pennfudan_masks(tmp_path):
    (tmp_path / "PNGImages").mkdir()
    (tmp_path / "PedMasks").mkdir()
    cv2.imwrite(str(tmp_path / "PNGImages" / "p.png"),
                np.zeros((20, 20, 3), np.uint8))
    mask = np.zeros((20, 20), np.uint8)
    mask[2:8, 2:8] = 1
    mask[10:18, 10:18] = 2
    cv2.imwrite(str(tmp_path / "PedMasks" / "p_mask.png"), mask)
    ds = PennFudanDetection(
        data_cfg=CommonConfiguration({"IMG_DIR": str(tmp_path)}),
        dictionary=[{"person": 1.0}])
    t = ds[0]["target"]
    assert t["boxes"].shape == (2, 4)
    assert np.allclose(t["boxes"][0], [2, 2, 8, 8])
    assert t["masks"].shape == (2, 112, 112)
    assert t["masks"][0].max() == 1.0


def test_visdrone_track(tmp_path):
    import cv2
    import numpy as np

    from cvpytorch_tpu.config import CommonConfiguration
    from cvpytorch_tpu.data.datasets.misc_datasets import VisDroneTrack

    seq = tmp_path / "sequences" / "uav001"
    seq.mkdir(parents=True)
    ann_dir = tmp_path / "annotations"
    ann_dir.mkdir()
    for f in (1, 2):
        cv2.imwrite(str(seq / f"{f:07d}.jpg"),
                    np.full((40, 60, 3), 90, np.uint8))
    (ann_dir / "uav001.txt").write_text(
        "1,5,10,10,20,15,1,1,0,0\n"     # frame 1, track 5, cat 1
        "1,6,30,5,15,10,1,2,0,0\n"      # frame 1, track 6, cat 2
        "2,5,12,11,20,15,1,1,0,0\n"     # frame 2, track 5
        "1,9,0,0,5,5,1,0,0,0\n")        # cat 0 = ignored region
    ds = VisDroneTrack(
        data_cfg=CommonConfiguration({"IMG_DIR": str(tmp_path)}),
        dictionary=[{"ped": 1.0}, {"person": 1.0}], stage="train")
    assert len(ds) == 2
    t0 = ds[0]["target"]
    assert t0["boxes"].shape == (2, 4)
    assert list(t0["track_ids"]) == [5, 6]
    t1 = ds[1]["target"]
    assert list(t1["track_ids"]) == [5]
    assert np.allclose(t1["boxes"][0], [12, 11, 32, 26])
