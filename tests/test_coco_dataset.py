"""COCO dataset JSON parsing + det transform pipeline tests."""
import json

import numpy as np
import pytest

from cvpytorch_tpu.config import CommonConfiguration
from cvpytorch_tpu.data.datasets.coco import CocoDetection
from cvpytorch_tpu.data.transforms.det_transforms import (
    RandomAffineWithMosaic,
    RandomHorizontalFlip,
    Resize,
    make_det_collate,
)


@pytest.fixture()
def tiny_coco(tmp_path):
    import cv2

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    images, annotations = [], []
    for i in range(4):
        img = np.full((50 + i * 10, 80, 3), 100, np.uint8)
        cv2.imwrite(str(img_dir / f"{i}.jpg"), img)
        images.append({"id": i + 1, "file_name": f"{i}.jpg",
                       "height": img.shape[0], "width": img.shape[1]})
        annotations.append({"id": 10 + i, "image_id": i + 1,
                            "category_id": 7, "bbox": [5, 5, 30, 20],
                            "iscrowd": 0, "area": 600})
    # image 4 gets only a crowd ann → filtered out of train
    annotations.append({"id": 99, "image_id": 4, "category_id": 7,
                        "bbox": [0, 0, 10, 10], "iscrowd": 1, "area": 100})
    annotations = [a for a in annotations if a["image_id"] != 4 or a["iscrowd"]]
    ann = {"images": images,
           "annotations": annotations,
           "categories": [{"id": 7, "name": "cat"}, {"id": 9, "name": "dog"}]}
    ann_file = tmp_path / "instances.json"
    ann_file.write_text(json.dumps(ann))
    return CommonConfiguration({
        "IMG_DIR": str(img_dir), "ANN_FILE": str(ann_file),
    })


def test_coco_parsing_and_filtering(tiny_coco):
    ds = CocoDetection(data_cfg=tiny_coco,
                       dictionary=[{"cat": 1.0}, {"dog": 1.0}], stage="train")
    # image 4 (crowd-only) filtered
    assert len(ds) == 3
    s = ds[0]
    t = s["target"]
    assert t["boxes"].shape == (1, 4)
    assert np.allclose(t["boxes"][0], [5, 5, 35, 25])  # xywh → xyxy
    assert t["labels"][0] == 0  # category 7 → 'cat' → 0


def test_coco_val_keeps_empty(tiny_coco):
    ds = CocoDetection(data_cfg=tiny_coco,
                       dictionary=[{"cat": 1.0}, {"dog": 1.0}], stage="val")
    assert len(ds) == 4


def test_letterbox_and_flip_roundtrip(tiny_coco):
    ds = CocoDetection(data_cfg=tiny_coco,
                       dictionary=[{"cat": 1.0}, {"dog": 1.0}], stage="val")
    s = ds[0]
    h0, w0 = s["image"].shape[:2]
    box0 = s["target"]["boxes"][0].copy()
    s = Resize(size=[64, 64], keep_ratio=True)(s)
    assert s["image"].shape[:2] == (64, 64)
    t = s["target"]
    # un-letterbox recovers original box
    pads, scales = t["pads"], t["scales"]
    rec = (t["boxes"][0] - [pads[0], pads[1], pads[0], pads[1]]) / \
        [scales[0], scales[1], scales[0], scales[1]]
    assert np.allclose(rec, box0, atol=1.0)

    before = t["boxes"][0].copy()
    s = RandomHorizontalFlip(p=1.0)(s)
    after = s["target"]["boxes"][0]
    assert np.isclose(after[0], 64 - before[2]) and np.isclose(after[2], 64 - before[0])


def test_mosaic_from_load_num(tiny_coco):
    tiny_coco.update({"LOAD_NUM": 4, "MOSAIC_PROB": 1.0})
    ds = CocoDetection(data_cfg=tiny_coco,
                       dictionary=[{"cat": 1.0}, {"dog": 1.0}],
                       transform=RandomAffineWithMosaic(
                           p=1.0, size=[64, 64], scale=[0.9, 1.1]),
                       stage="train")
    s = ds[0]
    assert s["image"].shape == (64, 64, 3)
    assert s["target"]["boxes"].ndim == 2


def test_det_collate_pads(tiny_coco):
    ds = CocoDetection(data_cfg=tiny_coco,
                       dictionary=[{"cat": 1.0}, {"dog": 1.0}], stage="val")
    collate = make_det_collate(max_boxes=8)
    samples = [Resize([64, 64])(ds[i]) for i in range(2)]
    from cvpytorch_tpu.data.transforms.det_transforms import ToTensor

    samples = [ToTensor()(s) for s in samples]
    batch = collate(samples)
    assert batch["image"].shape == (2, 64, 64, 3)
    t = batch["target"]
    assert t["boxes"].shape == (2, 8, 4)
    assert t["valid"].sum() == 2
    assert batch["image_id"].tolist() == [1, 2]


def test_coco_ram_cache(tiny_coco):
    cfg = CommonConfiguration({**dict(tiny_coco.items()), "CACHE": True})
    ds = CocoDetection(data_cfg=cfg,
                       dictionary=[{"cat": 1.0}, {"dog": 1.0}], stage="train")
    assert ds._cache is not None and len(ds._cache) == len(ds)
    s = ds[0]
    # cached image must be a private copy (transforms mutate in place)
    s["image"][:] = 0
    assert ds[0]["image"].max() > 0
    # second construction loads the persisted disk cache
    ds2 = CocoDetection(data_cfg=cfg,
                        dictionary=[{"cat": 1.0}, {"dog": 1.0}], stage="train")
    assert np.array_equal(ds2[0]["image"], ds[0]["image"])
