"""Box ops + NMS vs pure-numpy reference implementations."""
import jax.numpy as jnp
import numpy as np
import pytest

from cvpytorch_tpu.ops.boxes import (
    bbox_iou,
    box_iou_matrix,
    cxcywh_to_xyxy,
    unletterbox_boxes,
    xyxy_to_cxcywh,
)
from cvpytorch_tpu.ops.nms import batched_nms


def np_nms(boxes, scores, thr):
    """Sequential reference NMS (torchvision semantics)."""
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if j == i or suppressed[j]:
                continue
            xx1 = max(boxes[i, 0], boxes[j, 0])
            yy1 = max(boxes[i, 1], boxes[j, 1])
            xx2 = min(boxes[i, 2], boxes[j, 2])
            yy2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(xx2 - xx1, 0) * max(yy2 - yy1, 0)
            a1 = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            a2 = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            if inter / (a1 + a2 - inter + 1e-7) > thr:
                suppressed[j] = True
    return keep


def test_format_roundtrip():
    b = jnp.array([[10.0, 20.0, 50.0, 80.0]])
    assert np.allclose(cxcywh_to_xyxy(xyxy_to_cxcywh(b)), b)
    assert np.allclose(xyxy_to_cxcywh(b), [[30, 50, 40, 60]])


def test_iou_matrix_golden():
    a = jnp.array([[0.0, 0, 10, 10]])
    b = jnp.array([[0.0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]])
    m = np.asarray(box_iou_matrix(a, b))
    assert np.allclose(m, [[1.0, 25 / 175, 0.0]], atol=1e-5)


def test_ciou_less_than_iou_for_offset_boxes():
    b1 = jnp.array([[0.0, 0, 10, 10]])
    b2 = jnp.array([[5.0, 5, 15, 15]])
    iou = float(bbox_iou(b1, b2, iou_type="iou")[0])
    ciou = float(bbox_iou(b1, b2, iou_type="ciou")[0])
    giou = float(bbox_iou(b1, b2, iou_type="giou")[0])
    assert ciou < iou and giou < iou
    # identical boxes → all 1
    assert abs(float(bbox_iou(b1, b1, iou_type="ciou")[0]) - 1) < 1e-5


def test_unletterbox():
    boxes = jnp.array([[20.0, 10, 120, 110]])
    pads = jnp.array([20.0, 10])     # (pad_w, pad_h)
    scales = jnp.array([2.0, 2.0])
    out = np.asarray(unletterbox_boxes(boxes, pads, scales))
    assert np.allclose(out, [[0, 0, 50, 50]])


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_batched_nms_matches_sequential(seed):
    rng = np.random.RandomState(seed)
    n = 60
    centers = rng.rand(n, 2) * 100
    wh = rng.rand(n, 2) * 30 + 5
    boxes = np.concatenate([centers - wh / 2, centers + wh / 2], -1).astype(np.float32)
    scores = rng.rand(n).astype(np.float32)
    ref_keep = np_nms(boxes, scores, 0.5)

    out = batched_nms(
        jnp.asarray(boxes)[None], jnp.asarray(scores)[None],
        jnp.zeros((1, n), jnp.int32),
        max_det=n, iou_threshold=0.5, score_threshold=0.0, max_nms=n,
    )
    got_boxes = np.asarray(out["boxes"][0])[np.asarray(out["valid"][0])]
    ref_boxes = boxes[ref_keep]
    assert got_boxes.shape == ref_boxes.shape
    assert np.allclose(np.sort(got_boxes.ravel()), np.sort(ref_boxes.ravel()),
                       atol=1e-4)


def test_batched_nms_class_aware():
    # identical overlapping boxes, different classes → both survive
    boxes = jnp.array([[[0.0, 0, 10, 10], [1, 1, 11, 11]]])
    scores = jnp.array([[0.9, 0.8]])
    labels = jnp.array([[0, 1]])
    out = batched_nms(boxes, scores, labels, max_det=2, iou_threshold=0.5,
                      score_threshold=0.0, max_nms=2)
    assert int(out["num"][0]) == 2
    # same class → one suppressed
    out2 = batched_nms(boxes, scores, jnp.array([[0, 0]]), max_det=2,
                       iou_threshold=0.5, score_threshold=0.0, max_nms=2)
    assert int(out2["num"][0]) == 1


def test_batched_nms_score_threshold_and_padding():
    boxes = jnp.array([[[0.0, 0, 10, 10], [20, 20, 30, 30]]])
    scores = jnp.array([[0.9, 0.0001]])
    labels = jnp.zeros((1, 2), jnp.int32)
    out = batched_nms(boxes, scores, labels, max_det=5, iou_threshold=0.5,
                      score_threshold=0.01, max_nms=2)
    assert int(out["num"][0]) == 1
    assert out["boxes"].shape == (1, 5, 4)
    assert not bool(out["valid"][0, 1])
    assert int(out["labels"][0, 4]) == -1
