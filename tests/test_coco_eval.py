"""COCO mAP evaluator golden tests (hand-computable cases)."""
import numpy as np

from cvpytorch_tpu.evaluator.coco import CocoEvaluator, _ap_per_class, IOU_THRS


def _pack(boxes, scores, labels):
    return (np.asarray(boxes, np.float32).reshape(-1, 4),
            np.asarray(scores, np.float32), np.asarray(labels))


def test_perfect_detection_ap_1():
    gts = [(np.array([[0.0, 0, 10, 10]]), np.array([0]))]
    dets = [_pack([[0.0, 0, 10, 10]], [0.9], [0])]
    ap = _ap_per_class(dets, gts, 1)
    assert np.allclose(ap, 1.0)


def test_miss_detection_ap_0():
    gts = [(np.array([[0.0, 0, 10, 10]]), np.array([0]))]
    dets = [_pack(np.zeros((0, 4)), [], [])]
    ap = _ap_per_class(dets, gts, 1)
    assert np.allclose(ap, 0.0)


def test_iou_threshold_sensitivity():
    # detection with IoU ~0.68 vs gt: TP at 0.5/0.65, FP at 0.7+
    gts = [(np.array([[0.0, 0, 10, 10]]), np.array([0]))]
    dets = [_pack([[0.0, 0, 10, 6.8]], [0.9], [0])]
    ap = _ap_per_class(dets, gts, 1)[0]
    assert ap[0] == 1.0        # @0.5
    assert ap[-1] == 0.0       # @0.95
    assert 0 < np.nanmean(ap) < 1


def test_false_positive_lowers_precision():
    gts = [(np.array([[0.0, 0, 10, 10]]), np.array([0]))]
    # high-scoring FP before the TP
    dets = [_pack([[50.0, 50, 60, 60], [0, 0, 10, 10]], [0.95, 0.9], [0, 0])]
    ap = _ap_per_class(dets, gts, 1)[0, 0]
    # 101-pt interpolation: precision 0.5 for all recall points
    assert abs(ap - 0.5) < 0.01


def test_class_confusion():
    gts = [(np.array([[0.0, 0, 10, 10]]), np.array([1]))]
    dets = [_pack([[0.0, 0, 10, 10]], [0.9], [0])]  # wrong class
    ap = _ap_per_class(dets, gts, 2)
    assert np.isnan(ap[0]).all()       # class 0 absent from GT
    assert np.allclose(ap[1], 0.0)     # class 1 undetected


def test_evaluator_end_to_end_padded():
    ev = CocoEvaluator(num_classes=2)
    targets = {
        "boxes": np.array([[[0.0, 0, 10, 10], [20, 20, 30, 30],
                            [0, 0, 0, 0]]]),
        "labels": np.array([[0, 1, 0]]),
        "valid": np.array([[True, True, False]]),
        "pads": np.zeros((1, 2)), "scales": np.ones((1, 2)),
    }
    preds = {
        "boxes": np.array([[[0.0, 0, 10, 10], [20, 20, 30, 30],
                            [0, 0, 0, 0]]]),
        "scores": np.array([[0.9, 0.8, 0.0]]),
        "labels": np.array([[0, 1, -1]]),
        "valid": np.array([[True, True, False]]),
    }
    ev.update(targets, preds)
    m = ev.evaluate()
    assert abs(m["mAP"] - 1.0) < 1e-6
    assert m["performance"] == m["mAP"]


def test_unletterbox_gt():
    ev = CocoEvaluator(num_classes=1)
    # network box [20,10,120,110] with pad (20,10), scale 2 → orig [0,0,50,50]
    targets = {
        "boxes": np.array([[[20.0, 10, 120, 110]]]),
        "labels": np.array([[0]]),
        "valid": np.array([[True]]),
        "pads": np.array([[20.0, 10.0]]),
        "scales": np.array([[2.0, 2.0]]),
    }
    preds = {
        "boxes": np.array([[[0.0, 0, 50, 50]]]),  # already original space
        "scores": np.array([[0.9]]),
        "labels": np.array([[0]]),
        "valid": np.array([[True]]),
    }
    ev.update(targets, preds)
    assert abs(ev.evaluate()["mAP"] - 1.0) < 1e-6


def test_voc_evaluator_golden():
    from cvpytorch_tpu.evaluator.voc import VOCEvaluator

    ev = VOCEvaluator(num_classes=1)
    targets = {
        "boxes": np.array([[[0.0, 0, 10, 10], [20, 20, 30, 30]]]),
        "labels": np.array([[0, 0]]),
        "valid": np.array([[True, True]]),
        "pads": np.zeros((1, 2)), "scales": np.ones((1, 2)),
    }
    preds = {
        "boxes": np.array([[[0.0, 0, 10, 10], [50, 50, 60, 60]]]),
        "scores": np.array([[0.9, 0.8]]),
        "labels": np.array([[0, 0]]),
        "valid": np.array([[True, True]]),
    }
    ev.update(targets, preds)
    m = ev.evaluate()
    # 1 TP at recall 0.5 precision 1.0, then FP: AP = 0.5
    assert abs(m["mAP"] - 0.5) < 1e-6
