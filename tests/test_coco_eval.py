"""COCO evaluator golden tests — hand-computed COCOeval-protocol cases
(area ranges, AR@[1,10,100], maxDets, crowd handling; VERDICT r1 #4)."""
import numpy as np

from cvpytorch_tpu.evaluator.coco import (
    COCOEvalNative, CocoEvaluator, IOU_THRS,
)


def _eval1(gt_boxes, gt_labels, det_boxes, det_scores, det_labels,
           num_classes=1, gt_crowd=None):
    ev = COCOEvalNative(num_classes)
    ev.add_image(gt_boxes, gt_labels, det_boxes, det_scores, det_labels,
                 gt_crowd=gt_crowd)
    return ev.summarize()


def test_perfect_detection_ap_1():
    s = _eval1([[0.0, 0, 10, 10]], [0], [[0.0, 0, 10, 10]], [0.9], [0])
    assert abs(s["mAP"] - 1.0) < 1e-9
    assert abs(s["Recall_100"] - 1.0) < 1e-9
    # 10×10 box is small-area; medium/large have no GT → -1 sentinel
    assert abs(s["AP_small"] - 1.0) < 1e-9
    assert s["AP_medium"] == -1.0
    assert s["AP_large"] == -1.0


def test_miss_detection_ap_0():
    s = _eval1([[0.0, 0, 10, 10]], [0], np.zeros((0, 4)), [], [])
    assert s["mAP"] == 0.0
    assert s["Recall_100"] == 0.0


def test_iou_threshold_sensitivity():
    # det IoU = 0.68 vs gt: TP at thresholds ≤ 0.65, FP above
    s = _eval1([[0.0, 0, 10, 10]], [0], [[0.0, 0, 10, 6.8]], [0.9], [0])
    n_pass = int((IOU_THRS <= 0.68).sum())  # 4 of 10
    assert abs(s["mAP"] - n_pass / len(IOU_THRS)) < 1e-9
    assert abs(s["AP_50"] - 1.0) < 1e-9
    assert s["AP_75"] == 0.0


def test_false_positive_lowers_precision():
    s = _eval1([[0.0, 0, 10, 10]], [0],
               [[50.0, 50, 60, 60], [0, 0, 10, 10]], [0.95, 0.9], [0, 0])
    # 101-pt interpolation: precision 0.5 at every recall point
    assert abs(s["AP_50"] - 0.5) < 0.01


def test_class_confusion():
    ev = COCOEvalNative(2)
    ev.add_image([[0.0, 0, 10, 10]], [1], [[0.0, 0, 10, 10]], [0.9], [0])
    s = ev.summarize()
    # class 0 has no GT (excluded); class 1 undetected → mAP 0
    assert s["mAP"] == 0.0


def test_area_ranges():
    # one small (20×20=400 < 32²) and one large (200×200 > 96²) GT,
    # only the small one detected
    gt = [[0.0, 0, 20, 20], [100, 100, 300, 300]]
    s = _eval1(gt, [0, 0], [[0.0, 0, 20, 20]], [0.9], [0])
    assert abs(s["AP_small"] - 1.0) < 1e-9
    assert s["AP_large"] == 0.0
    assert s["AP_medium"] == -1.0
    assert abs(s["Recall_small"] - 1.0) < 1e-9
    assert s["Recall_large"] == 0.0
    # overall: recall caps at 0.5 → AP = 0.5 (envelope precision 1 up to .5)
    assert abs(s["mAP"] - 0.5) < 0.01


def test_maxdets_recall_sweep():
    # two GTs, two perfect dets → Recall_1 = 0.5 (only top det), others 1.0
    gt = [[0.0, 0, 50, 50], [100.0, 100, 150, 150]]
    dets = [[0.0, 0, 50, 50], [100.0, 100, 150, 150]]
    s = _eval1(gt, [0, 0], dets, [0.9, 0.8], [0, 0])
    assert abs(s["Recall_1"] - 0.5) < 1e-9
    assert abs(s["Recall_10"] - 1.0) < 1e-9
    assert abs(s["Recall_100"] - 1.0) < 1e-9


def test_crowd_gt_ignores_matched_dets():
    # crowd GT covers the det region; a second non-crowd GT is missed.
    # The det matching the crowd is neither TP nor FP; the non-crowd GT
    # drives recall/AP to 0 without a false positive penalty elsewhere.
    gt = [[0.0, 0, 100, 100], [200.0, 200, 240, 240]]
    s = _eval1(gt, [0, 0], [[10.0, 10, 60, 60]], [0.9], [0],
               gt_crowd=[True, False])
    assert s["mAP"] == 0.0
    assert s["Recall_100"] == 0.0
    # now add a det on the real GT: AP must be 1.0 — the crowd-matched det
    # must NOT count as a false positive ahead of the true positive
    s2 = _eval1(gt, [0, 0],
                [[10.0, 10, 60, 60], [200.0, 200, 240, 240]],
                [0.9, 0.8], [0, 0], gt_crowd=[True, False])
    assert abs(s2["mAP"] - 1.0) < 1e-9


def test_crowd_iou_uses_det_area():
    # det fully inside a big crowd region: IoU(crowd) = inter/det_area = 1
    # → matched-ignored even though normal IoU would be tiny
    gt = [[0.0, 0, 1000, 1000]]
    s = _eval1(gt, [0], [[10.0, 10, 20, 20]], [0.9], [0],
               gt_crowd=[True])
    # only ignored GT → no non-ignored GT anywhere → class excluded
    assert s["mAP"] == -1.0


def test_second_match_to_same_gt_is_fp():
    gt = [[0.0, 0, 50, 50]]
    dets = [[0.0, 0, 50, 50], [1.0, 1, 51, 51]]
    s = _eval1(gt, [0], dets, [0.9, 0.8], [0, 0])
    # duplicate counts as FP after recall 1.0 → AP stays 1.0 (envelope),
    # 101-pt: precision at recall 1.0 is max(1.0, 0.5) = 1.0
    assert abs(s["AP_50"] - 1.0) < 1e-9


def test_mask_ap_segm():
    m_gt = np.zeros((1, 64, 64), bool)
    m_gt[0, 10:30, 10:30] = True
    m_dt_good = m_gt.copy()
    m_dt_half = np.zeros((1, 64, 64), bool)
    m_dt_half[0, 10:30, 10:20] = True  # IoU 0.5 with gt
    ev = COCOEvalNative(1, iou_type="segm")
    ev.add_image([[10.0, 10, 30, 30]], [0], [[10.0, 10, 30, 30]], [0.9], [0],
                 gt_masks=m_gt, det_masks=m_dt_good)
    s = ev.summarize()
    assert abs(s["mAP"] - 1.0) < 1e-9
    ev2 = COCOEvalNative(1, iou_type="segm")
    ev2.add_image([[10.0, 10, 30, 30]], [0], [[10.0, 10, 30, 20]], [0.9], [0],
                  gt_masks=m_gt, det_masks=m_dt_half)
    s2 = ev2.summarize()
    # mask IoU 0.5: TP only at the 0.5 threshold → mAP = 1/10
    assert abs(s2["mAP"] - 0.1) < 1e-9


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
    # full 12-metric set present with reference naming (eval_coco.py:40-41)
    for k in ("bbox_mAP", "bbox_AP_50", "bbox_AP_75", "bbox_AP_small",
              "bbox_AP_medium", "bbox_AP_large", "bbox_Recall_1",
              "bbox_Recall_10", "bbox_Recall_100", "bbox_Recall_small",
              "bbox_Recall_medium", "bbox_Recall_large"):
        assert k in m, k


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
        "boxes": np.array([[[0.0, 0, 50, 50]]]),
        "scores": np.array([[0.9]]),
        "labels": np.array([[0]]),
        "valid": np.array([[True]]),
    }
    ev.update(targets, preds)
    m = ev.evaluate()
    assert abs(m["mAP"] - 1.0) < 1e-6


def test_oks_keypoint_evaluation():
    """'keypoints' iou_type: OKS matching with the 17 COCO sigmas,
    maxDets [20], all/medium/large areas (pycocotools kpt Params;
    reference evaluator/__init__.py:30-31 pairs it with bbox)."""
    import numpy as np

    from cvpytorch_tpu.evaluator.coco import (COCO_SIGMAS, CocoEvaluator,
                                              _oks_iou)

    # hand-check the OKS formula for a single offset keypoint
    gt = np.zeros((1, 17, 3)); gt[0, :, 2] = 2
    gt[0, :, 0] = 50.0; gt[0, :, 1] = 50.0
    dt = gt.copy(); dt[0, 0, 0] = 53.0         # 3 px off on keypoint 0
    boxes = np.array([[20.0, 20.0, 80.0, 80.0]])
    area = np.array([3600.0])
    oks = _oks_iou(dt, gt, boxes, area, np.zeros(1, bool))
    e0 = 9.0 / (2 * COCO_SIGMAS[0] * 2) ** 2 * 2 / (2 * (3600 + np.spacing(1)))
    # pycocotools: e = d²/var2/(area+eps)/2 with var2=(2σ)²
    e0 = 9.0 / ((2 * COCO_SIGMAS[0]) ** 2) / (3600 + np.spacing(1)) / 2
    want = (np.exp(-e0) + 16.0) / 17.0
    np.testing.assert_allclose(oks[0, 0], want, rtol=1e-12)

    # perfect predictions → kpt mAP 1.0 through the evaluator
    ev = CocoEvaluator(num_classes=1, iou_types=("bbox", "keypoints"))
    targets = {"boxes": boxes[None], "labels": np.zeros((1, 1), np.int64),
               "valid": np.ones((1, 1), bool),
               "pads": np.zeros((1, 2)), "scales": np.ones((1, 2)),
               "keypoints": gt[None]}
    preds = {"boxes": boxes[None].copy(), "scores": np.array([[0.9]]),
             "labels": np.zeros((1, 1), np.int64),
             "valid": np.ones((1, 1), bool), "keypoints": gt[None].copy()}
    ev.update(targets, preds)
    out = ev.evaluate()
    assert out["keypoints_mAP"] == 1.0
    assert out["bbox_mAP"] == 1.0
    assert "keypoints_Recall_20" in out and "keypoints_AP_medium" in out


def test_segm_eval_zero_det_cell():
    """(img, cat) cells with gts but ZERO detections (and the reverse)
    must not crash the segm path — numpy can't reshape(0, -1)
    (surfaced by the on-chip Mask R-CNN overfit run)."""
    import numpy as np

    from cvpytorch_tpu.evaluator.coco import CocoEvaluator

    ev = CocoEvaluator(num_classes=2, iou_types=("bbox", "segm"))
    gt_boxes = np.array([[[10.0, 10.0, 50.0, 60.0]]])
    gt_masks = np.zeros((1, 1, 64, 64), np.float32)
    gt_masks[0, 0, 10:60, 10:50] = 1.0
    targets = {"boxes": gt_boxes, "labels": np.array([[0]]),
               "valid": np.array([[True]]),
               "pads": np.zeros((1, 2)), "scales": np.ones((1, 2)),
               "masks": gt_masks}
    # prediction for the OTHER class only → class 0 has gt but no dets,
    # class 1 has dets but no gts
    pm = np.zeros((1, 1, 64, 64), np.float32)
    pm[0, 0, 20:40, 20:40] = 1.0
    preds = {"boxes": np.array([[[20.0, 20.0, 40.0, 40.0]]]),
             "scores": np.array([[0.9]]), "labels": np.array([[1]]),
             "valid": np.array([[True]]), "masks": pm}
    ev.update(targets, preds)
    out = ev.evaluate()
    assert out["segm_mAP"] == 0.0 and out["bbox_mAP"] == 0.0
