"""Cross-process evaluator merge (VERDICT r4 #2): every evaluator's
``state_dict``/``merge_state_dicts`` must make N shard-local
accumulations score identically to one evaluator that saw the full set
(the reference allgathers per-rank detection lists before accumulation —
eval_coco.py:205-224 ``synchronize_between_processes``).

The 2-process DCN path (allgather_pickled over a real rendezvous) is
exercised by scripts/dryrun_multihost.py; these tests pin the merge
algebra itself, which is all the multi-host correctness beyond transport.
"""
import pickle

import numpy as np


def _scene(rs, n_classes=3, M=6):
    """One padded (targets, preds) scene with random boxes/labels."""
    n_gt = rs.randint(1, M)
    n_dt = rs.randint(1, M)
    boxes = np.zeros((1, M, 4)); labels = np.zeros((1, M), np.int64)
    valid = np.zeros((1, M), bool)
    for j in range(n_gt):
        x, y = rs.uniform(0, 60, 2)
        w, h = rs.uniform(5, 30, 2)
        boxes[0, j] = [x, y, x + w, y + h]
        labels[0, j] = rs.randint(0, n_classes)
        valid[0, j] = True
    pb = np.zeros((1, M, 4)); ps = np.zeros((1, M)); pl = np.full((1, M), -1)
    pv = np.zeros((1, M), bool)
    for j in range(n_dt):
        if j < n_gt and rs.rand() < 0.6:   # near-hit on a gt
            pb[0, j] = boxes[0, j] + rs.uniform(-2, 2, 4)
            pl[0, j] = labels[0, j]
        else:                              # random false positive
            x, y = rs.uniform(0, 60, 2)
            w, h = rs.uniform(5, 30, 2)
            pb[0, j] = [x, y, x + w, y + h]
            pl[0, j] = rs.randint(0, n_classes)
        ps[0, j] = rs.uniform(0.1, 1.0)
        pv[0, j] = True
    targets = {"boxes": boxes, "labels": labels, "valid": valid,
               "pads": np.zeros((1, 2)), "scales": np.ones((1, 2))}
    preds = {"boxes": pb, "scores": ps, "labels": pl, "valid": pv}
    return targets, preds


def _assert_merge_equals_full(make_ev, feed, scenes, n_shards=3):
    full = make_ev()
    for s in scenes:
        feed(full, s)
    want = full.evaluate()

    shards = [make_ev() for _ in range(n_shards)]
    for i, s in enumerate(scenes):
        feed(shards[i % n_shards], s)
    # the states must survive pickling (they cross hosts as pickle bytes)
    states = [pickle.loads(pickle.dumps(e.state_dict())) for e in shards]
    merged = make_ev()
    merged.merge_state_dicts(states)
    got = merged.evaluate()

    assert set(got) == set(want)
    for k in want:
        gv, wv = got[k], want[k]
        if isinstance(wv, float) and np.isnan(wv):
            assert np.isnan(gv), k
        else:
            np.testing.assert_allclose(gv, wv, atol=1e-12, err_msg=k)


def test_coco_evaluator_merge():
    from cvpytorch_tpu.evaluator.coco import CocoEvaluator

    rs = np.random.RandomState(0)
    scenes = [_scene(rs) for _ in range(12)]
    _assert_merge_equals_full(
        lambda: CocoEvaluator(num_classes=3),
        lambda ev, s: ev.update(*s), scenes)


def test_voc_evaluator_merge():
    from cvpytorch_tpu.evaluator.voc import VOCEvaluator

    rs = np.random.RandomState(1)
    scenes = [_scene(rs) for _ in range(12)]
    _assert_merge_equals_full(
        lambda: VOCEvaluator(num_classes=3),
        lambda ev, s: ev.update(*s), scenes)


def test_segmentation_evaluator_merge():
    from cvpytorch_tpu.evaluator.segmentation import SegmentationEvaluator

    rs = np.random.RandomState(2)
    scenes = [(rs.randint(0, 4, (2, 16, 16)), rs.randint(0, 4, (2, 16, 16)))
              for _ in range(9)]
    _assert_merge_equals_full(
        lambda: SegmentationEvaluator(num_classes=4),
        lambda ev, s: ev.update(*s), scenes)


def test_classification_evaluator_merge():
    from cvpytorch_tpu.evaluator.classification import (
        ClassificationEvaluator)

    rs = np.random.RandomState(3)
    scenes = [(rs.randint(0, 5, 32), rs.randint(0, 5, 32))
              for _ in range(9)]
    _assert_merge_equals_full(
        lambda: ClassificationEvaluator(num_classes=5),
        lambda ev, s: ev.update(*s), scenes)


def test_keypoint_evaluator_merge():
    from cvpytorch_tpu.evaluator.keypoint import KeypointEvaluator

    rs = np.random.RandomState(4)

    def kscene():
        gt = rs.uniform(0, 64, (2, 17, 2))
        return ({"keypoints": gt,
                 "valid": rs.rand(2, 17) > 0.3,
                 "bbox_size": rs.uniform(20, 60, 2)},
                np.concatenate([gt + rs.normal(0, 3, gt.shape),
                                np.ones((2, 17, 1))], -1))

    scenes = [kscene() for _ in range(9)]
    _assert_merge_equals_full(
        lambda: KeypointEvaluator(num_keypoints=17),
        lambda ev, s: ev.update(*s), scenes)


def test_allgather_pickled_single_process():
    from cvpytorch_tpu.parallel.mesh import allgather_pickled

    obj = {"a": np.arange(3), "b": [(np.zeros(2), 1)]}
    out = allgather_pickled(obj)
    assert len(out) == 1
    np.testing.assert_array_equal(out[0]["a"], obj["a"])
