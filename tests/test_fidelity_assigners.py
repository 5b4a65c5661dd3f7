"""Assigner fidelity vs the reference's torch assigners
(src/models/assigners/{dsl_assigner,ota_assigner}.py): identical
matched-gt maps on random predictions."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tests.oracle import setup_reference, to_torch  # noqa: E402

setup_reference()


def _case(rs, P_grid=(16, 8, 4), strides=(8, 16, 32), C=4, M=3, img=128):
    priors = []
    for g, s in zip(P_grid, strides):
        ys, xs = np.meshgrid(np.arange(g), np.arange(g), indexing="ij")
        pr = np.stack([xs.ravel() * s, ys.ravel() * s,
                       np.full(g * g, s), np.full(g * g, s)], -1)
        priors.append(pr)
    priors = np.concatenate(priors).astype(np.float32)
    P = len(priors)
    # decoded boxes around the prior centers
    ctr = priors[:, :2] + rs.uniform(-8, 8, (P, 2))
    wh = rs.uniform(8, 60, (P, 2))
    decoded = np.concatenate([ctr - wh / 2, ctr + wh / 2], -1).astype(np.float32)
    scores = rs.uniform(0.01, 0.99, (P, C)).astype(np.float32)
    gt = np.array([[10, 10, 60, 70], [50, 40, 120, 110], [80, 90, 120, 126]],
                  np.float32)[:M]
    gl = rs.randint(0, C, M)
    return priors, decoded, scores, gt, gl


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_dsl_assigner_matches_reference(seed):
    from src.models.assigners.dsl_assigner import DynamicSoftLabelAssigner

    from cvpytorch_tpu.models.assigners.dsl_assigner import dsl_assign

    rs = np.random.RandomState(seed)
    priors, decoded, scores, gt, gl = _case(rs)
    # the reference head passes cls_preds.sigmoid() to the assigner
    # (nanodetplus_head.py:328-330); our dsl_assign takes logits and
    # applies the same sigmoid internally
    logits = np.log(scores / (1 - scores)).astype(np.float32)

    ref = DynamicSoftLabelAssigner(topk=13)
    res = ref.assign(to_torch(scores), to_torch(priors), to_torch(decoded),
                     to_torch(gt), to_torch(gl).long())
    ref_match = res.gt_inds.numpy() - 1  # 1-based, 0 = bg

    out = dsl_assign(jnp.asarray(logits), jnp.asarray(priors),
                     jnp.asarray(decoded), jnp.asarray(gt),
                     jnp.asarray(gl), jnp.ones(len(gt), bool))
    np.testing.assert_array_equal(np.asarray(out["matched_gt"]), ref_match)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_simota_soft_assigner_matches_reference(seed):
    from src.models.assigners.ota_assigner import SimOTAAssigner

    from cvpytorch_tpu.models.assigners.ota_assigner import simota_assign

    rs = np.random.RandomState(seed)
    priors, decoded, scores, gt, gl = _case(rs)

    ref = SimOTAAssigner(center_radius=2.5)
    res = ref.assign(to_torch(scores), to_torch(priors), to_torch(decoded),
                     to_torch(gt), to_torch(gl).long())
    ref_match = res.gt_inds.numpy() - 1

    out = simota_assign(jnp.asarray(scores), jnp.ones(len(priors)),
                        jnp.asarray(priors), jnp.asarray(decoded),
                        jnp.asarray(gt), jnp.asarray(gl),
                        jnp.ones(len(gt), bool), soft_label=True)
    np.testing.assert_array_equal(np.asarray(out["matched_gt"]), ref_match)
