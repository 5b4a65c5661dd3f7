"""Pallas NMS kernel vs the XLA reference implementation (interpret mode
on CPU; compiled on TPU when available)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvpytorch_tpu.ops.nms import nms_keep_mask
from cvpytorch_tpu.ops.pallas.nms_kernel import pallas_nms_keep


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_nms_matches_xla(seed):
    rng = np.random.RandomState(seed)
    n = 50
    centers = rng.rand(n, 2) * 100
    wh = rng.rand(n, 2) * 30 + 5
    boxes = np.concatenate([centers - wh / 2, centers + wh / 2], -1).astype(np.float32)
    scores = np.sort(rng.rand(n).astype(np.float32))[::-1].copy()

    keep_ref, order = nms_keep_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5)
    # boxes already score-sorted (scores descending) → order is identity
    sorted_boxes = jnp.asarray(boxes)[order]
    keep_pallas = pallas_nms_keep(sorted_boxes, 0.5, interpret=True)
    assert np.array_equal(np.asarray(keep_pallas), np.asarray(keep_ref))


def test_pallas_nms_identical_boxes():
    boxes = jnp.array([[0.0, 0, 10, 10]] * 3 + [[50, 50, 60, 60]])
    keep = pallas_nms_keep(boxes, 0.5, interpret=True)
    assert np.asarray(keep).tolist() == [True, False, False, True]
