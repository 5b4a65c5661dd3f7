"""max_pool_argmax / max_unpool vs the torch oracle
(the F.max_pool2d(return_indices)/F.max_unpool2d pair SegNet+ENet use)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from cvpytorch_tpu.ops.pool import max_pool_argmax, max_unpool  # noqa: E402


@pytest.mark.parametrize("kernel,stride,padding,hw", [
    (2, 2, 0, (8, 12)),      # SegNet pools
    (3, 2, 1, (9, 11)),      # ENet DownBottleneck pools (overlapping)
])
def test_max_pool_argmax_matches_torch(kernel, stride, padding, hw):
    rs = np.random.RandomState(0)
    x = rs.rand(2, *hw, 5).astype(np.float32)
    pooled, idx = max_pool_argmax(jnp.asarray(x), kernel, stride, padding)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    want, want_idx = torch.nn.functional.max_pool2d(
        xt, kernel, stride, padding, return_indices=True)
    np.testing.assert_allclose(
        np.asarray(pooled).transpose(0, 3, 1, 2), want.numpy(), rtol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(idx).transpose(0, 3, 1, 2), want_idx.numpy())


def test_max_unpool_matches_torch():
    rs = np.random.RandomState(1)
    x = rs.rand(2, 8, 12, 5).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    pt, it = torch.nn.functional.max_pool2d(
        xt, 2, 2, 0, return_indices=True)
    want = torch.nn.functional.max_unpool2d(pt, it, 2, 2).numpy()
    pooled, idx = max_pool_argmax(jnp.asarray(x), 2, 2, 0)
    got = max_unpool(pooled, idx, (8, 12))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, rtol=1e-6)
