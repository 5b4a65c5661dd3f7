"""Spatial sharding (H over the mesh) with halo exchange — validated on
the virtual 8-device CPU mesh next to test_parallel_tp (VERDICT r3 #9 /
SURVEY §5.7 design slot)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from cvpytorch_tpu.parallel.mesh import create_mesh
from cvpytorch_tpu.parallel.spatial import spatial_apply


class SmallFCN(nn.Module):
    """3 stride-1 3×3 convs → receptive radius 3 (< overlap)."""

    @nn.compact
    def __call__(self, x):
        for i, ch in enumerate((8, 8, 2)):
            x = nn.Conv(ch, (3, 3), padding=1, name=f"c{i}")(x)
            if i < 2:
                x = nn.relu(x)
        return x


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs virtual mesh")
def test_spatial_sharded_fcn_exact():
    n = len(jax.devices())
    mesh = create_mesh(model=n)
    model = SmallFCN()
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 8 * n, 16, 3).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), x)
    ref = model.apply(v, x)

    got = spatial_apply(lambda t: model.apply(v, t), x, mesh,
                        axis="model", overlap=4)
    # overlap-tile contract: every row whose receptive field (radius 3)
    # lies inside the image is exact — in particular ALL tile seams;
    # only the 3 outermost rows of the whole image may differ
    np.testing.assert_allclose(np.asarray(got)[:, 3:-3],
                               np.asarray(ref)[:, 3:-3], atol=1e-6)
    # seam rows between shards are interior rows — spot-check them
    h = x.shape[1] // n
    for s in range(1, n):
        np.testing.assert_allclose(np.asarray(got)[:, h * s - 1: h * s + 1],
                                   np.asarray(ref)[:, h * s - 1: h * s + 1],
                                   atol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs virtual mesh")
def test_spatial_sharded_stride_chain_interior():
    """Down/up stride chain (seg-style): equality everywhere with halo a
    multiple of the total stride and ≥ receptive radius."""
    class DownUp(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.relu(nn.Conv(8, (3, 3), strides=2, padding=1,
                                name="down")(x))
            x = nn.ConvTranspose(4, (4, 4), strides=(2, 2), padding="SAME",
                                 name="up")(x)
            return nn.Conv(2, (3, 3), padding=1, name="head")(x)

    n = len(jax.devices())
    mesh = create_mesh(model=n)
    model = DownUp()
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(1, 16 * n, 12, 3).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(model.apply(v, x))
    got = np.asarray(spatial_apply(lambda t: model.apply(v, t), x, mesh,
                                   axis="model", overlap=8))
    # stride-2 resampling phase is preserved (overlap % 2 == 0); interior
    # rows are exact, tile-border rows may differ within conv-transpose
    # support — assert the overwhelming majority matches exactly
    close = np.isclose(got, ref, atol=1e-5)
    assert close.mean() > 0.97, close.mean()
    # the image-interior (away from the r≈4-row outer border) is exact,
    # including every tile seam
    np.testing.assert_allclose(got[:, 6:-6], ref[:, 6:-6], atol=1e-5)