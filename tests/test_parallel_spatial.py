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

@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs virtual mesh")
def test_spatial_sharded_training_exact():
    """TRAIN-mode spatial parallelism (VERDICT r3 #7): the batch's H dim
    is annotated over the mesh's ``spatial`` axis inside the ordinary jit
    train step; GSPMD partitions every conv (inserting halo exchanges)
    and computes BatchNorm moments over the logical global extent —
    semantics-preserving, so one sharded train step equals the unsharded
    step to float tolerance (loss AND updated params)."""
    from cvpytorch_tpu.config import CommonConfiguration
    from cvpytorch_tpu.models.unet import UNet
    from cvpytorch_tpu.optim.optimizers import build_optimizer
    from cvpytorch_tpu.optim.schedules import build_lr_scheduler
    from cvpytorch_tpu.parallel.mesh import shard_batch
    from cvpytorch_tpu.train_state import create_train_state, make_train_step

    model = UNet(dictionary=({"bg": 1.0}, {"fg": 1.0}),
                 base_channels=4, depth=2)
    rng = np.random.RandomState(0)
    B, H, W = 2, 32, 16
    batch = {
        "image": rng.rand(B, H, W, 3).astype(np.float32),
        "target": (rng.rand(B, H, W) > 0.5).astype(np.int32),
    }
    cfg = CommonConfiguration({
        "INIT_LR": 0.05, "N_MAX_EPOCHS": 1,
        "OPTIMIZER": {"TYPE": "SGD", "MOMENTUM": 0.9},
        "LR_SCHEDULER": {"TYPE": "CosineAnnealingLR"},
    })

    def one_step(mesh):
        tx = build_optimizer(cfg, build_lr_scheduler(cfg, 10))
        state = create_train_state(
            model, tx, jax.random.PRNGKey(0), batch, use_ema=False)
        step = make_train_step(amp=False, donate=False)
        sb = shard_batch(mesh, batch)
        new_state, metrics = step(state, sb)
        return float(metrics["loss"]), jax.tree_util.tree_map(
            np.asarray, new_state.params), jax.tree_util.tree_map(
            np.asarray, new_state.batch_stats)

    loss_ref, params_ref, bs_ref = one_step(
        create_mesh(data=1, model=1, spatial=1,
                    devices=jax.devices()[:1]))
    # dp×spatial: batch over 2 devices, H over 2 devices each
    loss_sp, params_sp, bs_sp = one_step(
        create_mesh(data=2, model=1, spatial=2,
                    devices=jax.devices()[:4]))

    np.testing.assert_allclose(loss_sp, loss_ref, rtol=2e-5)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(params_ref),
            jax.tree_util.tree_leaves_with_path(params_sp)):
        np.testing.assert_allclose(b, a, atol=2e-5, err_msg=str(ka))
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(bs_ref),
            jax.tree_util.tree_leaves_with_path(bs_sp)):
        np.testing.assert_allclose(b, a, atol=2e-5, err_msg=str(ka))
