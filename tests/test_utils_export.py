"""SWA / precise-BN / conv-BN fuse / class weights / autoanchor / exports."""
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from cvpytorch_tpu.models.bricks import ConvBNAct
from cvpytorch_tpu.utils.model_utils import (
    check_anchors,
    det_class_weights,
    fuse_conv_bn,
    fuse_model_conv_bn,
    kmean_anchors,
    seg_class_weights,
    swa_average,
)


def test_swa_average():
    t1 = {"a": jnp.ones(3), "b": {"c": jnp.zeros(2)}}
    t2 = {"a": jnp.full(3, 3.0), "b": {"c": jnp.full(2, 4.0)}}
    avg = swa_average([t1, t2])
    assert np.allclose(avg["a"], 2.0) and np.allclose(avg["b"]["c"], 2.0)


def test_fuse_conv_bn_numeric(rng):
    """Fused conv == conv→BN(eval) on random input."""
    m = ConvBNAct(8, 3, act=None, bn_momentum=0.9, bn_eps=1e-3)
    x = jax.random.normal(rng, (2, 16, 16, 3))
    v = m.init(rng, x, train=False)
    # non-trivial stats
    v = jax.tree_util.tree_map(lambda t: t, v)
    bs = {"bn": {"mean": jnp.linspace(-1, 1, 8),
                 "var": jnp.linspace(0.5, 2, 8)}}
    ref = m.apply({"params": v["params"], "batch_stats": bs}, x, train=False)

    fused_p, fused_s = fuse_model_conv_bn({"m": v["params"]}, {"m": bs},
                                          eps=1e-3)
    out = m.apply({"params": fused_p["m"], "batch_stats": fused_s["m"]},
                  x, train=False)
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() < 1e-4


def test_class_weights():
    masks = [np.array([[0, 0, 1], [0, 255, 2]])]
    w = seg_class_weights(masks, 3)
    assert w[0] < w[1] == w[2]  # frequent class gets smaller weight
    w2 = det_class_weights([np.array([0, 0, 0, 1])], 2)
    assert w2[1] > w2[0]
    assert abs(w2.sum() - 2.0) < 1e-9


def test_kmeans_anchors_and_bpr():
    rng = np.random.RandomState(0)
    # three clearly separated box scales
    wh = np.concatenate([
        rng.rand(100, 2) * 5 + 10,
        rng.rand(100, 2) * 10 + 60,
        rng.rand(100, 2) * 30 + 200,
    ])
    anchors = kmean_anchors(wh, n=3, iters=50)
    assert anchors.shape == (3, 2)
    areas = anchors.prod(1)
    assert areas[0] < areas[1] < areas[2]
    assert check_anchors(wh, anchors) > 0.99


def test_stablehlo_export_roundtrip(tmp_path, rng):
    from cvpytorch_tpu.exports import export_stablehlo, load_stablehlo

    class M(nn.Module):
        @nn.compact
        def __call__(self, x, targets=None, mode="infer"):
            return nn.Conv(4, (3, 3), padding=1)(x).sum(axis=(1, 2))

    m = M()
    x = jax.random.normal(rng, (1, 8, 8, 3))
    v = m.init(rng, x)
    path = export_stablehlo(m.apply, v, (1, 8, 8, 3),
                            str(tmp_path / "m.hlo"))
    exported = load_stablehlo(path)
    got = exported.call(x)
    ref = m.apply(v, x)
    assert np.allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_precise_bn_exact_population_moments(rng):
    """precise_bn must reproduce the reference estimator exactly
    (precise_bn.py:59-91): pop_mean = avg batch mean,
    pop_var = avg(bm² + bv) − pop_mean² — not an EMA approximation."""
    from cvpytorch_tpu.utils.model_utils import precise_bn

    class TinyBN(nn.Module):
        @nn.compact
        def __call__(self, images, targets=None, mode="train"):
            x = nn.Conv(4, (3, 3), use_bias=False)(images)
            x = nn.BatchNorm(use_running_average=(mode != "train"),
                             momentum=0.9, epsilon=1e-5)(x)
            return x

    model = TinyBN()
    x0 = jax.random.normal(rng, (2, 8, 8, 3))
    v = model.init({"params": rng}, x0)
    params, stats = v["params"], v["batch_stats"]

    batches = [{"image": jax.random.normal(jax.random.fold_in(rng, i),
                                           (2, 8, 8, 3)) * (1.0 + 0.3 * i)
                + 0.1 * i}
               for i in range(4)]
    out = precise_bn(model, params, stats, batches)

    # hand-compute the population stats from the conv activations
    bms, bvs = [], []
    for b in batches:
        act = model.apply({"params": params, "batch_stats": stats},
                          b["image"], mode="val")
        # undo eval-BN to recover raw conv output
        m0 = stats["BatchNorm_0"]["mean"]
        v0 = stats["BatchNorm_0"]["var"]
        sc = v["params"]["BatchNorm_0"]["scale"]
        bi = v["params"]["BatchNorm_0"]["bias"]
        raw = (act - bi) / sc * jnp.sqrt(v0 + 1e-5) + m0
        bms.append(np.asarray(raw.mean((0, 1, 2))))
        bvs.append(np.asarray(raw.var((0, 1, 2))))
    pm = np.mean(bms, 0)
    pv = np.mean([m * m + v_ for m, v_ in zip(bms, bvs)], 0) - pm * pm
    np.testing.assert_allclose(np.asarray(out["BatchNorm_0"]["mean"]), pm,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["BatchNorm_0"]["var"]), pv,
                               rtol=1e-4, atol=1e-5)
