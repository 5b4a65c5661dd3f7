"""PTQ int8 round-trip: quantization error bounded, model accuracy drift
small on a trained tiny classifier."""
import jax
import jax.numpy as jnp
import numpy as np

from cvpytorch_tpu.utils.quantize import (
    calibrate_activations,
    dequantize_kernel,
    fake_quant,
    ptq_roundtrip,
    quantize_kernel,
    quantize_tree,
    quantized_apply,
)


def test_quantize_kernel_error_bound():
    rng = np.random.RandomState(0)
    w = rng.randn(3, 3, 16, 32).astype(np.float32)
    q, s = quantize_kernel(w)
    assert q.dtype == np.int8
    back = dequantize_kernel(q, s)
    # max error ≤ half a quantization step per channel
    err = np.abs(back - w)
    step = s  # per out-channel
    assert (err <= step[None, None, None, :] * 0.51).all()


def test_ptq_model_drift_small(rng):
    from flax import linen as nn

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(16, (3, 3), padding=1)(x)
            x = nn.relu(x)
            return nn.Dense(4)(x.mean((1, 2)))

    m = M()
    x = jax.random.normal(rng, (8, 16, 16, 3))
    v = m.init(rng, x)
    ref = m.apply(v, x)
    vq = {"params": ptq_roundtrip(v["params"])}
    got = m.apply(vq, x)
    rel = float(jnp.abs(got - ref).max() / (jnp.abs(ref).max() + 1e-9))
    assert rel < 0.05, rel  # int8 drift stays small
    # payload genuinely int8
    qt = quantize_tree(v["params"])
    assert qt["Conv_0"]["kernel"]["q"].dtype == np.int8


def _tiny_model_and_vars(rng):
    from flax import linen as nn

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(16, (3, 3), padding=1)(x)
            x = nn.relu(x)
            x = nn.Conv(16, (3, 3), padding=1)(x)
            x = nn.relu(x)
            return nn.Dense(4)(x.mean((1, 2)))

    m = M()
    x = jax.random.normal(rng, (4, 16, 16, 3))
    return m, m.init(rng, x), x


def test_activation_ptq_drift_small(rng):
    """Calibrate per-site activation scales on sample batches, then run
    with int8-simulated activations (reference activation-PTQ analog:
    test/quantize/torch_quantize.py quant/dequant stubs)."""
    m, v, x = _tiny_model_and_vars(rng)
    scales = calibrate_activations(m, v, [x])
    # one scale per submodule __call__ (2 convs + 1 dense)
    assert len(scales) >= 3 and all(s > 0 for s in scales.values())
    ref = m.apply(v, x)
    got = quantized_apply(m, v, x, act_scales=scales)
    rel = float(jnp.abs(got - ref).max() / (jnp.abs(ref).max() + 1e-9))
    assert 0 < rel < 0.1, rel  # quantization happened, drift bounded
    # full int8 experiment: weights AND activations
    vq = {"params": ptq_roundtrip(v["params"])}
    got2 = quantized_apply(m, vq, x, act_scales=scales)
    rel2 = float(jnp.abs(got2 - ref).max() / (jnp.abs(ref).max() + 1e-9))
    assert rel2 < 0.15, rel2


def test_fake_quant_ste_gradient(rng):
    """QAT rule: gradient passes straight through in-range activations,
    is zeroed outside the int8 representable range."""
    x = jnp.array([-300.0, -1.0, 0.3, 2.0, 300.0])
    scale = 2.0 / 127.0  # representable range ±2
    g = jax.grad(lambda t: jnp.sum(fake_quant(t, scale) * 3.0))(x)
    np.testing.assert_allclose(np.asarray(g), [0, 3, 3, 3, 0])
    # end-to-end: quantized_apply is differentiable w.r.t. params
    m, v, xin = _tiny_model_and_vars(rng)
    scales = calibrate_activations(m, v, [xin])

    def loss(p):
        return jnp.sum(quantized_apply(
            m, {"params": p}, xin, act_scales=scales) ** 2)

    grads = jax.grad(loss)(v["params"])
    gnorm = sum(float(jnp.abs(t).sum())
                for t in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0
