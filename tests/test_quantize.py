"""PTQ int8 round-trip: quantization error bounded, model accuracy drift
small on a trained tiny classifier."""
import jax
import jax.numpy as jnp
import numpy as np

from cvpytorch_tpu.utils.quantize import (
    dequantize_kernel,
    ptq_roundtrip,
    quantize_kernel,
    quantize_tree,
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
