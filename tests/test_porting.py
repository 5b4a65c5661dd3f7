"""Weight-porting numerics: a pure-torch conv/bn/linear oracle ported into
the equivalent Flax model must produce identical outputs (≤1e-4)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from flax import linen as nn  # noqa: E402

from cvpytorch_tpu.utils.porting import (  # noqa: E402
    convert_tensor,
    port_state_dict,
    verify_tree_shapes,
)


class TorchBlock(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(3, 8, 3, stride=2, padding=1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(8, eps=1e-5, momentum=0.1)
        self.conv2 = torch.nn.Conv2d(8, 8, 3, padding=1, groups=8, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(8)
        self.fc = torch.nn.Linear(8, 5)

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        x = torch.relu(self.bn2(self.conv2(x)))
        x = x.mean((2, 3))
        return self.fc(x)


class FlaxBlock(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Conv(8, (3, 3), strides=2, padding=1, use_bias=False,
                    name="conv1")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                         name="bn1")(x)
        x = nn.relu(x)
        x = nn.Conv(8, (3, 3), padding=1, feature_group_count=8,
                    use_bias=False, name="conv2")(x)
        x = nn.BatchNorm(use_running_average=True, name="bn2")(x)
        x = nn.relu(x)
        x = x.mean((1, 2))
        return nn.Dense(5, name="fc")(x)


RULES = [(r"(conv\d|bn\d|fc)", r"\1")]


def test_port_matches_torch_forward():
    tm = TorchBlock().eval()
    # non-trivial BN stats
    with torch.no_grad():
        tm(torch.randn(4, 3, 16, 16))
    tm.train(False)

    ported = port_state_dict(tm.state_dict(), RULES, strict=True)

    fm = FlaxBlock()
    x_np = np.random.RandomState(0).rand(2, 16, 16, 3).astype(np.float32)
    ref_vars = fm.init(jax.random.PRNGKey(0), jnp.asarray(x_np))
    errs = verify_tree_shapes(ported["params"], jax.tree_util.tree_map(
        lambda x: x, ref_vars["params"]))
    assert not errs, errs

    out_flax = fm.apply(
        {"params": ported["params"], "batch_stats": ported["batch_stats"]},
        jnp.asarray(x_np))
    with torch.no_grad():
        out_torch = tm(torch.from_numpy(x_np.transpose(0, 3, 1, 2))).numpy()
    assert np.abs(np.asarray(out_flax) - out_torch).max() < 1e-4


def test_convert_tensor_layouts():
    w = torch.randn(8, 3, 5, 5)
    name, arr, coll = convert_tensor("m.conv.weight", w)
    assert name == "kernel" and coll == "params" and arr.shape == (5, 5, 3, 8)
    lin = torch.randn(10, 20)
    name, arr, _ = convert_tensor("m.fc.weight", lin)
    assert arr.shape == (20, 10)
    bn = torch.randn(8)
    name, arr, coll = convert_tensor("m.bn.running_var", bn)
    assert name == "var" and coll == "batch_stats"
    _, _, coll = convert_tensor("m.bn.num_batches_tracked", torch.zeros(1))
    assert coll == "skip"
