"""Attention bricks vs the reference zoo (reference
src/models/modules/attentions.py; VERDICT r4 #10 — port the reusable
SE/CBAM family, catalogue the rest)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tests.oracle import setup_reference, to_torch  # noqa: E402

setup_reference()

from cvpytorch_tpu.utils.porting import port_state_dict  # noqa: E402

RS = np.random.RandomState(0)
X = RS.rand(2, 3, 8, 8).astype(np.float32)  # NCHW for torch


def _run(ours, ref, rules, x=X, atol=1e-5):
    torch.manual_seed(0)
    ref.eval()
    with torch.no_grad():
        want = ref(to_torch(x)).numpy()
    ported = port_state_dict(ref.state_dict(), rules, strict=True)
    xs = jnp.asarray(x.transpose(0, 2, 3, 1))
    got = ours.apply({"params": ported["params"]}, xs)
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=atol)


def test_se_attention():
    from src.models.modules.attentions import SEAttention as Ref

    from cvpytorch_tpu.models.attentions import SEAttention

    torch.manual_seed(1)
    ref = Ref(channel=3, reduction=3)
    _run(SEAttention(reduction=3), ref,
         [(r"excitation\.0", "fc1"), (r"excitation\.2", "fc2")])


def test_scse_block():
    from src.models.modules.attentions import scSEBlock as Ref

    from cvpytorch_tpu.models.attentions import scSEBlock

    torch.manual_seed(2)
    ref = Ref(channel=3, reduction=3)
    _run(scSEBlock(reduction=3), ref,
         [(r"cSE\.excitation\.0", "cSE/fc1"),
          (r"cSE\.excitation\.2", "cSE/fc2"),
          (r"sSE\.spatial_excitation\.0", "sSE/conv")])


def test_simam():
    from src.models.modules.attentions import SimAM as Ref

    from cvpytorch_tpu.models.attentions import SimAM

    _run(SimAM(), Ref(), [])


def test_cbam():
    from src.models.modules.attentions import CBAM as Ref

    from cvpytorch_tpu.models.attentions import CBAM

    torch.manual_seed(3)
    ref = Ref(channel=32)
    x = RS.rand(2, 32, 8, 8).astype(np.float32)
    _run(CBAM(reduction=16), ref,
         [(r"channel_attention\.shared_MLP\.0", "channel_attention/fc1"),
          (r"channel_attention\.shared_MLP\.2", "channel_attention/fc2"),
          (r"spatial_attention\.conv2d", "spatial_attention/conv")],
         x=x)


def test_eca_attention():
    from src.models.modules.attentions import ECAAttention as Ref

    from cvpytorch_tpu.models.attentions import ECAAttention

    torch.manual_seed(4)
    ref = Ref(kernel_size=3)
    _run(ECAAttention(kernel_size=3), ref, [(r"conv", "conv")])
