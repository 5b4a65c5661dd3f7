"""cvpytorch_tpu — a TPU-native (JAX/Flax/pjit/Pallas) computer-vision
training + inference framework with the capabilities of
shanglianlm0525/CvPytorch (reference at /root/reference, see SURVEY.md).

Not a port: the compute path is functional JAX over a device mesh; the
reference's DDP/AMP/SyncBN/NMS machinery maps to sharded jit, bf16,
cross-replica BN and Pallas kernels.
"""

__version__ = "0.1.0"

from .config import CommonConfiguration, Configuration  # noqa: F401
from . import registry  # noqa: F401
