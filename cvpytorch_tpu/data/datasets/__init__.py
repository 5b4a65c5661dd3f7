"""Dataset zoo — importing registers into DATASETS."""
from . import mini_imagenet  # noqa: F401
from . import synthetic  # noqa: F401
from . import cityscapes  # noqa: F401
from . import coco  # noqa: F401
from . import voc  # noqa: F401
from . import misc_datasets  # noqa: F401
from .base import Dataset  # noqa: F401
