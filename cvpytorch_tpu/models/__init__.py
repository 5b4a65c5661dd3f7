"""Model zoo — importing registers everything into MODELS/BACKBONES/…"""
from . import backbones  # noqa: F401
from . import classification  # noqa: F401
from .classification import Classification  # noqa: F401
