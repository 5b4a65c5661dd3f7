"""Model zoo — importing registers everything into MODELS/BACKBONES/…"""
from . import backbones  # noqa: F401
from . import classification  # noqa: F401
from . import unet  # noqa: F401
from . import segmentor  # noqa: F401
from . import yolov5  # noqa: F401
from . import nanodet_plus  # noqa: F401
from . import fcos  # noqa: F401
from . import yolox  # noqa: F401
from . import rcnn  # noqa: F401
from . import keypoint  # noqa: F401
from . import light_seg  # noqa: F401
from . import yolov6  # noqa: F401
from . import retinanet  # noqa: F401
from . import yolov7  # noqa: F401
from . import efficientdet  # noqa: F401
from . import yolop  # noqa: F401
from . import light_seg2  # noqa: F401
from . import light_seg3  # noqa: F401
from . import objectbox  # noqa: F401
from .necks import fcos_fpn  # noqa: F401
from .heads import seg_heads, seg_heads_extra  # noqa: F401
from .classification import Classification  # noqa: F401
from .unet import UNet  # noqa: F401
from .segmentor import EncoderDecoder  # noqa: F401
from .yolov5 import YOLOv5  # noqa: F401
