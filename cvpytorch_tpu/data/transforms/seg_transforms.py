"""Segmentation transforms (reference: src/data/transforms/seg_transforms.py,
1035 LoC).  Samples: ``{'image': HWC uint8 BGR, 'target': HW uint8 mask}``.
Masks are resized with NEAREST and padded with ``ignore_label`` (255)."""
from __future__ import annotations

import random

import cv2
import numpy as np

from .cls_transforms import Compose, Normalize as _ImgNormalize, RGB2BGR


class Resize:
    """(reference: seg_transforms.py:346)"""

    def __init__(self, size, keep_ratio=False):
        self.size = tuple(size)  # (h, w)
        self.keep_ratio = keep_ratio

    def __call__(self, sample):
        h, w = self.size
        sample["image"] = cv2.resize(sample["image"], (w, h),
                                     interpolation=cv2.INTER_LINEAR)
        if sample.get("target") is not None:
            sample["target"] = cv2.resize(
                np.asarray(sample["target"]), (w, h),
                interpolation=cv2.INTER_NEAREST,
            )
        return sample


class RandomHorizontalFlip:
    def __init__(self, p=0.5):
        self.p = p

    def __call__(self, sample):
        if random.random() < self.p:
            sample["image"] = np.ascontiguousarray(sample["image"][:, ::-1])
            if sample.get("target") is not None:
                sample["target"] = np.ascontiguousarray(sample["target"][:, ::-1])
        return sample


class RandomScaleCrop:
    """Random scale then crop to fixed size, mask padded with ignore
    (reference: seg_transforms.py:230)."""

    def __init__(self, size, scale=(0.5, 2.0), ignore_label=255):
        self.size = tuple(size)
        self.scale = scale
        self.ignore_label = ignore_label

    def __call__(self, sample):
        img, mask = sample["image"], sample.get("target")
        s = random.uniform(*self.scale)
        nh, nw = int(img.shape[0] * s), int(img.shape[1] * s)
        img = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
        if mask is not None:
            mask = cv2.resize(np.asarray(mask), (nw, nh),
                              interpolation=cv2.INTER_NEAREST)
        ch, cw = self.size
        pad_h, pad_w = max(ch - nh, 0), max(cw - nw, 0)
        if pad_h or pad_w:
            img = cv2.copyMakeBorder(img, 0, pad_h, 0, pad_w,
                                     cv2.BORDER_CONSTANT, value=(0, 0, 0))
            if mask is not None:
                mask = cv2.copyMakeBorder(mask, 0, pad_h, 0, pad_w,
                                          cv2.BORDER_CONSTANT,
                                          value=self.ignore_label)
        y0 = random.randint(0, img.shape[0] - ch)
        x0 = random.randint(0, img.shape[1] - cw)
        sample["image"] = img[y0:y0 + ch, x0:x0 + cw]
        if mask is not None:
            sample["target"] = mask[y0:y0 + ch, x0:x0 + cw]
        return sample


class RandomScaleResize:
    """(reference: seg_transforms.py:298)"""

    def __init__(self, size, scale=(0.5, 2.0)):
        self.size = tuple(size)
        self.scale = scale

    def __call__(self, sample):
        s = random.uniform(*self.scale)
        h, w = int(self.size[0] * s), int(self.size[1] * s)
        return Resize((h, w))(sample)


class RandomCrop:
    """(reference: seg_transforms.py:369)"""

    def __init__(self, size, ignore_label=255):
        self.size = tuple(size)
        self.ignore_label = ignore_label

    def __call__(self, sample):
        img = sample["image"]
        ch, cw = self.size
        pad_h, pad_w = max(ch - img.shape[0], 0), max(cw - img.shape[1], 0)
        if pad_h or pad_w:
            sample["image"] = cv2.copyMakeBorder(
                img, 0, pad_h, 0, pad_w, cv2.BORDER_CONSTANT, value=(0, 0, 0))
            if sample.get("target") is not None:
                sample["target"] = cv2.copyMakeBorder(
                    np.asarray(sample["target"]), 0, pad_h, 0, pad_w,
                    cv2.BORDER_CONSTANT, value=self.ignore_label)
            img = sample["image"]
        y0 = random.randint(0, img.shape[0] - ch)
        x0 = random.randint(0, img.shape[1] - cw)
        sample["image"] = img[y0:y0 + ch, x0:x0 + cw]
        if sample.get("target") is not None:
            sample["target"] = sample["target"][y0:y0 + ch, x0:x0 + cw]
        return sample


class Pad:
    """(reference: seg_transforms.py:483)"""

    def __init__(self, size, ignore_label=255):
        self.size = tuple(size)
        self.ignore_label = ignore_label

    def __call__(self, sample):
        img = sample["image"]
        ph = max(self.size[0] - img.shape[0], 0)
        pw = max(self.size[1] - img.shape[1], 0)
        if ph or pw:
            sample["image"] = cv2.copyMakeBorder(
                img, 0, ph, 0, pw, cv2.BORDER_CONSTANT, value=(0, 0, 0))
            if sample.get("target") is not None:
                sample["target"] = cv2.copyMakeBorder(
                    np.asarray(sample["target"]), 0, ph, 0, pw,
                    cv2.BORDER_CONSTANT, value=self.ignore_label)
        return sample


class RandomRotate:
    """(reference: seg_transforms.py:722)"""

    def __init__(self, degrees=10, p=0.5, ignore_label=255):
        self.degrees = degrees if isinstance(degrees, (list, tuple)) else (-degrees, degrees)
        self.p = p
        self.ignore_label = ignore_label

    def __call__(self, sample):
        if random.random() >= self.p:
            return sample
        img = sample["image"]
        h, w = img.shape[:2]
        angle = random.uniform(*self.degrees)
        m = cv2.getRotationMatrix2D((w / 2, h / 2), angle, 1.0)
        sample["image"] = cv2.warpAffine(img, m, (w, h))
        if sample.get("target") is not None:
            sample["target"] = cv2.warpAffine(
                np.asarray(sample["target"]), m, (w, h),
                flags=cv2.INTER_NEAREST,
                borderValue=self.ignore_label,
            )
        return sample


class PhotoMetricDistortion:
    """brightness/contrast/saturation/hue jitter on image only
    (reference: seg_transforms.py:515)."""

    def __init__(self, brightness_delta=32, contrast_range=(0.5, 1.5),
                 saturation_range=(0.5, 1.5), hue_delta=18):
        self.brightness_delta = brightness_delta
        self.contrast_range = contrast_range
        self.saturation_range = saturation_range
        self.hue_delta = hue_delta

    def __call__(self, sample):
        img = sample["image"].astype(np.float32)
        if random.random() < 0.5:
            img += random.uniform(-self.brightness_delta, self.brightness_delta)
        mode = random.random() < 0.5
        if mode and random.random() < 0.5:
            img *= random.uniform(*self.contrast_range)
        img = np.clip(img, 0, 255).astype(np.uint8)
        hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV).astype(np.float32)
        if random.random() < 0.5:
            hsv[..., 1] *= random.uniform(*self.saturation_range)
        if random.random() < 0.5:
            hsv[..., 0] = (hsv[..., 0] + random.uniform(-self.hue_delta, self.hue_delta)) % 180
        hsv[..., 1:] = np.clip(hsv[..., 1:], 0, 255)
        img = cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2BGR)
        if not mode and random.random() < 0.5:
            img = np.clip(img.astype(np.float32) * random.uniform(*self.contrast_range),
                          0, 255).astype(np.uint8)
        sample["image"] = img
        return sample


class ColorJitter(PhotoMetricDistortion):
    """(reference: seg_transforms.py:617) — alias with same defaults."""

    def __init__(self, p=0.5, brightness=0.125, contrast=(0.5, 1.5),
                 saturation=(0.5, 1.5), hue=0.07):
        super().__init__(brightness_delta=brightness * 255,
                         contrast_range=contrast,
                         saturation_range=saturation,
                         hue_delta=hue * 180)


class ToTensor:
    """BGR→RGB float HWC /255; mask stays integer HW uint8→int32
    (reference: seg_transforms.py:86-124 — masks are NOT scaled)."""

    def __call__(self, sample):
        img = sample["image"][..., ::-1]
        sample["image"] = np.ascontiguousarray(img, dtype=np.float32) / 255.0
        if sample.get("target") is not None:
            sample["target"] = np.asarray(sample["target"], dtype=np.int32)
        return sample


class Normalize(_ImgNormalize):
    pass


# ---------------------------------------------------------------- RandAugment
# (reference: seg_transforms.py:803-945 — PIL ops; affine ops are applied to
# the label map too, NEAREST + ignore fill)

_POSTERIZE_MIN = 1
_WARP = {"fillcolor": (128, 128, 128), "resample": None}


def _affine_warp(im, data):
    from PIL import Image

    return im.transform(im.size, Image.AFFINE, data, **_WARP)


def _op_functions():
    from PIL import ImageEnhance, ImageOps

    return {
        "auto_contrast": lambda x, _: ImageOps.autocontrast(x),
        "equalize": lambda x, _: ImageOps.equalize(x),
        "invert": lambda x, _: ImageOps.invert(x),
        "rotate": lambda x, v: x.rotate(v, **_WARP),
        "posterize": lambda x, v: ImageOps.posterize(
            x, max(_POSTERIZE_MIN, int(v))),
        "posterize_inc": lambda x, v: ImageOps.posterize(
            x, max(_POSTERIZE_MIN, 4 - int(v))),
        "solarize": lambda x, v: x.point(
            lambda i: i if i < int(v) else 255 - i),
        "solarize_inc": lambda x, v: x.point(
            lambda i: i if i < 256 - v else 255 - i),
        "solarize_add": lambda x, v: x.point(
            lambda i: min(255, int(v) + i) if i < 128 else i),
        "color_inc": lambda x, v: ImageEnhance.Color(x).enhance(1 + v),
        "contrast_inc": lambda x, v: ImageEnhance.Contrast(x).enhance(1 + v),
        "brightness_inc": lambda x, v:
            ImageEnhance.Brightness(x).enhance(1 + v),
        "sharpness_inc": lambda x, v:
            ImageEnhance.Sharpness(x).enhance(1 + v),
        "shear_x": lambda x, v: _affine_warp(x, (1, v, 0, 0, 1, 0)),
        "shear_y": lambda x, v: _affine_warp(x, (1, 0, 0, v, 1, 0)),
        "trans_x": lambda x, v: _affine_warp(x, (1, 0, v * x.size[0],
                                                 0, 1, 0)),
        "trans_y": lambda x, v: _affine_warp(x, (1, 0, 0,
                                                 0, 1, v * x.size[1])),
    }


_AFFINE_OPS = ("rotate", "shear_x", "shear_y", "trans_x", "trans_y")

_OP_RANGES = {
    "auto_contrast": (0, 1, False), "equalize": (0, 1, False),
    "invert": (0, 1, False), "rotate": (0.0, 30.0, True),
    "posterize": (0, 4, False), "posterize_inc": (0, 4, False),
    "solarize": (0, 256, False), "solarize_inc": (0, 256, False),
    "solarize_add": (0, 110, False),
    "color_inc": (0, 0.9, True), "contrast_inc": (0, 0.9, True),
    "brightness_inc": (0, 0.9, True), "sharpness_inc": (0, 0.9, True),
    "shear_x": (0.0, 0.3, True), "shear_y": (0.0, 0.3, True),
    "trans_x": (0.0, 0.45, True), "trans_y": (0.0, 0.45, True),
}

RANDAUG_OPS = [
    "auto_contrast", "equalize", "rotate", "posterize_inc", "solarize_inc",
    "solarize_add", "color_inc", "contrast_inc", "brightness_inc",
    "sharpness_inc", "shear_x", "shear_y", "trans_x", "trans_y",
]

RANDAUG_OPS_REDUCED = [
    "auto_contrast", "equalize", "rotate", "color_inc", "contrast_inc",
    "brightness_inc", "sharpness_inc",
]


class RandAugment:
    """RandAugment (arXiv:1909.13719) for image+mask pairs
    (reference: seg_transforms.py:896-945)."""

    def __init__(self, p=1.0, n_ops=2, magnitude=0.5, ops="reduced",
                 fill=(0, 0, 0), ignore_value=255):
        assert 0 <= magnitude <= 1
        self.p = p
        self.n_ops = int(n_ops)
        self.magnitude = magnitude
        self.fill = tuple(fill) if isinstance(fill, (list, tuple)) else (fill,) * 3
        self.ignore_value = ignore_value
        if ops == "full":
            self.ops = RANDAUG_OPS
        elif ops in ("reduced", None):
            self.ops = RANDAUG_OPS_REDUCED
        else:
            self.ops = list(ops)

    def __call__(self, sample):
        from PIL import Image

        img, target = sample["image"], sample["target"]
        fns = _op_functions()
        for op in random.sample(self.ops, self.n_ops):
            if self.p < 1 and random.random() > self.p:
                continue
            pil_img = Image.fromarray(img.astype(np.uint8))
            pil_tgt = Image.fromarray(target.astype(np.uint8))
            min_v, max_v, negate = _OP_RANGES[op]
            v = self.magnitude * (max_v - min_v) + min_v
            v = -v if negate and random.random() > 0.5 else v
            _WARP["fillcolor"] = self.fill
            _WARP["resample"] = Image.BILINEAR
            pil_img = fns[op](pil_img, v)
            if op in _AFFINE_OPS:
                _WARP["fillcolor"] = self.ignore_value
                _WARP["resample"] = Image.NEAREST
                pil_tgt = fns[op](pil_tgt, v)
            img = np.asarray(pil_img)
            target = np.asarray(pil_tgt)
        return {"image": img, "target": target}


SEG_TRANSFORMS = {
    "Resize": Resize,
    "RandAugment": RandAugment,
    "RandomHorizontalFlip": RandomHorizontalFlip,
    "RandomScaleCrop": RandomScaleCrop,
    "RandomScaleResize": RandomScaleResize,
    "RandomCrop": RandomCrop,
    "Pad": Pad,
    "RandomRotate": RandomRotate,
    "PhotoMetricDistortion": PhotoMetricDistortion,
    "ColorJitter": ColorJitter,
    "RGB2BGR": RGB2BGR,
    "ToTensor": ToTensor,
    "Normalize": Normalize,
}
