"""ICNet, PPLiteSeg, LEDNet — remaining self-contained segmentation models
(reference: src/models/icnet.py:92, src/models/pp_liteseg.py:24,
src/models/led_net.py:353)."""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import dictionary_to_names_weights
from ..registry import MODELS
from .backbones import build_backbone
from .bricks import BatchNorm, ConvBNAct
from .heads.seg_heads import resize_bilinear
from .light_seg import _seg_out
from .losses.seg_loss import cross_entropy_2d, ohem_cross_entropy_2d

_BN = dict(bn_momentum=0.9, bn_eps=1e-5)


class CascadeFusion(nn.Module):
    """CFF (reference icnet.py:42-57): align-corners upsample low,
    Conv3x3BNReLU dilation-2 on low / dilation-1 on high, relu(sum),
    plus an aux classifier on the (upsampled, convolved) low branch."""

    out: int
    num_classes: int = 0   # >0 → return (fused, aux_logits)

    @nn.compact
    def __call__(self, low, high, train: bool = False):
        from .light_seg3 import resize_align_corners

        low = resize_align_corners(low, high.shape[1:3])
        low = ConvBNAct(self.out, 3, dilation=2, act="relu", **_BN,
                        name="low")(low, train)
        high = ConvBNAct(self.out, 3, act="relu", **_BN,
                         name="high")(high, train)
        fused = nn.relu(low + high)
        if self.num_classes:
            aux = nn.Conv(self.num_classes, (1, 1), use_bias=False,
                          name="low_cls")(low)
            return fused, aux
        return fused


@MODELS.register(name="ICNet")
class ICNet(nn.Module):
    """ICNet (reference icnet.py:92-136).  The reference class is NOT
    buildable in its own trainer — its ctor takes ``num_classes`` only
    (no dictionary/model_cfg) and its forward lacks the universal mode
    contract — so the architecture is replicated (three-branch cascade:
    full-res shallow convs /8; backbone layer2 of the half-res input;
    backbone layer4 of the quarter-res input + additive align-corners
    PPM [1,2,3,6]; CFF 24 → CFF 12 → ×2 upsample → classifier → ×4
    upsample) and the training losses follow the ICNet paper: main CE +
    0.4-weighted aux CEs from the two CFF branches."""

    dictionary: Sequence[Any] = ()
    model_cfg: Any = None

    def setup(self):
        names, weights = dictionary_to_names_weights(list(self.dictionary))
        self.num_classes = len(names)
        self._w = tuple(weights)
        cfg = self.model_cfg or {}
        get = cfg.get if hasattr(cfg, "get") else (lambda k, d=None: d)
        bb = get("BACKBONE") or {"name": "ResNet", "subtype": "resnet50",
                                 "out_stages": (2, 4)}
        self.backbone = build_backbone(
            dict(bb.items()) if hasattr(bb, "items") else bb)

    @nn.compact
    def __call__(self, images, targets=None, mode: str = "infer"):
        from .heads.seg_heads import resize_bilinear as _rb
        from .light_seg3 import resize_align_corners

        train = mode == "train"
        H, W = images.shape[1:3]
        # sub1: full-res shallow convs, /8
        b1 = images
        for i, ch in enumerate((32, 32, 64)):
            b1 = ConvBNAct(ch, 3, 2, act="relu", **_BN,
                           name=f"sub1_{i}")(b1, train)
        # sub2: layer2 of the half-res input; sub4: layer4 of quarter-res
        half = _rb(images, (H // 2, W // 2))
        quarter = _rb(images, (H // 4, W // 4))
        x_sub2 = self.backbone(half, train=train)[0]
        x_sub4 = self.backbone(quarter, train=train)[1]
        # additive PPM, align_corners=True upsampling (icnet.py:76-89)
        feat = x_sub4
        for b in (1, 2, 3, 6):
            hh, ww = x_sub4.shape[1:3]
            p = nn.avg_pool(x_sub4, (max(hh // b, 1), max(ww // b, 1)),
                            strides=(max(hh // b, 1), max(ww // b, 1)))                 if hh % b == 0 and ww % b == 0 else                 jax.image.resize(x_sub4, (x_sub4.shape[0], b, b,
                                          x_sub4.shape[-1]), "linear")
            feat = feat + resize_align_corners(p, (hh, ww))
        x_sub4 = feat

        f24, aux24 = CascadeFusion(128, self.num_classes,
                                   name="cff_24")(x_sub4, x_sub2, train)
        f12, aux12 = CascadeFusion(128, self.num_classes,
                                   name="cff_12")(f24, b1, train)
        up2 = _rb(f12, (f12.shape[1] * 2, f12.shape[2] * 2))
        logits4 = nn.Conv(self.num_classes, (1, 1), use_bias=False,
                          name="conv_cls")(up2)
        logits = _rb(logits4, (H, W))
        if mode == "infer":
            return jnp.argmax(logits, -1)
        w = jnp.asarray(self._w)
        main = cross_entropy_2d(logits, targets, class_weights=w)
        aux = sum(cross_entropy_2d(_rb(a, (H, W)), targets,
                                   class_weights=w)
                  for a in (aux24, aux12))
        total = main + 0.4 * aux
        losses = {"ce_loss": main, "aux_loss": aux, "loss": total}
        if mode == "train":
            return total, losses
        return losses, jnp.argmax(logits, -1)


class UAFM(nn.Module):
    """Unified attention fusion (reference ppliteseg_head.py:44-135):
    project LOW 3×3, upsample HIGH align_corners=True, spatial attention
    from mean/max stats (3×3 conv-BN-relu → 3×3 conv-BN-sigmoid),
    out = low·a + high·(1−a), conv_out 3×3."""

    mid: int
    out: int

    @nn.compact
    def __call__(self, low, high, train: bool = False):
        from .light_seg3 import resize_align_corners

        low = ConvBNAct(self.mid, 3, act="relu", **_BN,
                        name="proj")(low, train)
        high = resize_align_corners(high, low.shape[1:3])
        stats = jnp.concatenate([
            low.mean(-1, keepdims=True), low.max(-1, keepdims=True),
            high.mean(-1, keepdims=True), high.max(-1, keepdims=True)], -1)
        a = ConvBNAct(2, 3, act="relu", **_BN, name="sa1")(stats, train)
        a = ConvBNAct(1, 3, act=None, **_BN, name="sa2")(a, train)
        a = jax.nn.sigmoid(a)
        fused = low * a + high * (1.0 - a)
        fused = ConvBNAct(self.mid, 3, act="relu", **_BN,
                          name="sa_out")(fused, train)
        return ConvBNAct(self.out, 3, act="relu", **_BN,
                         name="out")(fused, train)


@MODELS.register(name="PPLiteSeg")
class PPLiteSeg(nn.Module):
    """PP-LiteSeg (reference pp_liteseg.py:24-75 + ppliteseg_head.py:
    12-180).  The reference ships NO config for this model — the head's
    required kwargs exist only in its __main__ demo (in [256,512,1024],
    out [32,64,128], sppm 128, sizes [1,2,4]); those values are the
    defaults here.  Replicated quirks: three aux heads are summed in
    training, and inference uses outputs[0] — the head appended FIRST,
    i.e. the deepest/coarsest classifier (pp_liteseg.py:63)."""

    dictionary: Sequence[Any] = ()
    model_cfg: Any = None
    out_channels: Sequence[int] = (32, 64, 128)
    sppm_channel: int = 128
    sizes: Sequence[int] = (1, 2, 4)

    def setup(self):
        names, weights = dictionary_to_names_weights(list(self.dictionary))
        self.num_classes = len(names)
        self._w = tuple(weights)
        cfg = self.model_cfg or {}
        get = cfg.get if hasattr(cfg, "get") else (lambda k, d=None: d)
        bb = get("BACKBONE") or {"name": "STDCNet", "subtype": "stdc1"}
        self.backbone = build_backbone(
            dict(bb.items()) if hasattr(bb, "items") else bb)

    @nn.compact
    def __call__(self, images, targets=None, mode: str = "infer"):
        from .light_seg3 import resize_align_corners

        train = mode == "train"
        feats = self.backbone(images, train=train)      # c3, c4, c5
        oc = tuple(self.out_channels)
        # SPPM: additive align-corners pyramid + 3×3 conv_out
        c5 = feats[-1]
        acc = None
        for i, b in enumerate(self.sizes):
            hh, ww = c5.shape[1:3]
            p = nn.avg_pool(c5, (max(hh // b, 1), max(ww // b, 1)),
                            strides=(max(hh // b, 1), max(ww // b, 1)))                 if hh % b == 0 and ww % b == 0 else                 jax.image.resize(c5, (c5.shape[0], b, b, c5.shape[-1]),
                                 "linear")
            p = ConvBNAct(self.sppm_channel, 1, act="relu", **_BN,
                          name=f"sppm{i}")(p, train)
            p = resize_align_corners(p, (hh, ww))
            acc = p if acc is None else acc + p
        high = ConvBNAct(self.sppm_channel, 3, act="relu", **_BN,
                         name="sppm_out")(acc, train)

        mids = (oc[1], oc[2], oc[2])    # per-UAFM mid (reference ctor)
        outs_ch = (oc[0], oc[1], oc[2])
        logits_list = []
        mid_cls = oc[1]
        for idx, low in zip((2, 1, 0), reversed(feats)):
            high = UAFM(mids[idx], outs_ch[idx],
                        name=f"uafm{idx}")(low, high, train)
            y = ConvBNAct(mid_cls, 3, act="relu", **_BN,
                          name=f"cls{idx}_conv")(high, train)
            y = nn.Conv(self.num_classes, (1, 1), use_bias=False,
                        name=f"cls{idx}_out")(y)
            logits_list.append(resize_bilinear(y, images.shape[1:3]))

        main = logits_list[0]    # reference pp_liteseg.py:63 quirk
        if mode == "infer":
            return jnp.argmax(main, -1)
        w = jnp.asarray(self._w)
        ces = [cross_entropy_2d(lg, targets, class_weights=w)
               for lg in logits_list]
        total = sum(ces)
        losses = {f"ce_loss{i + 1}": c for i, c in enumerate(ces)}
        losses["loss"] = total
        if mode == "train":
            return total, losses
        return losses, jnp.argmax(main, -1)


class SSnbt(nn.Module):
    """Split-shuffle non-bottleneck (reference led_net.py:88-170): biased
    factorized convs with BN only mid/end of each branch, mirrored
    left/right orders, channelwise dropout, relu(residual+cat), shuffle."""

    dilation: int = 1
    dropprob: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        ch = x.shape[-1] // 2
        x1, x2 = x[..., :ch], x[..., ch:]
        conv = lambda k, d, nm: nn.Conv(  # noqa: E731
            ch, k, padding=((d * (k[0] - 1) // 2, d * (k[0] - 1) // 2),
                            (d * (k[1] - 1) // 2, d * (k[1] - 1) // 2)),
            kernel_dilation=(d, d), use_bias=True, name=nm)
        bn = lambda nm: BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-3,
            name=nm)
        # left: 3×1 → relu → 1×3 → bn → relu → 3×1(d) → relu → 1×3(d) → bn
        a = nn.relu(conv((3, 1), 1, "l1")(x1))
        a = nn.relu(bn("l_bn1")(conv((1, 3), 1, "l2")(a)))
        a = nn.relu(conv((3, 1), self.dilation, "l3")(a))
        a = bn("l_bn2")(conv((1, 3), self.dilation, "l4")(a))
        # right: mirrored order
        b = nn.relu(conv((1, 3), 1, "r1")(x2))
        b = nn.relu(bn("r_bn1")(conv((3, 1), 1, "r2")(b)))
        b = nn.relu(conv((1, 3), self.dilation, "r3")(b))
        b = bn("r_bn2")(conv((3, 1), self.dilation, "r4")(b))
        if self.dropprob > 0:
            drop = nn.Dropout(self.dropprob, broadcast_dims=(1, 2),
                              deterministic=not train)   # Dropout2d
            a, b = drop(a), drop(b)
        y = jnp.concatenate([a, b], -1)
        y = nn.relu(x + y)
        n, h, w, cc = y.shape
        return y.reshape(n, h, w, 2, cc // 2).swapaxes(3, 4).reshape(
            n, h, w, cc)


@MODELS.register(name="LEDNet")
class LEDNet(nn.Module):
    """LEDNet (reference led_net.py:48-310): downsampler blocks (biased
    conv ∥ max-pool concat, shared BN eps 1e-3), the exact SS-nbt stage
    plan (3×32 d1 / 2×64 d1 / 128 d{1,2,5,9} + d{2,5,9,17}), and the APN
    decoder (global branch, 1-channel 7/5/3 down pyramid with
    align_corners=True fusions, mid multiplication)."""

    dictionary: Sequence[Any] = ()
    model_cfg: Any = None

    def setup(self):
        names, weights = dictionary_to_names_weights(list(self.dictionary))
        self.num_classes = len(names)
        self._w = tuple(weights)

    @nn.compact
    def __call__(self, images, targets=None, mode: str = "infer"):
        from .light_seg3 import resize_align_corners

        train = mode == "train"

        def down(x, ch, name):
            c = nn.Conv(ch - x.shape[-1], (3, 3), strides=2, padding=1,
                        use_bias=True, name=f"{name}_conv")(x)
            p = nn.max_pool(x, (2, 2), strides=(2, 2))
            y = jnp.concatenate([c, p], -1)
            y = BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-3, name=f"{name}_bn")(y)
            return nn.relu(y)

        x = down(images, 32, "down1")
        for i in range(3):
            x = SSnbt(1, 0.03, name=f"s1_{i}")(x, train)
        x = down(x, 64, "down2")
        for i in range(2):
            x = SSnbt(1, 0.03, name=f"s2_{i}")(x, train)
        x = down(x, 128, "down3")
        for i, d in enumerate((1, 2, 5, 9, 2, 5, 9, 17)):
            x = SSnbt(d, 0.3, name=f"s3_{i}")(x, train)

        # APN decoder (led_net.py:227-281)
        def cbr(ch, k, st, nm):
            def f(v):
                v = nn.Conv(ch, (k, k), strides=st, padding=k // 2,
                            use_bias=True, name=f"{nm}_conv")(v)
                v = BatchNorm(use_running_average=not train,
                                 momentum=0.9, epsilon=1e-3,
                                 name=f"{nm}_bn")(v)
                return nn.relu(v)
            return f

        h, w = x.shape[1:3]
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        b1 = resize_align_corners(cbr(self.num_classes, 1, 1, "b1")(g),
                                  (h, w))
        mid = cbr(self.num_classes, 1, 1, "mid")(x)
        x1 = cbr(1, 7, 2, "down_1")(x)
        x2 = cbr(1, 5, 2, "down_2")(x1)
        x3 = cbr(1, 3, 2, "down_3a")(x2)
        x3 = cbr(1, 3, 1, "down_3b")(x3)
        x3 = resize_align_corners(x3, (h // 4, w // 4))
        x2 = cbr(1, 5, 1, "conv2")(x2)
        y = resize_align_corners(x2 + x3, (h // 2, w // 2))
        x1 = cbr(1, 7, 1, "conv1")(x1)
        y = resize_align_corners(y + x1, (h, w))
        logits = y * mid + b1
        logits = resize_align_corners(logits, images.shape[1:3])
        return _seg_out(logits, targets, mode, self._w)
