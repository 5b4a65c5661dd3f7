"""Device-side fused augmentation (BASELINE north star: the reference's
cv2 worker-process chain — letterbox, mosaic, HSV jitter, flip, normalize
(reference: src/data/transforms/det_transforms.py) — becomes one fused
XLA program on device).

Host sends uint8 NHWC batches + RNG key; everything else happens in-graph
with static shapes:

* ``affine_warp``      — batched inverse-mapped bilinear warp (replaces
                         cv2.warpAffine, det_transforms.py:814-881)
* ``hsv_jitter``       — in-graph BGR↔HSV gain jitter (ColorHSV :628)
* ``random_hflip``     — batched flip with box mirroring
* ``mosaic4``          — 4-image gather-compose around a random center
                         (:898-955) expressed as 4 translation warps
* ``normalize``        — uint8 → float, mean/std
* ``random_perspective_boxes`` — affine transform of xyxy boxes + the
                         reference's box_candidates filter as a validity
                         mask (:806-812), fixed shapes throughout
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def normalize(images, mean=(0.0, 0.0, 0.0), std=(1.0, 1.0, 1.0),
              dtype=jnp.float32):
    """uint8 [0,255] → (x/255 − mean)/std."""
    x = images.astype(dtype) / 255.0
    return (x - jnp.asarray(mean, dtype)) / jnp.asarray(std, dtype)


def affine_warp(images, matrices, out_hw, fill: float = 114.0):
    """Batched affine warp with bilinear sampling.

    images (B, H, W, C) float; matrices (B, 2, 3) mapping OUTPUT pixel
    coords (x, y, 1) to SOURCE coords (inverse map, like cv2.warpAffine
    WARP_INVERSE_MAP); out-of-bounds sampled as ``fill``.
    """
    B, H, W, C = images.shape
    oh, ow = out_hw
    ys = jax.lax.broadcasted_iota(jnp.float32, (oh, ow), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (oh, ow), 1)

    def warp_one(img, m):
        sx = m[0, 0] * xs + m[0, 1] * ys + m[0, 2]
        sy = m[1, 0] * xs + m[1, 1] * ys + m[1, 2]
        x0 = jnp.floor(sx)
        y0 = jnp.floor(sy)
        fx = sx - x0
        fy = sy - y0

        def sample(yy, xx):
            inb = (xx >= 0) & (xx < W) & (yy >= 0) & (yy < H)
            xi = jnp.clip(xx, 0, W - 1).astype(jnp.int32)
            yi = jnp.clip(yy, 0, H - 1).astype(jnp.int32)
            v = img[yi, xi]
            return jnp.where(inb[..., None], v, fill)

        v00 = sample(y0, x0)
        v01 = sample(y0, x0 + 1)
        v10 = sample(y0 + 1, x0)
        v11 = sample(y0 + 1, x0 + 1)
        top = v00 * (1 - fx)[..., None] + v01 * fx[..., None]
        bot = v10 * (1 - fx)[..., None] + v11 * fx[..., None]
        return top * (1 - fy)[..., None] + bot * fy[..., None]

    return jax.vmap(warp_one)(images.astype(jnp.float32), matrices)


def affine_warp_separable(images, inv_matrices, out_hw, fill: float = 114.0):
    """Axis-aligned warp (no rotation/shear) as two batched matmuls.

    Every shipped YOLO hyp uses degrees=0/shear=0, so the hot mosaic
    path is pure scale+translate; expressing it as per-axis bilinear
    weight matrices turns the 4-tap 2D gather (scalar-unit bound on TPU)
    into two MXU contractions.  Border semantics match ``affine_warp``:
    missing tent mass blends toward ``fill``.
    """
    B, H, W, C = images.shape
    oh, ow = out_hw

    def weights(o, s, scale, off):
        src = scale * jnp.arange(o, dtype=jnp.float32) + off
        idx = jnp.arange(s, dtype=jnp.float32)
        return jnp.maximum(0.0, 1.0 - jnp.abs(src[:, None] - idx[None]))

    def one(img, m):
        wx = weights(ow, W, m[0, 0], m[0, 2])
        wy = weights(oh, H, m[1, 1], m[1, 2])
        t = jnp.einsum("yh,hwc->ywc", wy, img,
                       preferred_element_type=jnp.float32)
        t = jnp.einsum("xw,ywc->yxc", wx, t,
                       preferred_element_type=jnp.float32)
        cov = wy.sum(1)[:, None] * wx.sum(1)[None, :]
        return t + (1.0 - cov)[..., None] * fill

    return jax.vmap(one)(images.astype(jnp.float32), inv_matrices)


def invert_affine(m):
    """Invert (2,3) forward affine → inverse map for affine_warp."""
    a, b, tx = m[0]
    c, d, ty = m[1]
    det = a * d - b * c
    ia, ib = d / det, -b / det
    ic, id_ = -c / det, a / det
    return jnp.array([[ia, ib, -(ia * tx + ib * ty)],
                      [ic, id_, -(ic * tx + id_ * ty)]])


def transform_boxes(boxes, m):
    """Forward-affine xyxy boxes (N,4) with (2,3) matrix; returns the
    axis-aligned bounding box of the 4 warped corners (reference
    det_transforms.py:857-867)."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    xs = jnp.stack([x1, x2, x1, x2], 1)  # (N,4)
    ys = jnp.stack([y1, y1, y2, y2], 1)
    wx = m[0, 0] * xs + m[0, 1] * ys + m[0, 2]
    wy = m[1, 0] * xs + m[1, 1] * ys + m[1, 2]
    return jnp.stack([wx.min(1), wy.min(1), wx.max(1), wy.max(1)], 1)


def box_candidates_mask(old, new, wh_thr=2.0, ar_thr=20.0, area_thr=0.1):
    """Validity mask for post-warp boxes (reference: det_transforms.py:806)."""
    w1 = old[:, 2] - old[:, 0]
    h1 = old[:, 3] - old[:, 1]
    w2 = new[:, 2] - new[:, 0]
    h2 = new[:, 3] - new[:, 1]
    ar = jnp.maximum(w2 / (h2 + 1e-16), h2 / (w2 + 1e-16))
    return (w2 > wh_thr) & (h2 > wh_thr) & \
        (w2 * h2 / (w1 * h1 + 1e-16) > area_thr) & (ar < ar_thr)


def hsv_jitter(images, key, hgain=0.015, sgain=0.7, vgain=0.4):
    """Per-image HSV gain jitter in-graph (reference ColorHSV LUT :628).

    images float RGB [0,255].  Uses exact RGB↔HSV math instead of uint8
    LUTs (the LUT is a uint8-range optimization, not a semantic).
    """
    B = images.shape[0]
    gains = jax.random.uniform(key, (B, 3), minval=-1.0, maxval=1.0) * \
        jnp.array([hgain, sgain, vgain]) + 1.0

    x = images / 255.0
    maxc = x.max(-1)
    minc = x.min(-1)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / (maxc + 1e-12), 0.0)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    h = jnp.where(
        delta < 1e-12, 0.0,
        jnp.where(maxc == r, ((g - b) / (delta + 1e-12)) % 6,
                  jnp.where(maxc == g, (b - r) / (delta + 1e-12) + 2,
                            (r - g) / (delta + 1e-12) + 4))) / 6.0

    h = (h * gains[:, None, None, 0]) % 1.0
    s = jnp.clip(s * gains[:, None, None, 1], 0, 1)
    v = jnp.clip(v * gains[:, None, None, 2], 0, 1)

    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1 - s)
    q = v * (1 - f * s)
    t = v * (1 - (1 - f) * s)
    i = i.astype(jnp.int32) % 6
    r2 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                    [v, q, p, p, t, v])
    g2 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                    [t, v, v, q, p, p])
    b2 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                    [p, p, t, v, v, q])
    return jnp.stack([r2, g2, b2], -1) * 255.0


def random_hflip(images, boxes, key, p: float = 0.5):
    """Batched horizontal flip (reference det RandomHorizontalFlip :123)."""
    B, H, W, _ = images.shape
    flip = jax.random.bernoulli(key, p, (B,))
    flipped = images[:, :, ::-1]
    images = jnp.where(flip[:, None, None, None], flipped, images)
    fb = jnp.stack([W - boxes[..., 2], boxes[..., 1],
                    W - boxes[..., 0], boxes[..., 3]], -1)
    boxes = jnp.where(flip[:, None, None], fb, boxes)
    return images, boxes


def random_affine_matrices(key, B, height, width, degrees=0.0,
                           translate=0.1, scale=(0.5, 1.5), shear=0.0):
    """Forward matrices (B,2,3) replicating the reference's T·S·R·C chain
    (det_transforms.py:823-856; perspective terms are 0 in every shipped
    config)."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    ang = jax.random.uniform(k1, (B,), minval=-degrees, maxval=degrees) * \
        jnp.pi / 180
    if isinstance(scale, (tuple, list)):
        s = jax.random.uniform(k2, (B,), minval=scale[0], maxval=scale[1])
    else:
        s = jax.random.uniform(k2, (B,), minval=1 - scale, maxval=1 + scale)
    shx = jnp.tan(jax.random.uniform(k3, (B,), minval=-shear, maxval=shear)
                  * jnp.pi / 180)
    shy = jnp.tan(jax.random.uniform(k4, (B,), minval=-shear, maxval=shear)
                  * jnp.pi / 180)
    tx = jax.random.uniform(k5, (B,), minval=0.5 - translate,
                            maxval=0.5 + translate) * width
    ty = jax.random.uniform(jax.random.fold_in(k5, 1), (B,),
                            minval=0.5 - translate,
                            maxval=0.5 + translate) * height

    cos, sin = jnp.cos(ang) * s, jnp.sin(ang) * s

    def compose(cos, sin, shx, shy, tx, ty):
        C = jnp.array([[1.0, 0, -width / 2], [0, 1.0, -height / 2],
                       [0, 0, 1.0]])
        R = jnp.stack([jnp.stack([cos, -sin, jnp.zeros_like(cos)]),
                       jnp.stack([sin, cos, jnp.zeros_like(cos)]),
                       jnp.array([0.0, 0, 1])])
        S = jnp.stack([jnp.stack([jnp.ones_like(shx), shx, jnp.zeros_like(shx)]),
                       jnp.stack([shy, jnp.ones_like(shy), jnp.zeros_like(shy)]),
                       jnp.array([0.0, 0, 1])])
        T = jnp.stack([jnp.stack([jnp.ones_like(tx), jnp.zeros_like(tx), tx]),
                       jnp.stack([jnp.zeros_like(ty), jnp.ones_like(ty), ty]),
                       jnp.array([0.0, 0, 1])])
        return (T @ S @ R @ C)[:2]

    return jax.vmap(compose)(cos, sin, shx, shy, tx, ty)


def random_affine(images, boxes, valid, key, degrees=0.0, translate=0.1,
                  scale=(0.5, 1.5), shear=0.0, fill=114.0):
    """Fused random affine of a batch + its padded boxes."""
    B, H, W, _ = images.shape
    ms = random_affine_matrices(key, B, H, W, degrees, translate, scale,
                                shear)
    inv = jax.vmap(invert_affine)(ms)
    if degrees == 0.0 and shear == 0.0:
        warp = affine_warp_separable
    else:
        # the general gather warp is ~45× slower than the separable MXU
        # path (137.6 vs 3.06 ms per 8×640² batch on a v5e) — warn so a
        # rotation/shear hyp doesn't silently eat the device-aug win
        import logging
        logging.getLogger("cvpytorch_tpu").warning(
            "random_affine: degrees/shear != 0 uses the gather warp "
            "(~45x slower than the separable path; set degrees=0, "
            "shear=0 to stay on the MXU fast path)")
        warp = affine_warp
    out = warp(images, inv, (H, W), fill)
    new_boxes = jax.vmap(transform_boxes)(boxes, ms)
    new_boxes = jnp.stack([
        jnp.clip(new_boxes[..., 0], 0, W), jnp.clip(new_boxes[..., 1], 0, H),
        jnp.clip(new_boxes[..., 2], 0, W), jnp.clip(new_boxes[..., 3], 0, H),
    ], -1)
    scale_b = jnp.sqrt(jnp.abs(
        ms[:, 0, 0] * ms[:, 1, 1] - ms[:, 0, 1] * ms[:, 1, 0]))
    old_scaled = boxes * scale_b[:, None, None]
    keep = jax.vmap(box_candidates_mask)(old_scaled, new_boxes) & valid
    return out, new_boxes, keep


def mosaic4(images, boxes, valid, key, out_size: int, fill: float = 114.0):
    """Device mosaic-4 (reference det_transforms.py:898-955).

    images (B, 4, S, S, C) — 4 source images per output sample (the
    dataset's LOAD_NUM fetch); boxes (B, 4, M, 4); valid (B, 4, M).
    Each source is translated onto a 2S×2S canvas around a random center,
    then callers typically apply ``random_affine`` with border crop to S.
    Returns canvas (B, 2S, 2S, C), boxes (B, 4*M, 4), valid (B, 4*M).
    """
    B, four, S, _, C = images.shape
    assert four == 4
    kc = jax.random.split(key, B)
    centers = jax.vmap(
        lambda k: jax.random.uniform(k, (2,), minval=S * 0.5, maxval=S * 1.5)
    )(kc)  # (B, 2) = (xc, yc)

    def one(imgs4, boxes4, valid4, center):
        xc, yc = center[0], center[1]
        # target top-left corner for each quadrant (image i's bottom-right,
        # bottom-left, top-right, top-left anchored at the center)
        offs = jnp.stack([
            jnp.stack([xc - S, yc - S]),  # top-left image ends at center
            jnp.stack([xc, yc - S]),      # top-right
            jnp.stack([xc - S, yc]),      # bottom-left
            jnp.stack([xc, yc]),          # bottom-right
        ])  # (4, 2)

        # place tiles with dynamic_update_slice on a 3S guard canvas (the
        # S/2 margin absorbs negative offsets exactly like the reference's
        # border cropping) — ~30x cheaper than per-tile warps
        half = S // 2
        big = jnp.full((3 * S, 3 * S, C), fill, jnp.float32)

        def place(big, inp):
            img, off = inp
            x0 = jnp.round(off[0]).astype(jnp.int32) + half
            y0 = jnp.round(off[1]).astype(jnp.int32) + half
            return jax.lax.dynamic_update_slice(big, img, (y0, x0, 0)), None

        big, _ = jax.lax.scan(place, big, (imgs4.astype(jnp.float32), offs))
        canvas = jax.lax.dynamic_slice(big, (half, half, 0),
                                       (2 * S, 2 * S, C))
        shifted = boxes4 + jnp.concatenate([offs, offs], -1)[:, None, :]
        out_boxes = shifted.reshape(-1, 4)
        out_boxes = jnp.clip(out_boxes, 0, 2 * S)
        return canvas, out_boxes, valid4.reshape(-1)

    return jax.vmap(one)(images, boxes, valid, centers)


@partial(jax.jit, static_argnames=("out_size", "train", "hsv", "flip_p"))
def fused_det_augment(images, boxes, valid, key, out_size: int,
                      mean=(0.0, 0.0, 0.0), std=(1.0, 1.0, 1.0),
                      train: bool = True, hsv: bool = True,
                      flip_p: float = 0.5, scale=(0.5, 1.5),
                      translate: float = 0.1):
    """One fused program: mosaic4 → random affine (crop to out_size) →
    HSV → flip → normalize.  images (B,4,S,S,3) uint8 RGB; returns
    normalized (B,out,out,3) float + transformed padded boxes."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    canvas, mboxes, mvalid = mosaic4(images, boxes, valid, k1, out_size)
    B, HW2 = canvas.shape[0], canvas.shape[1]
    # tiles may arrive below output resolution (DEVICE_AUG TILE < SIZE):
    # each tile covers ~a quadrant of the final mosaic anyway, so feeding
    # S = out/2 tiles quarters the host letterbox/memcpy bytes; the
    # missing upscale folds into the warp as a canvas→output scale ts
    S = images.shape[2]
    ts = out_size / S
    # affine maps the 2S canvas to out_size with the reference's border
    # crop: translate samples around the canvas center
    ms = random_affine_matrices(k2, B, out_size, out_size,
                                translate=translate, scale=scale)
    # prepend canvas→output scale+shift (border = -S/2 each side, ×ts)
    shift = jnp.array([[ts, 0.0, -S / 2 * ts], [0.0, ts, -S / 2 * ts],
                       [0.0, 0.0, 1.0]])
    full = jnp.concatenate([ms, jnp.tile(jnp.array([[[0.0, 0, 1]]]),
                                         (B, 1, 1))], 1) @ shift
    ms = full[:, :2]
    inv = jax.vmap(invert_affine)(ms)
    # scale+translate only → separable MXU warp (the former gather warp
    # was the 86 ms/batch hot spot)
    out = affine_warp_separable(canvas, inv, (out_size, out_size))
    nboxes = jax.vmap(transform_boxes)(mboxes, ms)
    nboxes = jnp.clip(nboxes, 0, out_size)
    scale_b = jnp.sqrt(jnp.abs(
        ms[:, 0, 0] * ms[:, 1, 1] - ms[:, 0, 1] * ms[:, 1, 0]))
    keep = jax.vmap(box_candidates_mask)(
        mboxes * scale_b[:, None, None], nboxes) & mvalid
    # BGR→RGB BEFORE the HSV jitter: hsv_jitter's RGB↔HSV math on an RGB
    # image matches cv2's BGR-aware COLOR_BGR2HSV on the BGR tile (the
    # hue formula is symmetric once channels carry their true roles);
    # jittering the raw BGR tile would mirror the hue distribution.
    out = out[..., ::-1]                         # BGR→RGB like ToTensor
    if hsv:
        out = hsv_jitter(out, k3)
    out, nboxes = random_hflip(out, nboxes, k4, flip_p)
    out = normalize(out, mean, std)
    return out, nboxes, keep
