"""Device-side augmentation vs cv2/numpy references."""
import cv2
import jax
import jax.numpy as jnp
import numpy as np

from cvpytorch_tpu.ops.augment import (
    affine_warp,
    fused_det_augment,
    hsv_jitter,
    invert_affine,
    mosaic4,
    normalize,
    random_hflip,
    transform_boxes,
)


def test_affine_warp_matches_cv2():
    rng = np.random.RandomState(0)
    img = rng.rand(32, 40, 3).astype(np.float32) * 255
    m = np.array([[0.8, 0.1, 3.0], [-0.05, 1.1, -2.0]], np.float32)
    ref = cv2.warpAffine(img, m, (40, 32), flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP,
                         borderValue=(114, 114, 114))
    got = np.asarray(affine_warp(jnp.asarray(img)[None],
                                 jnp.asarray(m)[None], (32, 40))[0])
    # interior pixels match bilinear cv2 closely
    diff = np.abs(got[2:-2, 2:-2] - ref[2:-2, 2:-2])
    assert np.percentile(diff, 99) < 1.0, diff.max()


def test_invert_affine_roundtrip():
    m = jnp.array([[0.8, 0.1, 3.0], [-0.05, 1.1, -2.0]])
    inv = invert_affine(m)
    # forward-transform a point then inverse-map it back
    p = jnp.array([5.0, 7.0])
    fwd = jnp.array([m[0, 0] * p[0] + m[0, 1] * p[1] + m[0, 2],
                     m[1, 0] * p[0] + m[1, 1] * p[1] + m[1, 2]])
    back = jnp.array([inv[0, 0] * fwd[0] + inv[0, 1] * fwd[1] + inv[0, 2],
                      inv[1, 0] * fwd[0] + inv[1, 1] * fwd[1] + inv[1, 2]])
    assert np.allclose(back, p, atol=1e-5)


def test_transform_boxes_translation():
    m = jnp.array([[1.0, 0, 10.0], [0, 1.0, -5.0]])
    b = jnp.array([[0.0, 0, 10, 10]])
    out = np.asarray(transform_boxes(b, m))
    assert np.allclose(out, [[10, -5, 20, 5]])


def test_hflip_boxes():
    imgs = jnp.arange(2 * 4 * 4 * 1, dtype=jnp.float32).reshape(2, 4, 4, 1)
    boxes = jnp.array([[[0.0, 0, 2, 4]], [[0.0, 0, 2, 4]]])
    out, ob = random_hflip(imgs, boxes, jax.random.PRNGKey(0), p=1.0)
    assert np.allclose(np.asarray(out[0]), np.asarray(imgs[0, :, ::-1]))
    assert np.allclose(np.asarray(ob[0]), [[2, 0, 4, 4]])


def test_hsv_identity_when_gains_zero():
    rng = np.random.RandomState(0)
    img = (rng.rand(1, 8, 8, 3) * 255).astype(np.float32)
    out = np.asarray(hsv_jitter(jnp.asarray(img), jax.random.PRNGKey(0),
                                hgain=0.0, sgain=0.0, vgain=0.0))
    assert np.abs(out - img).max() < 1.0


def test_normalize():
    img = jnp.full((1, 2, 2, 3), 255.0)
    out = np.asarray(normalize(img, mean=(1.0, 1.0, 1.0), std=(2.0, 2.0, 2.0)))
    assert np.allclose(out, 0.0)


def test_mosaic4_places_all_quadrants():
    S = 16
    imgs = jnp.stack([jnp.full((4, S, S, 3), v, jnp.uint8)
                      for v in (10, 60, 120, 200)])[0:1] * 0 + \
        jnp.stack([jnp.full((S, S, 3), v, jnp.uint8)
                   for v in (10, 60, 120, 200)])[None]
    boxes = jnp.tile(jnp.array([[2.0, 2, 10, 10]]), (1, 4, 1)).reshape(1, 4, 1, 4)
    valid = jnp.ones((1, 4, 1), bool)
    canvas, out_boxes, out_valid = mosaic4(imgs, boxes, valid,
                                           jax.random.PRNGKey(1), S)
    c = np.asarray(canvas[0])
    assert c.shape == (2 * S, 2 * S, 3)
    vals = set(np.unique(c.astype(np.int32)))
    # all four source intensities present on the canvas
    assert {10, 60, 120, 200} <= vals
    assert out_boxes.shape == (1, 4, 4)


def test_fused_det_augment_shapes_and_finiteness():
    B, S, M = 2, 32, 5
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randint(0, 255, (B, 4, S, S, 3)), jnp.uint8)
    boxes = jnp.tile(jnp.array([4.0, 4, 20, 20]), (B, 4, M, 1))
    valid = jnp.zeros((B, 4, M), bool).at[:, :, 0].set(True)
    out, nboxes, keep = fused_det_augment(
        imgs, boxes, valid, jax.random.PRNGKey(0), out_size=S,
        scale=(0.9, 1.1), translate=0.05)
    assert out.shape == (B, S, S, 3)
    assert np.isfinite(np.asarray(out)).all()
    assert nboxes.shape == (B, 4 * M, 4)
    assert keep.shape == (B, 4 * M)
    assert bool(keep.any())  # some boxes survive a mild warp


def test_separable_warp_matches_gather_warp():
    import numpy as np

    from cvpytorch_tpu.ops.augment import (affine_warp,
                                           affine_warp_separable,
                                           invert_affine,
                                           random_affine_matrices)

    key = jax.random.PRNGKey(7)
    B, S = 3, 48
    imgs = jax.random.uniform(key, (B, S, S, 3)) * 255
    ms = random_affine_matrices(key, B, S, S, degrees=0.0, translate=0.2,
                                scale=(0.6, 1.4), shear=0.0)
    inv = jax.vmap(invert_affine)(ms)
    ref = np.asarray(affine_warp(imgs, inv, (S, S)))
    sep = np.asarray(affine_warp_separable(imgs, inv, (S, S)))
    np.testing.assert_allclose(sep, ref, atol=1e-2)
