"""OpenPose part-affinity-field targets and bottom-up decoding, TPU-native.

Target rendering replicates the numerics of the reference's
``src/data/transforms/keypoint_target_transforms.py:15-264``
(``putGaussianMaps`` / ``putVecMaps`` / ``get_openpose_ground_truth``) but
runs **in-graph** on padded fixed-shape keypoint tensors — no per-sample
host numpy, no precomputed fixtures: the model renders its own targets
from the collated ``(B, M, 17, 3)`` COCO keypoints each step (vectorized
over persons/limbs instead of the reference's Python loops; the math —
gaussian accumulation clipped at 1, limb-bbox + distance-to-line < 1 px
masks, count-averaged overlapping vector fields — is identical).

Decoding is the OpenPose paper's bottom-up pipeline (the reference's own
val path is broken — ``src/models/openpose.py:103-125`` runs YOLO box NMS
over heatmaps — so decode parity follows the paper/official semantics):
peak finding, PAF line-integral pair scoring and greedy per-limb matching
run jitted with fixed shapes; only the final instance assembly (tiny
pointer-chasing over ≤ L×P connections) runs on host.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# the 18-joint OpenPose order (reference get_keypoints():25-49)
OPENPOSE_KEYPOINTS = (
    "nose", "neck", "right_shoulder", "right_elbow", "right_wrist",
    "left_shoulder", "left_elbow", "left_wrist", "right_hip", "right_knee",
    "right_ankle", "left_hip", "left_knee", "left_ankle", "right_eye",
    "left_eye", "right_ear", "left_ear")

# limb connections on that order (reference kp_connections():51-73)
LIMB_IDS = (
    (1, 8), (8, 9), (9, 10), (1, 11), (11, 12), (12, 13), (1, 2), (2, 3),
    (3, 4), (2, 14), (1, 5), (5, 6), (6, 7), (5, 15), (1, 0), (0, 14),
    (0, 15), (14, 16), (15, 17))

# COCO17 index for each OpenPose18 joint (reference add_neck our_order,
# :99-100; index 17 = synthesized neck)
COCO_ORDER = (0, 17, 6, 8, 10, 5, 7, 9, 12, 14, 16, 11, 13, 15, 2, 1, 4, 3)

NUM_JOINTS = 18
NUM_LIMBS = len(LIMB_IDS)   # 19


def add_neck(kpts17):
    """(..., 17, 3) COCO keypoints → (..., 18, 3) OpenPose order with a
    synthesized neck = rounded shoulder midpoint (reference add_neck
    :85-114: vis 2 iff both shoulders are 2, else the product)."""
    r_sh, l_sh = kpts17[..., 6, :], kpts17[..., 5, :]
    neck = (r_sh + l_sh) / 2.0
    both2 = (r_sh[..., 2] == 2) & (l_sh[..., 2] == 2)
    v = jnp.where(both2, 2.0, r_sh[..., 2] * l_sh[..., 2])
    neck = jnp.round(jnp.stack([neck[..., 0], neck[..., 1], v], -1))
    k18 = jnp.concatenate([kpts17, neck[..., None, :]], axis=-2)
    return k18[..., jnp.asarray(COCO_ORDER), :]


def openpose18_to_coco17(kpts18):
    """Inverse of :func:`add_neck`'s reorder: drop the neck, restore COCO
    order.  (..., 18, C) → (..., 17, C)."""
    inv = np.empty(17, np.int32)
    for p, c in enumerate(COCO_ORDER):
        if c < 17:
            inv[c] = p
    return kpts18[..., jnp.asarray(inv), :]


def _remove_illegal(kpts, width, height):
    """Out-of-frame joints → (-1, -1, 0) (reference remove_illegal_joint
    :75-82)."""
    x, y = kpts[..., 0], kpts[..., 1]
    bad = (x >= width) | (x < 0) | (y >= height) | (y < 0)
    return jnp.where(bad[..., None],
                     jnp.asarray([-1.0, -1.0, 0.0]), kpts)


@partial(jax.jit, static_argnames=("input_hw", "stride", "sigma",
                                   "limb_width"))
def render_openpose_targets(kpts17, person_valid, input_hw, stride: int = 8,
                            sigma: float = 7.0, limb_width: float = 1.0):
    """Padded COCO keypoints → OpenPose training targets.

    kpts17 (B, M, 17, 3) in input pixels, person_valid (B, M) masking the
    padded rows → heatmaps (B, gy, gx, 19) (18 joints + background) and
    pafs (B, gy, gx, 38), bit-matching the reference's
    ``get_openpose_ground_truth`` (:200-246).
    """
    ih, iw = input_hw
    gy, gx = ih // stride, iw // stride
    k18 = add_neck(kpts17)
    k18 = _remove_illegal(k18, iw, ih)
    vis = k18[..., 2] * person_valid[..., None]          # (B, M, 18)

    # -- gaussian joint heatmaps (putGaussianMaps :117-138) --------------
    start = stride / 2.0 - 0.5
    ys = jax.lax.broadcasted_iota(jnp.float32, (gy, gx), 0) * stride + start
    xs = jax.lax.broadcasted_iota(jnp.float32, (gy, gx), 1) * stride + start
    d2 = ((xs[None, None, :, :, None] - k18[:, :, None, None, :, 0]) ** 2 +
          (ys[None, None, :, :, None] - k18[:, :, None, None, :, 1]) ** 2)
    expo = d2 / (2.0 * sigma * sigma)                    # (B, M, gy, gx, 18)
    g = jnp.where((expo <= 4.6052) & (vis[:, :, None, None, :] > 0.5),
                  jnp.exp(-expo), 0.0)
    heat = jnp.minimum(g.sum(1), 1.0)                    # (B, gy, gx, 18)
    bg = jnp.maximum(1.0 - heat.max(-1, keepdims=True), 0.0)
    heatmaps = jnp.concatenate([heat, bg], -1)

    # -- part affinity fields (putVecMaps :141-197) ----------------------
    la = jnp.asarray([a for a, _ in LIMB_IDS])
    lb = jnp.asarray([b for _, b in LIMB_IDS])
    pa = k18[:, :, la, :2] / stride                      # (B, M, L, 2)
    pb = k18[:, :, lb, :2] / stride
    limb_ok = (vis[:, :, la] > 0.5) & (vis[:, :, lb] > 0.5)
    vec = pb - pa
    norm = jnp.linalg.norm(vec, axis=-1)                 # (B, M, L)
    limb_ok = limb_ok & (norm > 0.0)
    u = vec / jnp.maximum(norm, 1e-12)[..., None]
    # integer bbox around the segment (reference :165-168; python round =
    # round-half-to-even = jnp.round)
    min_x = jnp.maximum(jnp.round(jnp.minimum(pa[..., 0], pb[..., 0])
                                  - limb_width), 0)
    max_x = jnp.minimum(jnp.round(jnp.maximum(pa[..., 0], pb[..., 0])
                                  + limb_width), gx)
    min_y = jnp.maximum(jnp.round(jnp.minimum(pa[..., 1], pb[..., 1])
                                  - limb_width), 0)
    max_y = jnp.minimum(jnp.round(jnp.maximum(pa[..., 1], pb[..., 1])
                                  + limb_width), gy)
    gyi = jax.lax.broadcasted_iota(jnp.float32, (gy, gx), 0)
    gxi = jax.lax.broadcasted_iota(jnp.float32, (gy, gx), 1)
    # (B, M, L, gy, gx)
    px = gxi[None, None, None]
    py = gyi[None, None, None]
    e = lambda t: t[..., None, None]
    in_box = ((px >= e(min_x)) & (px < e(max_x)) &
              (py >= e(min_y)) & (py < e(max_y)))
    dist = jnp.abs((px - e(pa[..., 0])) * e(u[..., 1]) -
                   (py - e(pa[..., 1])) * e(u[..., 0]))
    contrib = in_box & (dist < limb_width) & e(limb_ok)  # (B, M, L, gy, gx)
    cf = contrib.astype(jnp.float32)
    count = cf.sum(1)                                    # (B, L, gy, gx)
    paf_x = (cf * e(u[..., 0])).sum(1) / jnp.maximum(count, 1.0)
    paf_y = (cf * e(u[..., 1])).sum(1) / jnp.maximum(count, 1.0)
    # interleave to (..., 2L) channel order [x0, y0, x1, y1, ...]
    pafs = jnp.stack([paf_x, paf_y], 2)                  # (B, L, 2, gy, gx)
    pafs = pafs.reshape(pafs.shape[0], 2 * NUM_LIMBS, gy, gx)
    return heatmaps, jnp.moveaxis(pafs, 1, -1)


# ---------------------------------------------------------------------------
# bottom-up decode
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("max_peaks",))
def find_peaks(heatmaps, max_peaks: int = 20, threshold: float = 0.1):
    """Per-channel local maxima → top-``max_peaks`` peaks.

    heatmaps (B, gy, gx, K) → xy (B, K, P, 2) float grid coords,
    score (B, K, P), valid (B, K, P).  3×3 local-max test with strict
    inequality on the later neighbors breaks plateau ties to one pixel.
    """
    B, gy, gx, K = heatmaps.shape
    x = jnp.moveaxis(heatmaps, -1, 1)                    # (B, K, gy, gx)
    pad = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)),
                  constant_values=-jnp.inf)
    sh = [pad[:, :, 1 + dy:gy + 1 + dy, 1 + dx:gx + 1 + dx]
          for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    before = jnp.stack(sh[:4]).max(0)
    after = jnp.stack(sh[5:]).max(0)
    is_peak = (x > before) & (x >= after) & (x > threshold)
    flat = jnp.where(is_peak, x, -jnp.inf).reshape(B, K, gy * gx)
    score, idx = jax.lax.top_k(flat, max_peaks)          # (B, K, P)
    valid = jnp.isfinite(score)
    score = jnp.where(valid, score, 0.0)
    ix = idx % gx
    iy = idx // gx

    # sub-pixel refinement: the rendered joint maps are gaussians, so a
    # 3-point parabola on log-intensity along each axis recovers the true
    # (continuous) center — grid quantization alone costs ~stride/2 px of
    # OKS accuracy at the strict thresholds
    raw = x.reshape(B, K, gy * gx)

    def _log_at(dy, dx):
        yy = jnp.clip(iy + dy, 0, gy - 1)
        xx = jnp.clip(ix + dx, 0, gx - 1)
        v = jnp.take_along_axis(raw, yy * gx + xx, axis=-1)
        return jnp.log(jnp.maximum(v, 1e-10))

    lc = _log_at(0, 0)
    dxs = _parabola_offset(_log_at(0, -1), lc, _log_at(0, 1))
    dys = _parabola_offset(_log_at(-1, 0), lc, _log_at(1, 0))
    xy = jnp.stack([ix.astype(jnp.float32) + dxs,
                    iy.astype(jnp.float32) + dys], -1)
    return xy, score, valid


def _parabola_offset(l, c, r):
    """Vertex offset in [-0.5, 0.5] of the parabola through (-1,l),(0,c),(1,r)."""
    denom = l + r - 2.0 * c
    off = jnp.where(jnp.abs(denom) > 1e-8, 0.5 * (l - r) / denom, 0.0)
    return jnp.clip(off, -0.5, 0.5)


@partial(jax.jit, static_argnames=("num_samples",))
def score_limb_pairs(peaks_xy, peaks_valid, pafs, num_samples: int = 10,
                     sample_threshold: float = 0.05,
                     min_good_frac: float = 0.8,
                     coord_offset: float = 0.4375):
    """PAF line-integral score for every candidate limb pair.

    peaks_xy (B, K, P, 2), peaks_valid (B, K, P), pafs (B, gy, gx, 2L)
    → scores (B, L, P, P) (candidate-A × candidate-B,
    score-with-distance-prior) and ok (B, L, P, P) (paper criteria: ≥ 80%
    of the sampled dots above 0.05 AND positive prior score AND both
    endpoints valid)."""
    B, K, P, _ = peaks_xy.shape
    gy, gx = pafs.shape[1:3]
    la = jnp.asarray([a for a, _ in LIMB_IDS])
    lb = jnp.asarray([b for _, b in LIMB_IDS])
    # heatmap peaks live on the grid-center convention (renderer start =
    # stride/2 - 0.5) while PAFs are rendered at raw center/stride coords
    # (reference putVecMaps) — shift before sampling or short limbs miss
    # their own 1-px-wide PAF band; offset = (stride/2 - 0.5)/stride
    peaks_xy = peaks_xy + coord_offset
    a_xy = peaks_xy[:, la]                               # (B, L, P, 2)
    b_xy = peaks_xy[:, lb]
    a_ok = peaks_valid[:, la]
    b_ok = peaks_valid[:, lb]
    vec = b_xy[:, :, None, :, :] - a_xy[:, :, :, None, :]   # (B,L,P,P,2)
    norm = jnp.linalg.norm(vec, axis=-1)
    u = vec / jnp.maximum(norm, 1e-8)[..., None]
    ts = jnp.linspace(0.0, 1.0, num_samples)
    pts = (a_xy[:, :, :, None, None, :] +
           ts[None, None, None, None, :, None] * vec[:, :, :, :, None, :])
    ix = jnp.clip(jnp.round(pts[..., 0]), 0, gx - 1).astype(jnp.int32)
    iy = jnp.clip(jnp.round(pts[..., 1]), 0, gy - 1).astype(jnp.int32)
    paf_l = jnp.moveaxis(pafs, -1, 1).reshape(B, NUM_LIMBS, 2, gy, gx)

    def gather_one(paf_b, ix_b, iy_b):                   # per batch-element
        def per_limb(paf_2hw, ixl, iyl):
            px = paf_2hw[0][iyl, ixl]
            py = paf_2hw[1][iyl, ixl]
            return px, py
        return jax.vmap(per_limb)(paf_b, ix_b, iy_b)

    px, py = jax.vmap(gather_one)(paf_l, ix, iy)         # (B,L,P,P,S)
    dots = px * u[..., 0:1] + py * u[..., 1:2]           # broadcast S
    mean_dot = dots.mean(-1)
    prior = jnp.minimum(0.5 * gy / jnp.maximum(norm, 1e-8) - 1.0, 0.0)
    scores = mean_dot + prior
    good = (dots > sample_threshold).mean(-1) >= min_good_frac
    ok = (good & (scores > 0) &
          a_ok[:, :, :, None] & b_ok[:, :, None, :])
    return scores, ok


def greedy_limb_match(scores, ok):
    """Per-limb greedy bipartite matching on the scored pairs.

    scores/ok (B, L, P, P) → conns (B, L, P, 3): [a_slot, b_slot, score]
    with a_slot = -1 for unused rows.  Fixed shapes; runs under jit."""
    B, L, P, _ = scores.shape
    s = jnp.where(ok, scores, -jnp.inf).reshape(B, L, P * P)
    order = jnp.argsort(-s, axis=-1)                     # best first

    def match_one(s_l, order_l):                         # (P*P,), (P*P,)
        def body(i, carry):
            used_a, used_b, out, n = carry
            idx = order_l[i]
            a, b = idx // P, idx % P
            sc = s_l[idx]
            take = jnp.isfinite(sc) & ~used_a[a] & ~used_b[b]
            out = jax.lax.cond(
                take,
                lambda o: o.at[n].set(
                    jnp.asarray([a, b, 0]).astype(jnp.float32)
                    .at[2].set(sc)),
                lambda o: o, out)
            return (used_a.at[a].set(used_a[a] | take),
                    used_b.at[b].set(used_b[b] | take),
                    out, n + take.astype(jnp.int32))
        init = (jnp.zeros(P, bool), jnp.zeros(P, bool),
                jnp.full((P, 3), -1.0), jnp.asarray(0))
        _, _, out, _ = jax.lax.fori_loop(0, P * P, body, init)
        return out

    flat = jax.vmap(jax.vmap(match_one))(s, order.astype(jnp.int32))
    return flat                                          # (B, L, P, 3)


def assemble_instances(peaks_xy, peaks_score, conns, max_people: int = 20,
                       min_parts: int = 3, min_score: float = 0.2):
    """Host-side instance assembly (the OpenPose paper's subset merge).

    numpy inputs for ONE image: peaks_xy (18, P, 2), peaks_score (18, P),
    conns (L, P, 3) from :func:`greedy_limb_match` → (people (N, 18, 3)
    grid coords + per-joint score, instance_scores (N,)), N ≤ max_people.
    """
    P = peaks_xy.shape[1]
    subsets = []   # each: dict joint -> slot, plus score accumulators
    for l, (k1, k2) in enumerate(LIMB_IDS):
        for row in conns[l]:
            a, b, sc = int(row[0]), int(row[1]), float(row[2])
            if a < 0:
                continue
            found = [s for s in subsets
                     if s["joints"].get(k1) == a or s["joints"].get(k2) == b]
            if not found:
                subsets.append({"joints": {k1: a, k2: b},
                                "score": sc + peaks_score[k1, a]
                                + peaks_score[k2, b]})
            elif len(found) == 1:
                s = found[0]
                if s["joints"].get(k2) is None:
                    s["joints"][k2] = b
                    s["score"] += sc + peaks_score[k2, b]
                elif s["joints"].get(k1) is None:
                    s["joints"][k1] = a
                    s["score"] += sc + peaks_score[k1, a]
            else:
                s1, s2 = found[0], found[1]
                if not (set(s1["joints"]) & set(s2["joints"])):
                    s1["joints"].update(s2["joints"])
                    s1["score"] += s2["score"] + sc
                    subsets.remove(s2)
    out, out_scores = [], []
    for s in subsets:
        n = len(s["joints"])
        if n < min_parts or s["score"] / max(n, 1) < min_score:
            continue
        person = np.zeros((NUM_JOINTS, 3), np.float32)
        for j, slot in s["joints"].items():
            person[j, :2] = peaks_xy[j, slot]
            person[j, 2] = peaks_score[j, slot]
        out.append(person)
        out_scores.append(s["score"] / max(n, 1))
    order = np.argsort(-np.asarray(out_scores)) if out else []
    out = [out[i] for i in order][:max_people]
    out_scores = [out_scores[i] for i in order][:max_people]
    return (np.stack(out) if out else np.zeros((0, NUM_JOINTS, 3),
                                               np.float32),
            np.asarray(out_scores, np.float32))


def openpose_decode(heatmaps, pafs, max_peaks: int = 20,
                    peak_threshold: float = 0.1, max_people: int = 20):
    """Full bottom-up decode for a batch: jitted peaks/scoring/matching,
    host assembly → list over images of (people (N, 18, 3), scores (N,)),
    coordinates in heatmap grid pixels."""
    xy, score, valid = find_peaks(heatmaps[..., :NUM_JOINTS], max_peaks,
                                  peak_threshold)
    pair_scores, ok = score_limb_pairs(xy, valid, pafs)
    conns = greedy_limb_match(pair_scores, ok)
    xy_h = np.asarray(xy)
    sc_h = np.asarray(score)
    conns_h = np.asarray(conns)
    return [assemble_instances(xy_h[b], sc_h[b], conns_h[b],
                               max_people=max_people)
            for b in range(xy_h.shape[0])]


def instances_to_eval(decoded, stride, targets=None, max_people: int = 20):
    """Decoded people → the padded instances dict
    ``CocoEvaluator(('bbox', 'keypoints'))`` consumes: keypoints mapped
    back to COCO17 order in ORIGINAL image pixels (un-letterboxed via the
    batch ``pads``/``scales``), boxes = keypoint extents, score = mean
    joint confidence."""
    B = len(decoded)
    K = 17
    kpts = np.zeros((B, max_people, K, 3), np.float32)
    boxes = np.zeros((B, max_people, 4), np.float32)
    scores = np.zeros((B, max_people), np.float32)
    valid = np.zeros((B, max_people), bool)
    inv = np.empty(17, np.int32)
    for p, c in enumerate(COCO_ORDER):
        if c < 17:
            inv[c] = p
    for b, (people, pscores) in enumerate(decoded):
        n = min(len(people), max_people)
        for i in range(n):
            k18 = people[i]
            k17 = k18[inv]                              # COCO order
            # grid → network px with the renderer's grid-center offset
            # (putGaussianMaps start = stride/2 - 0.5)
            xy = k17[:, :2] * stride + (stride / 2.0 - 0.5)
            if targets is not None and "pads" in targets:
                pads = np.asarray(targets["pads"])[b]
                scl = np.asarray(targets["scales"])[b]
                xy = (xy - pads[None, :]) / scl[None, :]
            vis = k17[:, 2] > 0
            if not vis.any():
                continue
            kpts[b, i, :, :2] = xy
            kpts[b, i, :, 2] = np.where(vis, 2.0, 0.0)
            boxes[b, i] = [xy[vis, 0].min(), xy[vis, 1].min(),
                           xy[vis, 0].max(), xy[vis, 1].max()]
            scores[b, i] = pscores[i]
            valid[b, i] = True
    return {"boxes": boxes, "scores": scores,
            "labels": np.zeros((B, max_people), np.int32),
            "valid": valid, "keypoints": kpts}
