"""Pure-numpy fallback for the native RLE codec (cvpytorch_tpu/native).

Written independently from the public COCO RLE format spec; serves both
as the no-toolchain fallback and as the differential oracle for the C
implementation (tests/test_native_rle.py)."""
from __future__ import annotations

import numpy as np


def decode_string(s: bytes) -> np.ndarray:
    counts = []
    i = 0
    n = len(s)
    while i < n:
        x, k, more = 0, 0, True
        while more:
            c = s[i] - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return np.asarray(counts, np.int64)


def encode_string(counts) -> str:
    out = []
    counts = np.asarray(counts, np.int64)
    for j, x in enumerate(counts):
        x = int(x)
        if j > 2:
            x -= int(counts[j - 2])
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = (x != -1) if (c & 0x10) else (x != 0)
            if more:
                c |= 0x20
            out.append(chr(c + 48))
    return "".join(out)


def from_mask_flat(flat: np.ndarray) -> np.ndarray:
    flat = flat.astype(bool)
    if flat.size == 0:
        return np.zeros(1, np.int64)
    edges = np.flatnonzero(flat[1:] != flat[:-1]) + 1
    bounds = np.concatenate([[0], edges, [flat.size]])
    runs = np.diff(bounds).astype(np.int64)
    if flat[0]:  # counts start with the zero-run
        runs = np.concatenate([[0], runs])
    return runs


def to_mask_flat(counts, length: int) -> np.ndarray:
    counts = np.asarray(counts, np.int64)
    total = int(counts.sum())
    vals = np.arange(counts.size, dtype=np.int64) % 2
    flat = np.repeat(vals.astype(np.uint8), np.clip(counts, 0, None))
    if total < length:
        flat = np.concatenate([flat, np.zeros(length - total, np.uint8)])
    return flat[:length]


def area(counts) -> int:
    counts = np.asarray(counts, np.int64)
    return int(counts[1::2].sum())


def _intersection(ca: np.ndarray, cb: np.ndarray) -> int:
    ends_a = np.cumsum(ca)
    ends_b = np.cumsum(cb)
    # foreground intervals: [end[i-1], end[i]) for odd i
    ia = np.stack([ends_a[:-1][::2], ends_a[1::2]], 1) if ca.size > 1 \
        else np.zeros((0, 2), np.int64)
    ib = np.stack([ends_b[:-1][::2], ends_b[1::2]], 1) if cb.size > 1 \
        else np.zeros((0, 2), np.int64)
    if not ia.size or not ib.size:
        return 0
    lo = np.maximum(ia[:, None, 0], ib[None, :, 0])
    hi = np.minimum(ia[:, None, 1], ib[None, :, 1])
    return int(np.clip(hi - lo, 0, None).sum())


def iou(dt_counts, gt_counts, iscrowd) -> np.ndarray:
    D, G = len(dt_counts), len(gt_counts)
    out = np.zeros((D, G))
    for i in range(D):
        ai = area(dt_counts[i])
        for j in range(G):
            inter = _intersection(np.asarray(dt_counts[i], np.int64),
                                  np.asarray(gt_counts[j], np.int64))
            denom = ai if iscrowd[j] else \
                ai + area(gt_counts[j]) - inter
            out[i, j] = inter / denom if denom > 0 else 0.0
    return out
