"""First-party native (C) components.

The reference's only native mask machinery is the pycocotools C extension
(reference: src/data/datasets/coco.py:15, src/evaluator/coco_eval.py) —
this package is its TPU-framework equivalent: a COCO RLE codec and
run-merge mask IoU implemented in C (``rle.c``), compiled on first use
with the system compiler and loaded through ctypes.  Every entry point
has a pure-numpy fallback (``rle_py``) so the framework stays functional
on hosts without a toolchain; ``HAVE_NATIVE`` says which path is live.

The C and Python implementations are written independently from the
public RLE format spec and differential-tested against each other
(tests/test_native_rle.py).
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import tempfile

import numpy as np

log = logging.getLogger("cvpytorch_tpu")

_SRC = os.path.join(os.path.dirname(__file__), "rle.c")
_I64 = ctypes.POINTER(ctypes.c_int64)
_U8 = ctypes.POINTER(ctypes.c_uint8)
_F64 = ctypes.POINTER(ctypes.c_double)

_lib = None


def _build_and_load():
    """Compile rle.c into a cached shared lib keyed by source mtime+size."""
    cache = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "cvpytorch_tpu")
    os.makedirs(cache, exist_ok=True)
    st = os.stat(_SRC)
    so = os.path.join(cache, f"librle_{st.st_mtime_ns}_{st.st_size}.so")
    if not os.path.exists(so):
        for cc in ("cc", "gcc", "clang"):
            try:
                with tempfile.NamedTemporaryFile(
                        suffix=".so", dir=cache, delete=False) as tmp:
                    pass
                subprocess.run(
                    [cc, "-O3", "-shared", "-fPIC", _SRC, "-o", tmp.name],
                    check=True, capture_output=True, timeout=120)
                os.replace(tmp.name, so)
                break
            except (OSError, subprocess.SubprocessError):
                if os.path.exists(tmp.name):
                    os.unlink(tmp.name)
        else:
            return None
    lib = ctypes.CDLL(so)
    lib.rle_decode_string.restype = ctypes.c_int64
    lib.rle_decode_string.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                      _I64, ctypes.c_int64]
    lib.rle_encode_string.restype = ctypes.c_int64
    lib.rle_encode_string.argtypes = [_I64, ctypes.c_int64,
                                      ctypes.c_char_p, ctypes.c_int64]
    lib.rle_from_mask.restype = ctypes.c_int64
    lib.rle_from_mask.argtypes = [_U8, ctypes.c_int64, _I64, ctypes.c_int64]
    lib.rle_to_mask.restype = None
    lib.rle_to_mask.argtypes = [_I64, ctypes.c_int64, _U8, ctypes.c_int64]
    lib.rle_area.restype = ctypes.c_int64
    lib.rle_area.argtypes = [_I64, ctypes.c_int64]
    lib.rle_iou_matrix.restype = None
    lib.rle_iou_matrix.argtypes = [_I64, _I64, _I64, ctypes.c_int64,
                                   _I64, _I64, _I64, ctypes.c_int64,
                                   _U8, _F64]
    lib.coco_match.restype = None
    lib.coco_match.argtypes = [_F64, ctypes.c_int64, ctypes.c_int64,
                               _F64, ctypes.c_int64,
                               _U8, _U8, _I64, _U8, _U8, _U8]
    lib.coco_match_areas.restype = None
    lib.coco_match_areas.argtypes = [
        _F64, ctypes.c_int64, ctypes.c_int64, _F64, ctypes.c_int64,
        _U8, _U8, _F64, _F64, _F64, _F64, ctypes.c_int64,
        _U8, _U8, _I64, _U8, _I64]
    return lib


try:
    _lib = _build_and_load()
except Exception as e:  # pragma: no cover - toolchain-specific
    log.warning("native RLE build failed (%s); using numpy fallback", e)
    _lib = None

HAVE_NATIVE = _lib is not None


def _as_i64(a):
    return np.ascontiguousarray(a, np.int64)


def rle_decode_string(s) -> np.ndarray:
    """Compressed COCO RLE string → int64 run counts (first run = zeros)."""
    if isinstance(s, str):
        s = s.encode("ascii")
    if _lib is not None:
        buf = np.empty(len(s) + 4, np.int64)   # ≥1 run per varint char
        m = _lib.rle_decode_string(s, len(s), buf.ctypes.data_as(_I64),
                                   buf.size)
        if m >= 0:
            return buf[:m].copy()
    from . import rle_py
    return rle_py.decode_string(s)


def rle_encode_string(counts) -> str:
    """int64 run counts → compressed COCO RLE string."""
    counts = _as_i64(counts)
    if _lib is not None:
        buf = ctypes.create_string_buffer(int(counts.size) * 16 + 16)
        n = _lib.rle_encode_string(counts.ctypes.data_as(_I64),
                                   counts.size, buf, len(buf))
        if n >= 0:
            return buf.raw[:n].decode("ascii")
    from . import rle_py
    return rle_py.encode_string(counts)


def rle_from_mask(mask: np.ndarray) -> np.ndarray:
    """uint8/bool (H, W) mask → run counts over the COLUMN-major raster."""
    flat = np.ascontiguousarray(mask.T.reshape(-1), np.uint8)
    if _lib is not None:
        buf = np.empty(flat.size + 2, np.int64)
        m = _lib.rle_from_mask(flat.ctypes.data_as(_U8), flat.size,
                               buf.ctypes.data_as(_I64), buf.size)
        if m >= 0:
            return buf[:m].copy()
    from . import rle_py
    return rle_py.from_mask_flat(flat)


def rle_to_mask(counts, height: int, width: int) -> np.ndarray:
    """Run counts → uint8 (H, W) mask (column-major raster order)."""
    counts = _as_i64(counts)
    flat = np.empty(height * width, np.uint8)
    if _lib is not None:
        _lib.rle_to_mask(counts.ctypes.data_as(_I64), counts.size,
                         flat.ctypes.data_as(_U8), flat.size)
    else:
        from . import rle_py
        flat = rle_py.to_mask_flat(counts, height * width)
    return flat.reshape(width, height).T


def rle_area(counts) -> int:
    counts = _as_i64(counts)
    if _lib is not None:
        return int(_lib.rle_area(counts.ctypes.data_as(_I64), counts.size))
    from . import rle_py
    return rle_py.area(counts)


def rle_iou(dt_counts: list, gt_counts: list,
            iscrowd: np.ndarray) -> np.ndarray:
    """Pairwise IoU matrix (D, G) between two lists of run-count arrays
    on the same canvas; crowd GT → intersection / det-area."""
    D, G = len(dt_counts), len(gt_counts)
    out = np.zeros((D, G))
    if D == 0 or G == 0:
        return out
    crowd = np.ascontiguousarray(iscrowd, np.uint8)
    if _lib is not None:
        dc = _as_i64(np.concatenate(dt_counts))
        gc = _as_i64(np.concatenate(gt_counts))
        dlen = _as_i64([len(c) for c in dt_counts])
        glen = _as_i64([len(c) for c in gt_counts])
        doff = _as_i64(np.concatenate([[0], np.cumsum(dlen)[:-1]]))
        goff = _as_i64(np.concatenate([[0], np.cumsum(glen)[:-1]]))
        _lib.rle_iou_matrix(
            dc.ctypes.data_as(_I64), doff.ctypes.data_as(_I64),
            dlen.ctypes.data_as(_I64), D,
            gc.ctypes.data_as(_I64), goff.ctypes.data_as(_I64),
            glen.ctypes.data_as(_I64), G,
            crowd.ctypes.data_as(_U8), out.ctypes.data_as(_F64))
        return out
    from . import rle_py
    return rle_py.iou(dt_counts, gt_counts, crowd)


def coco_match(ious, thrs, gt_ig, gt_crowd, gt_order):
    """Greedy COCO matching (one image/category/areaRng cell) in C.

    ious (D, G) float64, thrs (T,), gt_ig / gt_crowd (G,) bool,
    gt_order (G,) int64 (non-ignored first) → (dtm, dtig) (T, D) bool.
    Returns None when the native lib is unavailable (caller falls back to
    the pure-python loop in evaluator/coco.py — differential-tested
    against this path in tests/test_native_rle.py)."""
    if _lib is None:
        return None
    ious = np.ascontiguousarray(ious, np.float64)
    D, G = ious.shape
    thrs = np.ascontiguousarray(thrs, np.float64)
    T = thrs.size
    gt_ig8 = np.ascontiguousarray(gt_ig, np.uint8)
    crowd8 = np.ascontiguousarray(gt_crowd, np.uint8)
    order = _as_i64(gt_order)
    dtm = np.zeros((T, D), np.uint8)
    dtig = np.zeros((T, D), np.uint8)
    scratch = np.empty(max(G, 1), np.uint8)
    _lib.coco_match(ious.ctypes.data_as(_F64), D, G,
                    thrs.ctypes.data_as(_F64), T,
                    gt_ig8.ctypes.data_as(_U8), crowd8.ctypes.data_as(_U8),
                    order.ctypes.data_as(_I64),
                    dtm.ctypes.data_as(_U8), dtig.ctypes.data_as(_U8),
                    scratch.ctypes.data_as(_U8))
    return dtm.astype(bool), dtig.astype(bool)


def coco_match_areas(ious, thrs, gt_base_ig, gt_crowd, gt_areas, dt_areas,
                     area_ranges):
    """All-areaRng greedy matching in ONE C call per (image, category):
    per range builds the gt-ignore set (base | area-out-of-range), the
    stable non-ignored-first order, matches all T thresholds, and applies
    the unmatched-det out-of-range ignore.

    → (dtm (A,T,D) bool, dtig (A,T,D) bool, npig (A,) int) or None when
    the native lib is unavailable."""
    if _lib is None:
        return None
    ious = np.ascontiguousarray(ious, np.float64)
    D, G = ious.shape
    thrs = np.ascontiguousarray(thrs, np.float64)
    T = thrs.size
    lo = np.ascontiguousarray([r[0] for r in area_ranges], np.float64)
    hi = np.ascontiguousarray([r[1] for r in area_ranges], np.float64)
    A = lo.size
    base8 = np.ascontiguousarray(gt_base_ig, np.uint8)
    crowd8 = np.ascontiguousarray(gt_crowd, np.uint8)
    ga = np.ascontiguousarray(gt_areas, np.float64)
    da = np.ascontiguousarray(dt_areas, np.float64)
    dtm = np.zeros((A, T, D), np.uint8)
    dtig = np.zeros((A, T, D), np.uint8)
    npig = np.zeros(A, np.int64)
    scratch = np.empty(max(2 * G, 1), np.uint8)
    order = np.empty(max(G, 1), np.int64)
    _lib.coco_match_areas(
        ious.ctypes.data_as(_F64), D, G, thrs.ctypes.data_as(_F64), T,
        base8.ctypes.data_as(_U8), crowd8.ctypes.data_as(_U8),
        ga.ctypes.data_as(_F64), da.ctypes.data_as(_F64),
        lo.ctypes.data_as(_F64), hi.ctypes.data_as(_F64), A,
        dtm.ctypes.data_as(_U8), dtig.ctypes.data_as(_U8),
        npig.ctypes.data_as(_I64), scratch.ctypes.data_as(_U8),
        order.ctypes.data_as(_I64))
    return dtm.astype(bool), dtig.astype(bool), npig
