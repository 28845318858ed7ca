"""Native (C++) host-side runtime components.

Compiled on first use with g++ into a plain-C-ABI shared object and loaded
through ctypes — no build-system or binding-generator dependency. Every
entry point has a pure-numpy fallback so the framework works (slower) on
hosts without a toolchain; `native_available()` reports which path is live.
Set PHARMAFORGE_NATIVE=0 to force the Python fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_SRC = Path(__file__).parent / "packer.cpp"
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _TRIED
    _TRIED = True
    if os.environ.get("PHARMAFORGE_NATIVE", "1") == "0":
        return None
    cache_dir = Path(os.environ.get("PHARMAFORGE_NATIVE_CACHE",
                                    Path.home() / ".cache" / "pharmaforge_tpu"))
    cache_dir.mkdir(parents=True, exist_ok=True)
    import hashlib
    tag = hashlib.sha256(_SRC.read_bytes()).hexdigest()[:16]
    so_path = cache_dir / f"packer_{tag}.so"
    if not so_path.exists():
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 str(_SRC), "-o", str(so_path)],
                check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(so_path))
    except OSError:
        return None

    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.pack_batch.restype = ctypes.c_int
    lib.pack_batch.argtypes = [f32p, i32p, i64p, ctypes.c_int64,
                               ctypes.c_int64, ctypes.c_int64,
                               f32p, f32p, u8p]
    lib.pack_batch_gather.restype = ctypes.c_int
    lib.pack_batch_gather.argtypes = [f32p, i32p, i64p, i64p,
                                      ctypes.c_int64, ctypes.c_int64,
                                      ctypes.c_int64, f32p, f32p, u8p]
    return lib


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is None and not _TRIED:
        _LIB = _build_and_load()
    return _LIB


def native_available() -> bool:
    return _lib() is not None


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def pack_batch(pos_flat: np.ndarray, feat_flat: np.ndarray,
               spans: np.ndarray, slots: int, n_classes: int):
    """Pack contiguous spans into (x [B,slots,3], h [B,slots,C], mask [B,slots]).

    Native when available; numpy fallback otherwise. `spans` is int64 [B,2].
    """
    pos_flat = np.ascontiguousarray(pos_flat, np.float32)
    feat_flat = np.ascontiguousarray(feat_flat, np.int32)
    spans = np.ascontiguousarray(spans, np.int64)
    b = spans.shape[0]
    out_x = np.empty((b, slots, 3), np.float32)
    out_h = np.empty((b, slots, n_classes), np.float32)
    out_mask = np.empty((b, slots), np.uint8)

    lib = _lib()
    if lib is not None:
        rc = lib.pack_batch(
            _ptr(pos_flat, ctypes.c_float), _ptr(feat_flat, ctypes.c_int32),
            _ptr(spans, ctypes.c_int64), b, slots, n_classes,
            _ptr(out_x, ctypes.c_float), _ptr(out_h, ctypes.c_float),
            _ptr(out_mask, ctypes.c_uint8))
        if rc != 0:
            raise ValueError(f"a span exceeds the slot count {slots}")
        return out_x, out_h, out_mask.astype(bool)

    # numpy fallback
    out_x[:] = 0.0
    out_h[:] = 0.0
    out_mask[:] = 0
    eye = np.eye(n_classes, dtype=np.float32)
    for i, (s, e) in enumerate(spans):
        n = e - s
        if n > slots or n < 0:
            raise ValueError(f"a span exceeds the slot count {slots}")
        out_x[i, :n] = pos_flat[s:e]
        out_h[i, :n] = eye[feat_flat[s:e]]
        out_mask[i, :n] = 1
    return out_x, out_h, out_mask.astype(bool)


def pack_batch_gather(pos_flat: np.ndarray, feat_flat: np.ndarray,
                      idx_flat: np.ndarray, offsets: np.ndarray,
                      slots: int, n_classes: int):
    """Gather-based packing for subsample augmentation.

    Row i packs elements idx_flat[offsets[i]:offsets[i+1]].
    """
    pos_flat = np.ascontiguousarray(pos_flat, np.float32)
    feat_flat = np.ascontiguousarray(feat_flat, np.int32)
    idx_flat = np.ascontiguousarray(idx_flat, np.int64)
    offsets = np.ascontiguousarray(offsets, np.int64)
    b = offsets.shape[0] - 1
    out_x = np.empty((b, slots, 3), np.float32)
    out_h = np.empty((b, slots, n_classes), np.float32)
    out_mask = np.empty((b, slots), np.uint8)

    lib = _lib()
    if lib is not None:
        rc = lib.pack_batch_gather(
            _ptr(pos_flat, ctypes.c_float), _ptr(feat_flat, ctypes.c_int32),
            _ptr(idx_flat, ctypes.c_int64), _ptr(offsets, ctypes.c_int64),
            b, slots, n_classes,
            _ptr(out_x, ctypes.c_float), _ptr(out_h, ctypes.c_float),
            _ptr(out_mask, ctypes.c_uint8))
        if rc != 0:
            raise ValueError(f"a row exceeds the slot count {slots}")
        return out_x, out_h, out_mask.astype(bool)

    out_x[:] = 0.0
    out_h[:] = 0.0
    out_mask[:] = 0
    eye = np.eye(n_classes, dtype=np.float32)
    for i in range(b):
        sel = idx_flat[offsets[i]:offsets[i + 1]]
        n = len(sel)
        if n > slots:
            raise ValueError(f"a row exceeds the slot count {slots}")
        out_x[i, :n] = pos_flat[sel]
        out_h[i, :n] = eye[feat_flat[sel]]
        out_mask[i, :n] = 1
    return out_x, out_h, out_mask.astype(bool)
