"""ctypes bindings for the native host data path (native/lpr_native.cc).

Auto-builds the shared library on first use (g++ is in the base image) and
falls back to a PIL implementation when the toolchain/libs are unavailable,
so the framework never hard-fails on the native path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO = os.path.join(_DIR, "liblpr_native.so")
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        src = os.path.join(_DIR, "lpr_native.cc")
        if not os.path.exists(_SO) or (
            os.path.exists(src)
            and os.path.getmtime(src) > os.path.getmtime(_SO)
        ):
            subprocess.run(["make", "-C", _DIR, "-s", "-B"], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(_SO)
        lib.lpr_load_letterbox_batch.restype = ctypes.c_int
        lib.lpr_load_letterbox_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_uint8, ctypes.c_int,
        ]
        lib.lpr_decode_image.restype = ctypes.c_void_p
        lib.lpr_decode_image.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.lpr_free.argtypes = [ctypes.c_void_p]
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.lpr_pack_front_batch.restype = None
        lib.lpr_pack_front_batch.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, u8p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.lpr_letterbox_pack_batch.restype = None
        lib.lpr_letterbox_pack_batch.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, u8p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_uint8, ctypes.c_int,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


def _fallback_batch(paths: List[str], oh: int, ow: int, fill: int) -> np.ndarray:
    from PIL import Image

    out = np.full((len(paths), oh, ow, 3), fill, np.uint8)
    for i, p in enumerate(paths):
        try:
            img = Image.open(p).convert("RGB")
        except Exception:
            continue
        w, h = img.size
        r = min(oh / h, ow / w)
        nh, nw = max(int(round(h * r)), 1), max(int(round(w * r)), 1)
        rs = np.asarray(img.resize((nw, nh), Image.BILINEAR))
        t, l = (oh - nh) // 2, (ow - nw) // 2
        out[i, t : t + nh, l : l + nw] = rs
    return out


def load_letterbox_batch(
    paths: List[str], out_hw, fill: int = 0, n_threads: int = 0
) -> np.ndarray:
    """Decode + letterbox a batch of image files -> (N, oh, ow, 3) uint8.

    Parallel C++ (libjpeg/libpng + thread pool) when available; PIL
    fallback otherwise."""
    oh, ow = out_hw
    lib = _load()
    if lib is None:
        return _fallback_batch(paths, oh, ow, fill)
    n = len(paths)
    out = np.empty((n, oh, ow, 3), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.lpr_load_letterbox_batch(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        oh, ow, fill, n_threads,
    )
    return out


def pack_front_batch(
    frames: np.ndarray, det_hw, fill: int = 0, n_threads: int = 0
) -> Optional[np.ndarray]:
    """Letterbox + quarter-grid pack raw uint8 frames (N, H, W, 3) into the
    fused front kernel's packed-input layout (N, 64, RP*CP) uint8
    (PipelineConfig.packed_input; numpy reference
    pack_front_frames_host).  Parallel C++; returns None when the native
    library is unavailable (callers fall back to the numpy packer)."""
    lib = _load()
    if lib is None:
        return None
    from lpr_tpu.ops.pallas.yolo_front import front_geom

    frames = np.ascontiguousarray(frames)
    assert frames.dtype == np.uint8 and frames.ndim == 4, frames.shape
    n, h, w, _ = frames.shape
    oh, ow = det_hw
    g = front_geom(oh, ow)
    out = np.empty((n, 64, g.rp * g.cp), np.uint8)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.lpr_letterbox_pack_batch(
        frames.ctypes.data_as(u8p), n, h, w, out.ctypes.data_as(u8p),
        oh, ow, g.rp, g.cp, fill, n_threads,
    )
    return out


def decode_image(data: bytes) -> Optional[np.ndarray]:
    """Decode JPEG/PNG bytes -> (H, W, 3) uint8 (native; None on failure)."""
    lib = _load()
    if lib is None:
        import io

        from PIL import Image

        try:
            return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        except Exception:
            return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    ptr = lib.lpr_decode_image(data, len(data), ctypes.byref(w),
                               ctypes.byref(h))
    if not ptr:
        return None
    buf = ctypes.cast(
        ptr, ctypes.POINTER(ctypes.c_uint8 * (w.value * h.value * 3))
    ).contents
    arr = np.frombuffer(buf, np.uint8).reshape(h.value, w.value, 3).copy()
    lib.lpr_free(ptr)
    return arr
