"""ctypes bindings for the native (C++) host data path.

``native/vfi_data.cc`` fuses the whole per-sample augmentation pipeline
(crop, channel reverse, flips, rot90 with flow fixups, uint8->float
normalize) into a single pass. The library is built with
``make -C native`` and loaded lazily; the numpy pipeline
(``data/augment.py``) remains the fallback and the test oracle.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_LIB = None
_LIB_TRIED = False

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"


def _load():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    so = _NATIVE_DIR / "libvfi_data.so"
    if not so.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:
        return None

    u8 = ctypes.POINTER(ctypes.c_uint8)
    f32 = ctypes.POINTER(ctypes.c_float)
    lib.vfi_augment_triplet.restype = ctypes.c_int
    lib.vfi_augment_triplet.argtypes = [
        u8, u8, u8, f32, f32,
        ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, f32,
    ]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def augment_triplet_native(
    x0: np.ndarray,
    x1: np.ndarray,
    xt: np.ndarray,
    f0x: np.ndarray | None,
    f1x: np.ndarray | None,
    *,
    crop_hw: tuple[int, int],
    h_off: int,
    w_off: int,
    chan_reverse: bool,
    vflip: bool,
    hflip: bool,
    rot: int,
    img_scale: float = 1.0 / 255.0,
    flow_scale: float = 1.0,
) -> np.ndarray | None:
    """Fused native augmentation; returns the HWC float32 stack
    ``[x0|x1|xt(|f0x|f1x)]`` or None when the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    assert x0.dtype == np.uint8 and x0.flags.c_contiguous
    h, w, _ = x0.shape
    ch, cw = crop_hw
    have_flow = f0x is not None and f1x is not None
    oh, ow = (ch, cw) if rot % 2 == 0 else (cw, ch)
    oc = 9 + (4 if have_flow else 0)
    out = np.empty((oh, ow, oc), np.float32)

    def fp(a):
        if a is None:
            return ctypes.cast(None, ctypes.POINTER(ctypes.c_float))
        a = np.ascontiguousarray(a, np.float32)
        return _ptr(a, ctypes.c_float)

    # keep contiguous float arrays alive through the call
    f0c = None if f0x is None else np.ascontiguousarray(f0x, np.float32)
    f1c = None if f1x is None else np.ascontiguousarray(f1x, np.float32)

    rc = lib.vfi_augment_triplet(
        _ptr(x0, ctypes.c_uint8), _ptr(x1, ctypes.c_uint8),
        _ptr(xt, ctypes.c_uint8),
        fp(f0c), fp(f1c),
        h, w, ch, cw, h_off, w_off,
        int(chan_reverse), int(vflip), int(hflip), int(rot) & 3,
        img_scale, flow_scale, _ptr(out, ctypes.c_float),
    )
    if rc != 0:
        return None
    return out
