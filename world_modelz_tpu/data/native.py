"""ctypes loader for the native host-pipeline kernels.

Compiles `_native/compositor.cpp` with g++ at first use (cached next to the
source as a platform-tagged .so); every entry point degrades to a numpy
implementation when no compiler is available, so the package works anywhere.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sysconfig
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "_native", "compositor.cpp")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    tag = sysconfig.get_platform().replace("-", "_")
    so_path = os.path.join(
        os.path.dirname(_SRC), f"compositor_{tag}.so"
    )
    if not os.path.isfile(so_path) or os.path.getmtime(
        so_path
    ) < os.path.getmtime(_SRC):
        try:
            subprocess.run(
                [
                    "g++", "-O3", "-march=native", "-shared", "-fPIC",
                    _SRC, "-o", so_path,
                ],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except (OSError, subprocess.SubprocessError):
            return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None

    lib.composite_sprite.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.clamp01.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
    lib.render_trajectory.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    with _LOCK:
        if not _TRIED:
            if os.environ.get("WMZ_DISABLE_NATIVE"):
                _LIB = None
            else:
                _LIB = _build_and_load()
            globals()["_TRIED"] = True
    return _LIB


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def composite_sprite(
    frames: np.ndarray, sprite: np.ndarray, pos_yx: np.ndarray
) -> None:
    """frames (T,H,W) f32 += sprite (K,K) at per-frame clipped positions."""
    lib = get_lib()
    t, h, w = frames.shape
    k = sprite.shape[0]
    if lib is not None:
        assert frames.flags.c_contiguous
        lib.composite_sprite(
            _ptr(frames, ctypes.c_float), t, h, w,
            _ptr(np.ascontiguousarray(sprite, np.float32), ctypes.c_float),
            k,
            _ptr(np.ascontiguousarray(pos_yx, np.int32), ctypes.c_int32),
        )
        return
    for i in range(t):  # numpy fallback
        sy, sx = int(pos_yx[i, 0]), int(pos_yx[i, 1])
        y0, y1 = max(0, sy), min(h, sy + k)
        x0, x1 = max(0, sx), min(w, sx + k)
        if y1 <= y0 or x1 <= x0:
            continue
        frames[i, y0:y1, x0:x1] += sprite[y0 - sy : y1 - sy, x0 - sx : x1 - sx]


def clamp01(frames: np.ndarray) -> None:
    lib = get_lib()
    if lib is not None and frames.flags.c_contiguous:
        lib.clamp01(_ptr(frames, ctypes.c_float), frames.size)
    else:
        np.clip(frames, 0.0, 1.0, out=frames)


def render_trajectory(
    out: np.ndarray, bg: np.ndarray, shifts: np.ndarray, rects: np.ndarray
) -> None:
    """out (T,H,W,3) u8 <- scrolled bg + colored rects; see compositor.cpp."""
    lib = get_lib()
    t, h, w, _ = out.shape
    n = rects.shape[1]
    if lib is not None:
        lib.render_trajectory(
            _ptr(out, ctypes.c_uint8), t, h, w,
            _ptr(np.ascontiguousarray(bg, np.float32), ctypes.c_float),
            _ptr(np.ascontiguousarray(shifts, np.int32), ctypes.c_int32),
            _ptr(np.ascontiguousarray(rects, np.float32), ctypes.c_float),
            n,
        )
        return
    for i in range(t):  # numpy fallback
        shift = int(shifts[i]) % w
        frame = np.clip(bg[:, shift : shift + w], 0, 255).astype(np.uint8)
        for r in rects[i]:
            y0, x0, k = int(r[0]), int(r[1]), int(r[2])
            y0c, y1c = max(0, y0), min(h, y0 + k)
            x0c, x1c = max(0, x0), min(w, x0 + k)
            frame[y0c:y1c, x0c:x1c] = r[3:6].astype(np.uint8)
        out[i] = frame
