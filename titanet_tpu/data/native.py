"""ctypes bindings to the native C++ audio decoder (native/audioio.cpp).

Auto-builds ``libaudioio.so`` on first use if a compiler is available
(``make -C native``); raises a clear error otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libaudioio.so")

_lib: Optional[ctypes.CDLL] = None
_lock = threading.Lock()


def _build() -> None:
    subprocess.run(
        ["make", "-C", _NATIVE_DIR, "-s"],
        check=True,
        capture_output=True,
        text=True,
    )


def _load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO_PATH):
            try:
                _build()
            except Exception as e:
                raise RuntimeError(
                    f"native audio decoder not built and build failed: {e}. "
                    f"Run `make -C {_NATIVE_DIR}`."
                ) from e
        lib = ctypes.CDLL(_SO_PATH)
        lib.audioio_decode_flac.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.audioio_decode_flac.restype = ctypes.c_int
        lib.audioio_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
        lib.audioio_free.restype = None
        _lib = lib
        return lib


def read_flac(path: str) -> Tuple[np.ndarray, int]:
    """Decode FLAC -> (float32 [C, T], sample_rate)."""
    lib = _load()
    out = ctypes.POINTER(ctypes.c_float)()
    n_frames = ctypes.c_int64()
    channels = ctypes.c_int32()
    rate = ctypes.c_int32()
    rc = lib.audioio_decode_flac(
        path.encode(), ctypes.byref(out), ctypes.byref(n_frames),
        ctypes.byref(channels), ctypes.byref(rate),
    )
    if rc != 0:
        raise ValueError(f"FLAC decode failed for {path} (rc={rc})")
    try:
        n = n_frames.value * channels.value
        flat = np.ctypeslib.as_array(out, shape=(n,)).copy()
    finally:
        lib.audioio_free(out)
    wav = flat.reshape(n_frames.value, channels.value).T
    return np.ascontiguousarray(wav), rate.value
