"""ctypes binding for the native GGUF codec library (native/ggufc).

The library is optional: if it hasn't been built (make -C native/ggufc) or
can't be loaded, the pure-numpy codecs in tts_tpu.core.quant are used.  It is
built automatically on first use when a compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_lock = threading.Lock()
_lib = None
_tried = False

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native", "ggufc")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libggufc.so")


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib():
    """Returns the loaded library or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and os.environ.get("TTS_TPU_NO_NATIVE_BUILD") != "1":
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        for name in ("ggufc_dequant_q4_0", "ggufc_dequant_q5_0",
                     "ggufc_dequant_q8_0", "ggufc_f16_to_f32",
                     "ggufc_bf16_to_f32"):
            fn = getattr(lib, name)
            fn.argtypes = [u8p, f32p, ctypes.c_int64, ctypes.c_int]
            fn.restype = None
        lib.ggufc_quant_q8_0.argtypes = [f32p, u8p, ctypes.c_int64, ctypes.c_int]
        lib.ggufc_quant_q8_0.restype = None
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def _call(fn_name: str, raw: np.ndarray, n_elements: int,
          n_threads: int | None = None) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty(n_elements, np.float32)
    raw = np.ascontiguousarray(raw)
    n_threads = n_threads or min(os.cpu_count() or 1, 16)
    getattr(lib, fn_name)(
        raw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_elements, n_threads)
    return out


def dequant_q4_0(raw, n):
    return _call("ggufc_dequant_q4_0", raw, n)


def dequant_q5_0(raw, n):
    return _call("ggufc_dequant_q5_0", raw, n)


def dequant_q8_0(raw, n):
    return _call("ggufc_dequant_q8_0", raw, n)


def f16_to_f32(raw, n):
    return _call("ggufc_f16_to_f32", raw, n)


def bf16_to_f32(raw, n):
    return _call("ggufc_bf16_to_f32", raw, n)


def quant_q8_0(arr: np.ndarray) -> bytes | None:
    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(arr, np.float32).reshape(-1)
    n = x.size
    n_blocks = (n + 31) // 32
    out = np.empty(n_blocks * 34, np.uint8)
    lib.ggufc_quant_q8_0(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, min(os.cpu_count() or 1, 16))
    return out.tobytes()
