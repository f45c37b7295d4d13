"""ctypes bindings for the native event packer (native/evpack.cpp).

The shared library is built on first use (g++, ~1 s); if no toolchain is
available the caller falls back to the vectorized numpy path in
`data.events`. Both implementations are semantics-identical (tested
against each other in tests/test_events_native.py).
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)
    ))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libevpack.so")

_lock = threading.Lock()
_lib = None
_unavailable = False

_I64P = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_U16P = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
_U8P = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")


def _load():
    global _lib, _unavailable
    with _lock:
        if _lib is not None or _unavailable:
            return _lib
        try:
            if not os.path.isfile(_LIB_PATH):
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR, "libevpack.so"],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(_LIB_PATH)
            lib.evpack_pack.restype = ctypes.c_int64
            lib.evpack_pack.argtypes = [
                _U16P, _U16P, _I64P, _U8P,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                _I64P, _I64P, _I64P, _I64P, _I64P,
            ]
            lib.evpack_max_refractory.restype = ctypes.c_int64
            lib.evpack_max_refractory.argtypes = [
                _U16P, _U16P, _I64P,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ]
            _lib = lib
        except Exception:
            _unavailable = True
        return _lib


def available():
    return _load() is not None


def pack_events(positions, timestamps, polarities, img_height, img_width):
    """Native single-pass packing; same contract as
    `data.events.pack_events`. Returns None if the library is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    n = len(timestamps)
    x = np.ascontiguousarray(positions[:, 0], np.uint16)
    y = np.ascontiguousarray(positions[:, 1], np.uint16)
    t = np.ascontiguousarray(timestamps, np.int64)
    p = np.ascontiguousarray(polarities, np.uint8)
    out_position = np.empty((n, 2), np.int64)
    out_start = np.empty(n, np.int64)
    out_end = np.empty(n, np.int64)
    out_num_pos = np.empty(n, np.int64)
    out_num_neg = np.empty(n, np.int64)
    v = lib.evpack_pack(
        x, y, t, p, n, int(img_width), int(img_height),
        out_position.reshape(-1), out_start, out_end,
        out_num_pos, out_num_neg,
    )
    return {
        "position": out_position[:v].copy(),
        "start_ts": out_start[:v].copy(),
        "end_ts": out_end[:v].copy(),
        "num_pos": out_num_pos[:v].copy(),
        "num_neg": out_num_neg[:v].copy(),
    }


def max_refractory_period(positions, timestamps, img_height, img_width):
    """Native max-refractory extraction; returns None if unavailable,
    inf when no pixel has two distinct timestamps."""
    lib = _load()
    if lib is None:
        return None
    x = np.ascontiguousarray(positions[:, 0], np.uint16)
    y = np.ascontiguousarray(positions[:, 1], np.uint16)
    t = np.ascontiguousarray(timestamps, np.int64)
    out = lib.evpack_max_refractory(
        x, y, t, len(t), int(img_width), int(img_height)
    )
    return np.array(float("inf")) if out < 0 else np.asarray(out)
