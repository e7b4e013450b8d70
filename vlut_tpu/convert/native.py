"""ctypes bindings for the native pack/ternarize library (csrc/).

Builds csrc/vlut_pack.cpp on first use (g++ -O3 -march=native, cached next
to the source); every entry point has a numpy fallback so the framework
stays usable without a compiler.  Correctness contract: bit-identical to
vlut_tpu/ops/packing.py (tested in tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import logging
import pathlib
import subprocess
import threading

import numpy as np

log = logging.getLogger("vlut_tpu.native")

_CSRC = pathlib.Path(__file__).resolve().parents[2] / "csrc"
_SRC = _CSRC / "vlut_pack.cpp"
_SO = _CSRC / "libvlutpack.so"
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> pathlib.Path | None:
    if _SO.exists() and _SO.stat().st_mtime >= _SRC.stat().st_mtime:
        return _SO
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
        str(_SRC), "-o", str(_SO),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _SO
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        log.warning("native build failed (%s); using numpy fallback", e)
        return None


def get_lib():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        so = _build()
        if so is None:
            return None
        lib = ctypes.CDLL(str(so))
        i64 = ctypes.c_int64
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.vlut_pack_i2.argtypes = [i8p, u8p, i64, i64, i64]
        lib.vlut_pack_i1.argtypes = [i8p, u8p, i64, i64, i64]
        lib.vlut_unpack_i2.argtypes = [u8p, i8p, i64, i64, i64]
        lib.vlut_unpack_i1.argtypes = [u8p, i8p, i64, i64, i64]
        lib.vlut_ternarize_absmean.argtypes = [f32p, i8p, i64]
        lib.vlut_ternarize_absmean.restype = ctypes.c_float
        lib.vlut_detect_ternary.argtypes = [f32p, i64]
        lib.vlut_detect_ternary.restype = ctypes.c_float
        _lib = lib
        return _lib


def pack(trits_padded: np.ndarray, fmt: str, kb: int) -> np.ndarray | None:
    """(kp, n) padded trits -> packed; None if native lib unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    kp, n = trits_padded.shape
    r = 4 if fmt == "i2" else 5
    out = np.empty((kp // r, n), np.uint8)
    trits_padded = np.ascontiguousarray(trits_padded, np.int8)
    fn = lib.vlut_pack_i2 if fmt == "i2" else lib.vlut_pack_i1
    fn(trits_padded, out, kp, n, kb)
    return out


def unpack(packed: np.ndarray, fmt: str, kb: int, kp: int) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    n = packed.shape[1]
    out = np.empty((kp, n), np.int8)
    packed = np.ascontiguousarray(packed, np.uint8)
    fn = lib.vlut_unpack_i2 if fmt == "i2" else lib.vlut_unpack_i1
    fn(packed, out, kp, n, kb)
    return out


def ternarize_absmean(w: np.ndarray):
    lib = get_lib()
    if lib is None:
        return None
    w = np.ascontiguousarray(w, np.float32)
    trits = np.empty(w.size, np.int8)
    scale = lib.vlut_ternarize_absmean(w.reshape(-1), trits, w.size)
    return trits.reshape(w.shape), np.float32(scale)


def detect_ternary(w: np.ndarray):
    lib = get_lib()
    if lib is None:
        return None
    w = np.ascontiguousarray(w, np.float32)
    return float(lib.vlut_detect_ternary(w.reshape(-1), w.size))
