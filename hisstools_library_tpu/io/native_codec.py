"""ctypes bindings for the native PCM codec (native/hisstools_codec.cpp).

The shared library is built on demand with g++ and cached next to the sources;
loading failures fall back silently to the numpy codecs in audio_file.py (the
behaviour is identical — the native path exists for data-loader throughput on
large multichannel IR banks, mirroring the reference's C++ conversion loops).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "hisstools_codec.cpp")
_OUT = os.path.join(os.path.dirname(_SRC), "libhisstools_codec.so")


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _OUT, _SRC],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native codec; None if unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_OUT) or (
            os.path.exists(_SRC) and os.path.getmtime(_SRC) > os.path.getmtime(_OUT)):
        if not os.path.exists(_SRC) or not _build():
            return None
    try:
        lib = ctypes.CDLL(_OUT)
    except OSError:
        return None
    lib.ht_decode_pcm.restype = ctypes.c_int
    lib.ht_decode_pcm.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_void_p]
    lib.ht_encode_pcm.restype = ctypes.c_int
    lib.ht_encode_pcm.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_void_p]
    lib.ht_codec_version.restype = ctypes.c_int32
    _LIB = lib
    return _LIB


def available() -> bool:
    return load() is not None


_BYTES = {0: 1, 1: 2, 2: 3, 3: 4, 4: 4, 5: 8}


def decode_pcm(raw: bytes, fmt: int, little_endian: bool,
               wave_uint8: bool = False) -> Optional[np.ndarray]:
    """Decode PCM bytes to normalised float64; None if native path unavailable."""
    lib = load()
    if lib is None:
        return None
    n = len(raw) // _BYTES[fmt]
    out = np.empty(n, np.float64)
    buf = np.frombuffer(raw, np.uint8)
    rc = lib.ht_decode_pcm(
        buf.ctypes.data_as(ctypes.c_void_p), n, fmt,
        1 if little_endian else 0, 1 if wave_uint8 else 0,
        out.ctypes.data_as(ctypes.c_void_p))
    return out if rc == 0 else None


def encode_pcm(x: np.ndarray, fmt: int, little_endian: bool,
               wave_uint8: bool = False) -> Optional[bytes]:
    """Encode normalised float64 samples to PCM bytes; None if unavailable."""
    lib = load()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float64)
    n = x.size
    out = np.empty(n * _BYTES[fmt], np.uint8)
    rc = lib.ht_encode_pcm(
        x.ctypes.data_as(ctypes.c_void_p), n, fmt,
        1 if little_endian else 0, 1 if wave_uint8 else 0,
        out.ctypes.data_as(ctypes.c_void_p))
    return out.tobytes() if rc == 0 else None
