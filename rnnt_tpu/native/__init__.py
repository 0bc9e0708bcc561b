"""Native host-side runtime components (C++ via ctypes).

Builds ``librnnt_host.so`` from tokenizer.cc on first use (g++ is part of
the toolchain); every consumer has a pure-Python fallback, so the framework
works without a compiler — the native path is the production input-pipeline
speed path.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

_DIR = Path(__file__).resolve().parent
_SO = _DIR / "librnnt_host.so"
_SRC = _DIR / "tokenizer.cc"

_lib = None
_build_failed = False


def load_native():
    """Returns the loaded ctypes library, building it if necessary, or None
    when unavailable (missing compiler etc.)."""
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    try:
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 str(_SRC), "-o", str(_SO)],
                check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(str(_SO))
        lib.rnnt_tok_create.restype = ctypes.c_void_p
        lib.rnnt_tok_create.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                        ctypes.c_int32, ctypes.c_float]
        lib.rnnt_tok_destroy.argtypes = [ctypes.c_void_p]
        lib.rnnt_tok_encode.restype = ctypes.c_int32
        lib.rnnt_tok_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
        lib.rnnt_edit_distance.restype = ctypes.c_int32
        lib.rnnt_edit_distance.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
        _lib = lib
        return _lib
    except Exception:
        _build_failed = True
        return None
