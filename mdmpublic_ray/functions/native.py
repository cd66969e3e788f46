"""Optional native (C) scoring kernels — build-once loader.

``_native.c`` holds exact C counterparts of the two hottest pairwise
kernels (Jaro-Winkler over coded strings, bottom-k sketch Jaccard).
This module compiles it ON FIRST USE with the system C compiler into a
source-hash-keyed cache dir under the system tmpdir, loads it with
ctypes, and exposes ``get_lib()``. Every caller keeps its numpy path:
``get_lib()`` returning ``None`` (no compiler, compile error,
``GRAFT_NO_NATIVE=1``) just means the numpy kernels run instead —
same values, more memory traffic.

Design notes for multi-node use: the compile happens once per MACHINE
(shared tmpdir cache, atomic rename so concurrent workers race safely);
the .so is tiny and has no dependencies beyond libc. Nothing is
downloaded — the single C source ships in the package.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

_SRC = os.path.join(os.path.dirname(__file__), "_native.c")
_LIB: ctypes.CDLL | None = None
_TRIED = False

_i64 = ctypes.c_int64
_p_i64 = ctypes.POINTER(ctypes.c_int64)
_p_u32 = ctypes.POINTER(ctypes.c_uint32)
_p_u64 = ctypes.POINTER(ctypes.c_uint64)
_p_f64 = ctypes.POINTER(ctypes.c_double)


def _build() -> ctypes.CDLL | None:
    with open(_SRC, "rb") as f:
        src = f.read()
    tag = hashlib.sha256(src).hexdigest()[:16]
    cache = os.path.join(tempfile.gettempdir(), f"graft_native_{tag}")
    so = os.path.join(cache, "kernels.so")
    if not os.path.exists(so):
        os.makedirs(cache, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=cache, suffix=".so")
        os.close(fd)
        # -O2, NOT -ffast-math: values must stay bit-identical IEEE
        subprocess.run(
            ["cc", "-O2", "-shared", "-fPIC", "-o", tmp, _SRC],
            check=True,
            capture_output=True,
            timeout=120,
        )
        os.replace(tmp, so)  # atomic: concurrent compilers race safely
    lib = ctypes.CDLL(so)
    lib.jw_coded.restype = ctypes.c_int
    lib.jw_coded.argtypes = [
        _p_u32, _p_i64, _p_i64, _p_i64, _i64, ctypes.c_double, _i64, _p_f64,
    ]
    lib.sketch_jacc_idx.restype = None
    lib.sketch_jacc_idx.argtypes = [
        _p_u64, _i64, _p_i64, _p_i64, _p_i64, _i64, _i64, _p_f64,
    ]
    lib.sketch_jacc_rows.restype = None
    lib.sketch_jacc_rows.argtypes = [
        _p_u64, _i64, _p_i64, _p_u64, _i64, _p_i64, _i64, _i64, _p_f64,
    ]
    lib.sketch_jacc_idx2.restype = None
    lib.sketch_jacc_idx2.argtypes = [
        _p_u64, _i64, _p_i64, _p_u64, _i64, _p_i64,
        _p_i64, _p_i64, _i64, _i64, _p_f64,
    ]
    return lib


def get_lib() -> ctypes.CDLL | None:
    """The loaded kernel library, or ``None`` when unavailable.

    Memoized per process (workers each build/load once; the compile
    itself is cached on disk per machine)."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("GRAFT_NO_NATIVE"):
        return None
    try:
        _LIB = _build()
    except Exception:
        _LIB = None
    return _LIB


def ptr(arr, ctype):
    """numpy array → ctypes pointer (caller guarantees contiguity)."""
    return arr.ctypes.data_as(ctype)
