"""ctypes bindings for the native host-side helpers (libaqcsv.so).

The library is built on demand with `make` (the toolchain is part of the
environment; the reference similarly builds server.so at startup via its
build manager, build.py:205-247). If the build fails, callers fall back
to the pure-Python/pandas paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libaqcsv.so")
_lib: ctypes.CDLL | None = None
_tried = False


def get_lib() -> ctypes.CDLL | None:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("AQ_TPU_NO_NATIVE") in ("1", "true"):
        return None
    if not os.path.exists(_LIB_PATH) or (
        os.path.getmtime(_LIB_PATH)
        < os.path.getmtime(os.path.join(_DIR, "csvscan.cpp"))
    ):
        try:
            subprocess.run(["make", "-C", _DIR, "-s"], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.aq_csv_count_rows.restype = ctypes.c_int64
        lib.aq_csv_count_rows.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                          ctypes.c_char]
        lib.aq_csv_parse.restype = ctypes.c_int
        lib.aq_csv_parse.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_char, ctypes.c_int,
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_void_p), ctypes.c_int64, ctypes.c_int,
        ]
        lib.aq_csv_parse2.restype = ctypes.c_int
        lib.aq_csv_parse2.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_char, ctypes.c_int,
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_void_p),      # uint8* validity buffers
            ctypes.POINTER(ctypes.c_int64),       # per-column null counts
            ctypes.c_int64, ctypes.c_int,
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


_SPEC = {"int32": b"i", "int64": b"l", "float32": b"f", "float64": b"d"}


def parse_numeric_csv(path: str, dtypes: list[np.dtype], sep: str,
                      skip_header: bool
                      ) -> tuple[list[np.ndarray],
                                 list[np.ndarray | None]] | None:
    """Parse an all-numeric CSV with the native scanner. Returns
    (column arrays, per-column validity masks or None when no cell was
    empty), or None if unsupported/unavailable. Empty cells are SQL
    NULLs: value 0 + validity False."""
    lib = get_lib()
    if lib is None:
        return None
    spec = b""
    for dt in dtypes:
        c = _SPEC.get(np.dtype(dt).name)
        if c is None:
            return None
        spec += c
    with open(path, "rb") as f:
        data = f.read()
    total = lib.aq_csv_count_rows(data, len(data), sep.encode()[0])
    nrows = int(total) - (1 if skip_header else 0)
    if nrows <= 0:
        return [np.zeros(0, dt) for dt in dtypes], [None] * len(dtypes)
    cols = [np.empty(nrows, dt) for dt in dtypes]
    valids = [np.empty(nrows, np.uint8) for _ in dtypes]
    ptrs = (ctypes.c_void_p * len(cols))(
        *[c.ctypes.data_as(ctypes.c_void_p) for c in cols])
    vptrs = (ctypes.c_void_p * len(cols))(
        *[v.ctypes.data_as(ctypes.c_void_p) for v in valids])
    null_counts = (ctypes.c_int64 * len(cols))()
    nthreads = min(os.cpu_count() or 1, 16)
    rc = lib.aq_csv_parse2(data, len(data), sep.encode()[0],
                           1 if skip_header else 0, spec, len(cols),
                           ptrs, vptrs, null_counts, nrows, nthreads)
    if rc != 0:
        return None
    masks = [valids[i].astype(bool) if null_counts[i] else None
             for i in range(len(cols))]
    return cols, masks
