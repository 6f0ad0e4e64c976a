"""ctypes bindings for the native host-runtime helpers (csrc/).

The shared library is built on demand (one ``cc`` invocation, cached
next to the sources); if no C toolchain is available the import fails
and callers fall back to the pure-Python path (ops/traceback.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Tuple

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "csrc")
_LIB_PATH = os.path.join(_CSRC, "libswtpu.so")
_lock = threading.Lock()
_lib = None


_SOURCES = ("traceback.c", "fasta.c")


def _build() -> None:
    srcs = [os.path.join(_CSRC, s) for s in _SOURCES]
    subprocess.run(
        ["cc", "-O3", "-fPIC", "-shared", "-Wall", "-o", _LIB_PATH] + srcs,
        check=True,
        capture_output=True,
    )


def _load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        newest = max(
            os.path.getmtime(os.path.join(_CSRC, s)) for s in _SOURCES
        )
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < newest:
            _build()
        lib = ctypes.CDLL(_LIB_PATH)
        lib.sw_traceback_batch.restype = None
        lib.sw_traceback_batch.argtypes = [
            ctypes.POINTER(ctypes.c_int8),  # dirs
            ctypes.c_int32,  # m
            ctypes.c_int32,  # n
            ctypes.POINTER(ctypes.c_int32),  # cells
            ctypes.c_int32,  # k
            ctypes.c_char_p,  # ref
            ctypes.c_char_p,  # read
            ctypes.c_char,  # gap
            ctypes.POINTER(ctypes.c_char),  # ref_out
            ctypes.POINTER(ctypes.c_char),  # read_out
            ctypes.POINTER(ctypes.c_int32),  # lens
            ctypes.POINTER(ctypes.c_int32),  # begins
        ]
        _lib = lib
        return lib


def traceback_batch(
    dirs: np.ndarray,
    cells: np.ndarray,
    ref_seq: str,
    read_seq: str,
    gap_char: str = "_",
) -> List[Tuple[int, Tuple[str, str]]]:
    """All-start-cells traceback for one pair; same contract as
    ops.traceback.sites_from_fill's per-cell walk."""
    lib = _load()
    m, n = len(read_seq), len(ref_seq)
    dirs_c = np.ascontiguousarray(dirs[:m, :n], dtype=np.int8)
    cells_c = np.ascontiguousarray(cells, dtype=np.int32)
    k = cells_c.shape[0]
    cap = m + n
    ref_out = np.empty((k, cap), dtype=np.uint8)
    read_out = np.empty((k, cap), dtype=np.uint8)
    lens = np.empty(k, dtype=np.int32)
    begins = np.empty(k, dtype=np.int32)
    lib.sw_traceback_batch(
        dirs_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        np.int32(m),
        np.int32(n),
        cells_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        np.int32(k),
        ref_seq.encode(),
        read_seq.encode(),
        gap_char.encode(),
        ref_out.ctypes.data_as(ctypes.POINTER(ctypes.c_char)),
        read_out.ctypes.data_as(ctypes.POINTER(ctypes.c_char)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        begins.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    sites = []
    for t in range(k):
        length = int(lens[t])
        sites.append(
            (
                int(begins[t]),
                (
                    ref_out[t, cap - length :].tobytes().decode(),
                    read_out[t, cap - length :].tobytes().decode(),
                ),
            )
        )
    return sites
