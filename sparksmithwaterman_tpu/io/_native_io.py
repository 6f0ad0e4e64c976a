"""ctypes bindings for the native FASTA parser (csrc/fasta.c).

The Python line iterator in :mod:`io.fasta` parses reference files at
~90 MB/s; the native parser is memcpy-bound (>1 GB/s), which matters at
the reference corpus scale (26.6 Gbp over 518 files, ``README.md:36-38``
of the reference).  Falls back silently: :func:`parse_ref_native`
raising ``OSError``/``RuntimeError`` means "use the Python path".

Byte semantics match ``io.fasta.get_ref_seqs`` for ASCII files with
'\\n'/'\\r\\n'/'\\r' line terminators (the Python path additionally
honors the exotic Unicode line breaks of ``str.splitlines``; files
using those fall back via the parity check in ``get_ref_seqs``'s
caller-visible contract — sequence data is ASCII in practice).
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Tuple

import numpy as np

from sparksmithwaterman_tpu.ops import _native

_ERRORS = {
    1: "cannot open file",
    2: "file is empty",
    3: "no leading metadata line",
    4: "out of memory",
}

_configured = False


def _lib() -> ctypes.CDLL:
    global _configured
    lib = _native._load()
    if not _configured:
        lib.swtpu_parse_ref.restype = ctypes.c_int
        lib.swtpu_parse_ref.argtypes = [
            ctypes.c_char_p,  # path
            ctypes.c_char_p,  # delim
            ctypes.POINTER(ctypes.POINTER(ctypes.c_char)),  # seq_blob
            ctypes.POINTER(ctypes.POINTER(ctypes.c_longlong)),  # seq_off
            ctypes.POINTER(ctypes.POINTER(ctypes.c_char)),  # meta_blob
            ctypes.POINTER(ctypes.POINTER(ctypes.c_longlong)),  # meta_off
            ctypes.POINTER(ctypes.c_longlong),  # n
        ]
        lib.swtpu_free.restype = None
        lib.swtpu_free.argtypes = [ctypes.c_void_p]
        _configured = True
    return lib


def parse_ref_native(path: str | os.PathLike, delimiter: str) -> List[Tuple[str, str]]:
    """(metadata, sequence) records of a reference file, parsed in C.

    Raises ValueError with the same meaning as the Python parser for
    empty/invalid files; RuntimeError for native-side failures.
    """
    lib = _lib()
    seq_blob = ctypes.POINTER(ctypes.c_char)()
    seq_off = ctypes.POINTER(ctypes.c_longlong)()
    meta_blob = ctypes.POINTER(ctypes.c_char)()
    meta_off = ctypes.POINTER(ctypes.c_longlong)()
    n = ctypes.c_longlong(0)
    rc = lib.swtpu_parse_ref(
        str(path).encode(),
        delimiter.encode(),
        ctypes.byref(seq_blob),
        ctypes.byref(seq_off),
        ctypes.byref(meta_blob),
        ctypes.byref(meta_off),
        ctypes.byref(n),
    )
    if rc == 2:
        raise ValueError(f"Reference file is empty: {path}")
    if rc == 3:
        raise ValueError(
            f"Reference file does not start with metadata "
            f"(delimiter {delimiter!r}): {path}"
        )
    if rc != 0:
        raise RuntimeError(
            f"native FASTA parse failed ({_ERRORS.get(rc, rc)}): {path}"
        )
    try:
        count = n.value
        soff = np.ctypeslib.as_array(seq_off, shape=(count + 1,)).tolist()
        moff = np.ctypeslib.as_array(meta_off, shape=(count + 1,)).tolist()
        # One whole-blob decode + str slicing beats a per-record
        # bytes-slice + decode loop ~2x at corpus scale.
        seqs = ctypes.string_at(seq_blob, soff[count]).decode("latin-1")
        metas = ctypes.string_at(meta_blob, moff[count]).decode("latin-1")
        return [
            (metas[moff[i] : moff[i + 1]], seqs[soff[i] : soff[i + 1]])
            for i in range(count)
        ]
    finally:
        lib.swtpu_free(seq_blob)
        lib.swtpu_free(seq_off)
        lib.swtpu_free(meta_blob)
        lib.swtpu_free(meta_off)
