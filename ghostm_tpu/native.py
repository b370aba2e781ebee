"""ctypes bindings for the native host kernels (native/ghostm_native.cpp).

Reference parity: GHOSTM's index builder and FASTA reader are native C++
host code (SURVEY.md §2); this module binds the TPU-build's C++ equivalents
and transparently falls back to the numpy implementations when the shared
library has not been built (`make -C native`). Outputs are bit-identical to
the numpy path (tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

log = logging.getLogger("ghostm_tpu.native")

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "native",
    "libghostm_native.so",
)
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", os.path.dirname(_LIB_PATH), "-s"],
                check=True, capture_output=True, timeout=120,
            )
        except Exception as e:  # toolchain missing: numpy fallback
            log.debug("native build unavailable: %s", e)
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:
        log.debug("native load failed: %s", e)
        return None
    lib.kmer_csr.restype = ctypes.c_int64
    lib.kmer_csr.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.fasta_scan.restype = ctypes.c_int
    lib.fasta_scan.argtypes = [ctypes.c_char_p] + [ctypes.c_void_p] * 3
    lib.fasta_read.restype = ctypes.c_int
    lib.fasta_read.argtypes = [ctypes.c_char_p] + [ctypes.c_void_p] * 5
    try:
        lib.m8_format_rows.restype = ctypes.c_int64
        lib.m8_format_rows.argtypes = (
            [ctypes.c_int64] + [ctypes.c_void_p] * 17 + [ctypes.c_int64]
        )
    except AttributeError:  # stale .so from an older build
        log.debug("stale native library: no m8_format_rows; rebuild with "
                  "`make -C native`")
        lib.m8_format_rows = None
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def kmer_csr(
    buf: np.ndarray, k: int, keep: Optional[np.ndarray] = None
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Native seed-index build. Returns (positions, bucket_starts) or None
    if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    buf = np.ascontiguousarray(buf, dtype=np.int8)
    nb = 20**k
    positions = np.empty(max(len(buf), 1), dtype=np.int32)
    bucket_starts = np.zeros(nb + 2, dtype=np.int32)
    keep_arr = None
    keep_ptr = None
    if keep is not None:
        keep_arr = np.ascontiguousarray(keep, dtype=np.uint8)
        keep_ptr = keep_arr.ctypes.data_as(ctypes.c_void_p)
    n = lib.kmer_csr(
        buf.ctypes.data_as(ctypes.c_void_p), len(buf), k, keep_ptr,
        positions.ctypes.data_as(ctypes.c_void_p),
        bucket_starts.ctypes.data_as(ctypes.c_void_p),
    )
    return positions[:n].copy(), bucket_starts


def read_fasta_protein(path: str) -> Optional[Tuple[List[str], List[np.ndarray]]]:
    """Native FASTA read -> (names, encoded int8 sequences), or None."""
    lib = _load()
    if lib is None:
        return None
    nrec = ctypes.c_int64()
    nres = ctypes.c_int64()
    nname = ctypes.c_int64()
    if lib.fasta_scan(path.encode(), ctypes.byref(nrec), ctypes.byref(nres),
                      ctypes.byref(nname)):
        return None
    if nrec.value == 0:
        return [], []
    arena = np.empty(max(nres.value, 1), dtype=np.int8)
    starts = np.empty(nrec.value, dtype=np.int64)
    lens = np.empty(nrec.value, dtype=np.int64)
    names_buf = ctypes.create_string_buffer(max(nname.value, 1))
    name_offs = np.empty(nrec.value, dtype=np.int64)
    if lib.fasta_read(
        path.encode(), arena.ctypes.data_as(ctypes.c_void_p),
        starts.ctypes.data_as(ctypes.c_void_p),
        lens.ctypes.data_as(ctypes.c_void_p),
        names_buf, name_offs.ctypes.data_as(ctypes.c_void_p),
    ):
        return None
    raw = names_buf.raw
    names = []
    seqs = []
    for i in range(nrec.value):
        off = int(name_offs[i])
        end = raw.index(b"\0", off)
        names.append(raw[off:end].decode())
        seqs.append(arena[int(starts[i]) : int(starts[i]) + int(lens[i])].copy())
    return names, seqs


def m8_format(
    qrow: np.ndarray, qarena: bytes, qoff: np.ndarray,
    srow: np.ndarray, sarena: bytes, soff: np.ndarray,
    pident: np.ndarray, length: np.ndarray, mismatch: np.ndarray,
    gapopen: np.ndarray, qs: np.ndarray, qe: np.ndarray,
    ss: np.ndarray, se: np.ndarray, evalue: np.ndarray, bits: np.ndarray,
) -> Optional[bytes]:
    """Native BLAST-m8 row formatting (report.write_hits's per-row loop —
    ~290 ms/40k-row batch in CPython vs ~10 ms here, GIL released during
    the call). Byte-identical to the Python f-strings (fuzz-checked in
    tests/test_native.py). Returns the formatted bytes, or None when the
    library is unavailable."""
    lib = _load()
    if lib is None or getattr(lib, "m8_format_rows", None) is None:
        return None
    n = len(qrow)
    if n == 0:
        return b""
    qrow = np.ascontiguousarray(qrow, np.int32)
    srow = np.ascontiguousarray(srow, np.int32)
    qoff = np.ascontiguousarray(qoff, np.int64)
    soff = np.ascontiguousarray(soff, np.int64)
    f8 = lambda a: np.ascontiguousarray(a, np.float64)
    i4 = lambda a: np.ascontiguousarray(a, np.int32)
    i8 = lambda a: np.ascontiguousarray(a, np.int64)
    cols = (f8(pident), i4(length), i4(mismatch), i4(gapopen),
            i8(qs), i8(qe), i8(ss), i8(se), f8(evalue), f8(bits))
    name_bytes = int(
        (qoff[qrow + 1] - qoff[qrow]).sum() + (soff[srow + 1] - soff[srow]).sum()
    )
    out = ctypes.create_string_buffer(name_bytes + 160 * n)
    p = ctypes.c_void_p
    w = lib.m8_format_rows(
        n, qrow.ctypes.data_as(p), qarena, qoff.ctypes.data_as(p),
        srow.ctypes.data_as(p), sarena, soff.ctypes.data_as(p),
        *(c.ctypes.data_as(p) for c in cols), out, len(out),
    )
    if w < 0:  # capacity bound violated — cannot happen, but stay safe
        return None
    return out.raw[: int(w)]
