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
