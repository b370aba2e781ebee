"""Substitution matrices and the padded scoring table used on device.

The BLOSUM62 table below is the standard NCBI 24x24 matrix in alphabet order
ARNDCQEGHILKMFPSTWYVBZX* (matches ghostm_tpu.ops.encode.AA_ALPHABET). The
reference tool scores with BLOSUM62 by default (SURVEY.md §2 "Substitution
matrix"; mount was empty — value is the family/NCBI standard, not a file cite).

On device the matrix is padded to 32x32 int32 so that codes index directly
(ALPHA=32 lanes) and the extra rows implement:
  - SENTINEL (24): LOW vs everything — SW cannot cross subject boundaries;
  - PAD (25): LOW vs everything — query padding never extends an alignment;
  - hard-stop mode: '*' (23) rescored to LOW so alignments cannot span a stop
    codon, approximating GHOSTM's split-at-stop query handling with static
    shapes (design divergence documented in SURVEY.md §7.2).
"""

from __future__ import annotations

import numpy as np

from ghostm_tpu.ops.encode import ALPHA, AA_STOP, PAD, SENTINEL

# Effectively -inf for int32 DP that adds at most a few scores before a max:
# large negative but far from int32 overflow.
LOW = -(1 << 20)

_B62_ROWS = """
 4 -1 -2 -2  0 -1 -1  0 -2 -1 -1 -1 -1 -2 -1  1  0 -3 -2  0 -2 -1  0 -4
-1  5  0 -2 -3  1  0 -2  0 -3 -2  2 -1 -3 -2 -1 -1 -3 -2 -3 -1  0 -1 -4
-2  0  6  1 -3  0  0  0  1 -3 -3  0 -2 -3 -2  1  0 -4 -2 -3  3  0 -1 -4
-2 -2  1  6 -3  0  2 -1 -1 -3 -4 -1 -3 -3 -1  0 -1 -4 -3 -3  4  1 -1 -4
 0 -3 -3 -3  9 -3 -4 -3 -3 -1 -1 -3 -1 -2 -3 -1 -1 -2 -2 -1 -3 -3 -2 -4
-1  1  0  0 -3  5  2 -2  0 -3 -2  1  0 -3 -1  0 -1 -2 -1 -2  0  3 -1 -4
-1  0  0  2 -4  2  5 -2  0 -3 -3  1 -2 -3 -1  0 -1 -3 -2 -2  1  4 -1 -4
 0 -2  0 -1 -3 -2 -2  6 -2 -4 -4 -2 -3 -3 -2  0 -2 -2 -3 -3 -1 -2 -1 -4
-2  0  1 -1 -3  0  0 -2  8 -3 -3 -1 -2 -1 -2 -1 -2 -2  2 -3  0  0 -1 -4
-1 -3 -3 -3 -1 -3 -3 -4 -3  4  2 -3  1  0 -3 -2 -1 -3 -1  3 -3 -3 -1 -4
-1 -2 -3 -4 -1 -2 -3 -4 -3  2  4 -2  2  0 -3 -2 -1 -2 -1  1 -4 -3 -1 -4
-1  2  0 -1 -3  1  1 -2 -1 -3 -2  5 -1 -3 -1  0 -1 -3 -2 -2  0  1 -1 -4
-1 -1 -2 -3 -1  0 -2 -3 -2  1  2 -1  5  0 -2 -1 -1 -1 -1  1 -3 -1 -1 -4
-2 -3 -3 -3 -2 -3 -3 -3 -1  0  0 -3  0  6 -4 -2 -2  1  3 -1 -3 -3 -1 -4
-1 -2 -2 -1 -3 -1 -1 -2 -2 -3 -3 -1 -2 -4  7 -1 -1 -4 -3 -2 -2 -1 -2 -4
 1 -1  1  0 -1  0  0  0 -1 -2 -2  0 -1 -2 -1  4  1 -3 -2 -2  0  0  0 -4
 0 -1  0 -1 -1 -1 -1 -2 -2 -1 -1 -1 -1 -2 -1  1  5 -2 -2  0 -1 -1  0 -4
-3 -3 -4 -4 -2 -2 -3 -2 -2 -3 -2 -3 -1  1 -4 -3 -2 11  2 -3 -4 -3 -2 -4
-2 -2 -2 -3 -2 -1 -2 -3  2 -1 -1 -2 -1  3 -3 -2 -2  2  7 -1 -3 -2 -1 -4
 0 -3 -3 -3 -1 -2 -2 -3 -3  3  1 -2  1 -1 -2 -2  0 -3 -1  4 -3 -2 -1 -4
-2 -1  3  4 -3  0  1 -1  0 -3 -4  0 -3 -3 -2  0 -1 -4 -3 -3  4  1 -1 -4
-1  0  0  1 -3  3  4 -2  0 -3 -3  1 -1 -3 -1  0 -1 -3 -2 -2  1  4 -1 -4
 0 -1 -1 -1 -2 -1 -1 -1 -1 -1 -1 -1 -1 -1 -2  0  0 -2 -1 -1 -1 -1 -1 -4
-4 -4 -4 -4 -4 -4 -4 -4 -4 -4 -4 -4 -4 -4 -4 -4 -4 -4 -4 -4 -4 -4 -4  1
"""

BLOSUM62 = np.array(
    [[int(v) for v in row.split()] for row in _B62_ROWS.strip().splitlines()],
    dtype=np.int32,
)
assert BLOSUM62.shape == (24, 24) and (BLOSUM62 == BLOSUM62.T).all()

MATRICES = {"BLOSUM62": BLOSUM62}


def padded_matrix(name: str = "BLOSUM62", hard_stop: bool = True) -> np.ndarray:
    """(ALPHA, ALPHA) int32 scoring table for device use (see module doc)."""
    m = MATRICES[name]
    out = np.full((ALPHA, ALPHA), LOW, dtype=np.int32)
    out[: m.shape[0], : m.shape[1]] = m
    out[SENTINEL, :] = LOW
    out[:, SENTINEL] = LOW
    out[PAD, :] = LOW
    out[:, PAD] = LOW
    if hard_stop:
        out[AA_STOP, :] = LOW
        out[:, AA_STOP] = LOW
    return out
