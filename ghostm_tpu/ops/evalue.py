"""Karlin-Altschul statistics: raw score -> bit score and E-value.

Computed on the HOST in float64 (SURVEY.md §2 "E-value": fp64-on-host so the
final ranking stays bit-reproducible across devices and shard counts; ranking
itself uses only the integer raw score + deterministic tie-breaks, E-values
are reported, not sorted on — SURVEY.md §7.2 "Bit-identical ranking").

Gapped (lambda, K, H) come from the published NCBI BLAST tables (the
BLOSUM62 rows of blast_stat.c's BLOSUM62_VALUES); unknown
(matrix, gap_open, gap_extend) combinations are REJECTED rather than
approximated. E-values use BLAST's finite-size correction: the effective
search space (m - l) * (n - num_seqs * l) with the length adjustment l
solved from l = ln(K * m' * n') / H by fixed-point iteration
(BLAST_ComputeLengthAdjustment's converged value).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

# (matrix, gap_open, gap_extend) -> (lambda, K, H).
# Values: NCBI BLAST blast_stat.c BLOSUM62_VALUES (gapped rows).
GAPPED_PARAMS = {
    ("BLOSUM62", 11, 2): (0.297, 0.082, 0.27),
    ("BLOSUM62", 10, 2): (0.291, 0.075, 0.23),
    ("BLOSUM62", 9, 2): (0.279, 0.058, 0.19),
    ("BLOSUM62", 8, 2): (0.264, 0.045, 0.15),
    ("BLOSUM62", 7, 2): (0.239, 0.027, 0.10),
    ("BLOSUM62", 6, 2): (0.201, 0.012, 0.061),
    ("BLOSUM62", 13, 1): (0.292, 0.071, 0.23),
    ("BLOSUM62", 12, 1): (0.283, 0.059, 0.19),
    ("BLOSUM62", 11, 1): (0.267, 0.041, 0.14),
    ("BLOSUM62", 10, 1): (0.243, 0.024, 0.10),
    ("BLOSUM62", 9, 1): (0.206, 0.010, 0.052),
}
UNGAPPED_PARAMS = {"BLOSUM62": (0.3176, 0.134, 0.4012)}


def params_for(matrix: str, gap_open: int, gap_extend: int
               ) -> Tuple[float, float, float]:
    """(lambda, K, H) for a (matrix, gap) combination; raises on combos
    with no published Karlin-Altschul fit."""
    key = (matrix, int(gap_open), int(gap_extend))
    if key not in GAPPED_PARAMS:
        known = sorted(k[1:] for k in GAPPED_PARAMS if k[0] == matrix)
        raise ValueError(
            f"no Karlin-Altschul parameters for {key}; known gap params "
            f"for {matrix}: {known or 'none'}"
        )
    return GAPPED_PARAMS[key]


def length_adjustment(
    k: float, h: float, m: np.ndarray, n: float, num_seqs: int
) -> np.ndarray:
    """BLAST finite-size length adjustment l (vectorised over query length
    m): the converged fixed point of l = ln(K (m-l)(n - N l)) / H, clamped
    so effective lengths stay positive (cf. BLAST_ComputeLengthAdjustment).
    """
    m = np.asarray(m, dtype=np.float64)
    n = float(n)
    num_seqs = max(int(num_seqs), 1)
    logk = np.log(k)
    floor_len = 1.0 / k   # BLAST floors effective lengths at 1/K
    ell = np.zeros_like(m)
    for _ in range(20):
        me = np.maximum(m - ell, floor_len)
        ne = np.maximum(n - num_seqs * ell, floor_len)
        ell = np.clip((logk + np.log(me * ne)) / h, 0.0, None)
    return np.floor(ell)


def bit_score(raw: np.ndarray, lam: float, k: float) -> np.ndarray:
    raw = np.asarray(raw, dtype=np.float64)
    return (lam * raw - np.log(k)) / np.log(2.0)


def e_value(
    raw: np.ndarray,
    qlen: np.ndarray,
    db_residues: int,
    lam: float,
    k: float,
    h: float = 0.0,
    db_seqs: int = 0,
) -> np.ndarray:
    """E = K * m' * n' * exp(-lambda * S).

    With h > 0 and db_seqs > 0, m'/n' are BLAST effective lengths (length
    adjustment above); otherwise the plain Karlin-Altschul search space.
    """
    raw = np.asarray(raw, dtype=np.float64)
    m = np.asarray(qlen, dtype=np.float64)
    n = float(db_residues)
    if h > 0.0 and db_seqs > 0:
        ell = length_adjustment(k, h, m, n, db_seqs)
        m_eff = np.maximum(m - ell, 1.0 / k)
        n_eff = np.maximum(n - db_seqs * ell, 1.0 / k)
        return k * m_eff * n_eff * np.exp(-lam * raw)
    return k * m * n * np.exp(-lam * raw)
