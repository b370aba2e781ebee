"""Karlin-Altschul statistics: raw score -> bit score and E-value.

Computed on the HOST in float64 (SURVEY.md §2 "E-value": fp64-on-host so the
final ranking stays bit-reproducible across devices and shard counts; ranking
itself uses only the integer raw score + deterministic tie-breaks, E-values
are reported, not sorted on — SURVEY.md §7.2 "Bit-identical ranking").
"""

from __future__ import annotations

import numpy as np


def bit_score(raw: np.ndarray, lam: float, k: float) -> np.ndarray:
    raw = np.asarray(raw, dtype=np.float64)
    return (lam * raw - np.log(k)) / np.log(2.0)


def e_value(
    raw: np.ndarray, qlen: np.ndarray, db_residues: int, lam: float, k: float
) -> np.ndarray:
    """E = K * m * n * exp(-lambda * S) (plain Karlin-Altschul search space)."""
    raw = np.asarray(raw, dtype=np.float64)
    m = np.asarray(qlen, dtype=np.float64)
    return k * m * float(db_residues) * np.exp(-lam * raw)
