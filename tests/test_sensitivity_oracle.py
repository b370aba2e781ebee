"""The sensitivity tool's device full-SW column scan must be bit-exact
against the naive CPU oracle (ghostm_tpu.oracle.sw_full) — it is the
ground truth for SENSITIVITY.json's recall numbers."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from ghostm_tpu.oracle import sw_full
from ghostm_tpu.ops.scoring import padded_matrix
from tools.sensitivity import _bucket_scan


def _gotoh_matrix(q, t, matrix, go, ge):
    """Independent full-matrix textbook Gotoh (no rolling arrays) —
    third implementation cross-checking sw_full and the device scan."""
    n, m = len(q), len(t)
    NEG = -(1 << 20)
    go1 = go + ge
    H = np.zeros((n + 1, m + 1), np.int64)
    E = np.full((n + 1, m + 1), NEG, np.int64)
    F = np.full((n + 1, m + 1), NEG, np.int64)
    best = 0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            E[i][j] = max(H[i][j - 1] - go1, E[i][j - 1] - ge)
            F[i][j] = max(H[i - 1][j] - go1, F[i - 1][j] - ge)
            H[i][j] = max(
                0, H[i - 1][j - 1] + matrix[q[i - 1], t[j - 1]],
                E[i][j], F[i][j],
            )
            best = max(best, int(H[i][j]))
    return best


def test_sw_full_is_textbook_gotoh(rng):
    """r05 regression: sw_full's vertical-gap F must be a per-column
    array across rows (the old row-carried F underpriced multi-row
    gaps — scored 19 where a legal length-2 query gap alignment
    scores 20)."""
    matrix = padded_matrix("BLOSUM62", hard_stop=True)
    for _ in range(60):
        n, m = int(rng.integers(2, 26)), int(rng.integers(2, 40))
        q = rng.integers(0, 20, n).astype(np.int64)
        t = rng.integers(0, 20, m).astype(np.int64)
        assert sw_full(q, t, matrix, 11, 1) == _gotoh_matrix(
            q, t, matrix, 11, 1
        )


def test_column_scan_matches_sw_full(rng):
    import jax.numpy as jnp

    matrix = padded_matrix("BLOSUM62", hard_stop=True)
    go1, ge = 12, 1  # gap_open 11 + extend 1, NCBI convention
    F, Lq, S, Lb = 6, 24, 5, 40
    # queries with PAD tails and a stop; subjects with pad tails
    qs = rng.integers(0, 20, (F, Lq)).astype(np.int8)
    qs[0, 10:] = 25          # PAD tail
    qs[1, 5] = 23            # stop (hard-stop LOW row)
    subs = rng.integers(0, 20, (S, Lb)).astype(np.int8)
    sub_lens = [40, 17, 3, 1, 28]
    for i, ln in enumerate(sub_lens):
        subs[i, ln:] = 31    # pad/mask
    qrows = matrix[qs.astype(np.int32)].astype(np.int32)
    got = np.asarray(_bucket_scan(
        jnp.asarray(qrows), jnp.asarray(np.ascontiguousarray(subs.T)),
        go1, ge, False,
    ))
    for f in range(F):
        for s in range(S):
            want = sw_full(
                qs[f].astype(np.int64), subs[s, : sub_lens[s]].astype(np.int64),
                matrix, 11, 1,
            )
            assert got[f, s] == want, (f, s, got[f, s], want)
    # pairwise variant: diag of the all-pairs answer
    P = min(F, S)
    gotp = np.asarray(_bucket_scan(
        jnp.asarray(qrows[:P]),
        jnp.asarray(np.ascontiguousarray(subs[:P].T)), go1, ge, True,
    ))
    assert (gotp == np.diagonal(got[:P, :P])).all()
