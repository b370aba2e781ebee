"""Collinear chaining DP (kernels/candidates.py, SURVEY.md §5.7 config 5).

Checks the segmented (max,+) scan against a direct O(M^2) oracle chain DP,
the drift scenario VERDICT r01 flagged (hits drifting >= 4 bins), subject-
boundary segmentation, and shard invariance of chain scores.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ghostm_tpu.kernels import candidates as cand

BIG = 1 << 30


def oracle_chain(keys, votes, nbins, gamma):
    """O(M^2) reference: C[i] = v[i] + max(0, max_{j<i, same subject}
    (C[j] - gamma * (key[i]-key[j])))."""
    M = len(keys)
    C = np.zeros(M, np.int64)
    for i in range(M):
        if votes[i] == 0:
            continue
        best = 0
        for j in range(i):
            if votes[j] == 0:
                continue
            if keys[j] // nbins != keys[i] // nbins:
                continue
            best = max(best, C[j] - gamma * (keys[i] - keys[j]))
        C[i] = votes[i] + best
    return C


def run_chain(sorted_keys, nbins, gamma, ncand=8):
    k, v = cand._per_query(
        jnp.asarray(sorted_keys, jnp.int32), nbins=nbins, ncand=ncand,
        min_votes=1, smooth=False, chain_gamma=gamma,
    )
    return np.asarray(k), np.asarray(v)


def test_chain_matches_oracle_random():
    rng = np.random.default_rng(0)
    nbins = 64
    for trial in range(20):
        nsubj = rng.integers(1, 6)
        M = 128
        raw = np.sort(rng.integers(0, nsubj * nbins, M)).astype(np.int32)
        n_invalid = rng.integers(0, 30)
        keys = np.concatenate([raw[: M - n_invalid],
                               np.full(n_invalid, BIG, np.int32)])
        # run-start votes for the oracle
        starts, counts = np.unique(keys[keys < BIG], return_counts=True)
        ovotes = dict(zip(starts.tolist(), counts.tolist()))
        ek = sorted(ovotes)
        ev = np.array([ovotes[x] for x in ek])
        C = oracle_chain(np.array(ek), ev, nbins, 2)
        want = {ek[i]: int(C[i]) for i in range(len(ek))}
        tk, tv = run_chain(keys, nbins, 2, ncand=len(ek) + 2)
        got = {int(a): int(b) for a, b in zip(tk, tv) if a < BIG}
        for kk, vv in got.items():
            assert want[kk] == vv, (trial, kk, vv, want[kk])
        # the top-ncand by (C desc, key asc) must be the oracle's
        order = sorted(want, key=lambda x: (-want[x], x))
        assert list(tk[: len(order)]) == order[: len(tk)]


def test_chain_drifting_hits_concentrate():
    """A long-read alignment drifting across 5 bins: chaining must rank its
    end bin above an isolated 4-vote bin elsewhere (raw votes would tie)."""
    nbins = 1024
    row = 3
    drift_bins = [100, 101, 103, 106, 110]      # drifts over 10 bins total
    keys = []
    for b in drift_bins:
        keys += [row * nbins + b] * 3           # 3 votes each
    keys += [7 * nbins + 500] * 4               # isolated competitor
    keys = np.sort(np.array(keys, np.int32))
    keys = np.concatenate([keys, np.full(64 - len(keys), BIG, np.int32)])
    tk, tv = run_chain(keys, nbins, 1)
    # chain: C(100)=3, C(101)=3+2=5, C(103)=3+3=6, C(106)=3+3=6, C(110)=3+2=5
    assert int(tk[0]) == row * nbins + 103 and int(tv[0]) == 6
    assert int(tv[0]) > 4  # beats the isolated bin


def test_chain_never_spans_subjects():
    nbins = 8  # tiny: cross-subject key gaps are small enough to tempt
    keys = np.array(
        [0 * nbins + 6] * 5 + [1 * nbins + 0] * 5, np.int32
    )
    keys = np.concatenate([keys, np.full(22, BIG, np.int32)])
    tk, tv = run_chain(keys, nbins, 1)
    got = {int(a): int(b) for a, b in zip(tk, tv) if a < BIG}
    # key distance across the boundary is only 2, but no chaining allowed
    assert got[6] == 5 and got[8] == 5


def test_chain_shard_invariance_of_scores():
    """Same subject on different shard rows -> same chain scores."""
    nbins = 256
    bins = [10, 11, 40, 41]
    votes = [2, 3, 1, 4]
    for row in (0, 5, 117):
        keys = []
        for b, v in zip(bins, votes):
            keys += [row * nbins + b] * v
        keys = np.sort(np.array(keys, np.int32))
        keys = np.concatenate([keys, np.full(16 - len(keys), BIG, np.int32)])
        tk, tv = run_chain(keys, nbins, 1)
        got = sorted(
            (int(a) - row * nbins, int(b)) for a, b in zip(tk, tv) if a < BIG
        )
        # C(10)=2, C(11)=3+max(0,2-1)=4, C(40)=1, C(41)=4+max(0,1-1)=4
        assert got == [(10, 2), (11, 4), (40, 1), (41, 4)], (row, got)
