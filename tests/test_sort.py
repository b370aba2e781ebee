"""Pallas bitonic row sort vs np.sort, and vote ranking equivalence
(SURVEY.md §4.2 "Kernel" row — interpret mode on CPU, compiled on TPU)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax

from ghostm_tpu.kernels import candidates as cand
from ghostm_tpu.kernels.sort import sort_rows


@pytest.mark.parametrize(
    "q,m", [(8, 128), (16, 100), (64, 2560), (5, 7), (128, 1)]
)
def test_sort_rows_matches_np(rng, q, m):
    x = rng.integers(-(1 << 30), 1 << 30, (q, m)).astype(np.int32)
    got = np.asarray(sort_rows(jnp.asarray(x), interpret=True))
    assert np.array_equal(got, np.sort(x, axis=1))


def test_sort_rows_with_big_padding(rng):
    # the vote path pads invalid hits with BIG; they must sort to the tail
    x = rng.integers(0, 1 << 20, (32, 300)).astype(np.int32)
    x[rng.random((32, 300)) < 0.5] = int(cand.BIG)
    got = np.asarray(sort_rows(jnp.asarray(x), interpret=True))
    assert np.array_equal(got, np.sort(x, axis=1))


@pytest.mark.parametrize("q,m,run", [(16, 2560, 64), (8, 256, 16), (8, 512, 512)])
def test_sort_rows_presorted_runs(rng, q, m, run):
    """Stage-skip path: runs pre-sorted ascending (even block) / descending
    (odd block) must sort bit-identically to the full network."""
    x = rng.integers(0, 1 << 28, (q, m)).astype(np.int32)
    x[rng.random((q, m)) < 0.3] = int(cand.BIG)
    x3 = np.sort(x.reshape(q, m // run, run), axis=2)
    x3[:, 1::2] = x3[:, 1::2, ::-1]
    xr = x3.reshape(q, m)
    got = np.asarray(
        sort_rows(jnp.asarray(xr), presorted_run=run, interpret=True)
    )
    assert np.array_equal(got, np.sort(x, axis=1))


@pytest.mark.parametrize(
    "q,m,run,minv", [(16, 2560, 64, 1), (8, 640, 128, 2), (8, 96, 1, 1)]
)
def test_sort_vote_rank_kernel_matches_xla(rng, q, m, run, minv):
    """The fused sort+vote+top-k kernel (r04) must be bit-identical to
    sort_rows + vmapped _per_query — keys, votes, tie order, min_votes
    filtering, zero-vote tail — incl. the presorted-run stage skip."""
    import functools

    from ghostm_tpu.kernels.sort import sort_vote_rank_rows

    nbins, ncand = 128, 8
    keys = rng.integers(0, 40 * nbins, (q, m)).astype(np.int32)
    keys[rng.random((q, m)) < 0.4] = int(cand.BIG)
    if run > 1:
        k3 = np.sort(keys.reshape(q, m // run, run), axis=2)
        k3[:, 1::2] = k3[:, 1::2, ::-1]
        keys = k3.reshape(q, m)
    gk, gv = sort_vote_rank_rows(
        jnp.asarray(keys), ncand, minv, presorted_run=run, interpret=True
    )
    ref = np.sort(keys, axis=1)
    fn = functools.partial(
        cand._per_query, nbins=nbins, ncand=ncand, min_votes=minv,
        smooth=False, chain_gamma=0,
    )
    wk, wv = jax.vmap(fn)(jnp.asarray(ref))
    np.testing.assert_array_equal(np.asarray(gk), np.asarray(wk))
    np.testing.assert_array_equal(np.asarray(gv), np.asarray(wv))


@pytest.mark.parametrize(
    "q,nruns,run,minv", [(8, 36, 128, 1), (8, 9, 128, 1), (6, 6, 256, 2),
                         (8, 5, 1024, 1)]
)
def test_split_sort_merge_vote_matches_monolithic(rng, q, nruns, run, minv):
    """The r05 split-sort path (sort leading 2^a runs + remainder
    separately, bitonic-merge + vote in one kernel) must be
    bit-identical to the monolithic fused kernel — including the
    config-2 shape (36 runs of 128)."""
    from ghostm_tpu.kernels.sort import (
        merge_vote_rank_rows, sort_rows, sort_vote_rank_rows,
    )

    m = nruns * run
    ncand = 8
    keys = rng.integers(0, 1 << 24, (q, m)).astype(np.int32)
    keys[rng.random((q, m)) < 0.4] = int(cand.BIG)
    # heavy duplication across runs so votes actually stack
    keys[rng.random((q, m)) < 0.3] = 12345
    k3 = np.sort(keys.reshape(q, nruns, run), axis=2)
    k3[:, 1::2] = k3[:, 1::2, ::-1]
    keys_r = k3.reshape(q, m)
    want_k, want_v = sort_vote_rank_rows(
        jnp.asarray(keys_r), ncand, minv, presorted_run=run, interpret=True
    )
    m1 = run << (nruns.bit_length() - 1)
    A = sort_rows(jnp.asarray(keys_r[:, :m1]), presorted_run=run,
                  interpret=True)
    B = sort_rows(jnp.asarray(keys_r[:, m1:]), presorted_run=run,
                  interpret=True)
    got_k, got_v = merge_vote_rank_rows(A, B, ncand, minv, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_k), np.asarray(want_k))
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))


@pytest.mark.parametrize("q,m,nk,nops,topk", [
    (64, 48, 5, 9, 10), (16, 16, 3, 3, 8), (8, 100, 2, 4, 100),
])
def test_lex_rank_rows_matches_lax_sort(rng, q, m, nk, nops, topk):
    """The multi-operand lexicographic bitonic must match variadic
    lax.sort on its first nk keys. Both are stable (lax.sort defaults
    is_stable=True; the kernel carries the original index as its final
    compare key), so outputs must agree even on full-key ties; the
    row-unique nk-th key additionally pins payload association."""
    import jax.numpy as jnp2
    from jax import lax

    from ghostm_tpu.kernels.sort import lex_rank_rows

    ops = [rng.integers(0, 6, (q, m)).astype(np.int32) for _ in range(nk - 1)]
    ops.append(
        np.stack([rng.permutation(m) for _ in range(q)]).astype(np.int32)
    )
    ops += [rng.integers(-50, 50, (q, m)).astype(np.int32)
            for _ in range(nops - nk)]
    got = lex_rank_rows(
        tuple(jnp2.asarray(o) for o in ops), nk, topk, interpret=True
    )
    want = lax.sort(tuple(jnp2.asarray(o) for o in ops), num_keys=nk)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w)[:, :topk])


def test_lex_rank_rows_stable_on_full_key_ties(rng):
    """Full-key ties with DIFFERING payloads: both paths are stable, so
    payload association must match exactly."""
    from jax import lax

    from ghostm_tpu.kernels.sort import lex_rank_rows

    q, m, nk = 32, 64, 3
    ops = [rng.integers(0, 3, (q, m)).astype(np.int32) for _ in range(nk)]
    ops += [rng.integers(0, 1000, (q, m)).astype(np.int32)
            for _ in range(4)]
    got = lex_rank_rows(
        tuple(jnp.asarray(o) for o in ops), nk, m, interpret=True
    )
    want = lax.sort(tuple(jnp.asarray(o) for o in ops), num_keys=nk)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_vote_and_rank_matches_topk_reference(rng):
    """The packed-argmax ranking must reproduce lax.top_k's exact
    (votes desc, first-index) contract, including tie handling."""
    Q, M, nbins, ncand = 16, 96, 64, 4
    # small key space forces many duplicate keys (= real votes) and ties
    keys = rng.integers(0, 12 * nbins, (Q, M)).astype(np.int32)
    keys[rng.random((Q, M)) < 0.3] = int(cand.BIG)
    sid = jnp.asarray(np.arange(64, dtype=np.int32))
    g, b, v = cand.vote_and_rank(
        jnp.asarray(keys), sid, ncand, 1, False, nbins
    )
    # reference: count votes per key with numpy, rank by (votes desc, key)
    for qi in range(Q):
        kk = keys[qi][keys[qi] < int(cand.BIG)]
        uniq, cnt = np.unique(kk, return_counts=True)
        order = np.lexsort((uniq, -cnt))
        want = uniq[order][:ncand]
        wantv = cnt[order][:ncand]
        gsid = np.asarray(g[qi])
        lbin = np.asarray(b[qi])
        votes = np.asarray(v[qi])
        n = min(ncand, len(want))
        for c in range(n):
            assert votes[c] == wantv[c]
            assert gsid[c] == want[c] // nbins
            assert lbin[c] == want[c] % nbins
        for c in range(len(want), ncand):
            assert votes[c] == 0
