"""Diagonal voting + candidate proposal (SURVEY.md §2 "Diagonal voting").

Reference equivalent: GHOSTM accumulates seed hits per (subject, diagonal)
cell and keeps the top-N regions per query. TPU-native re-design with a
shard-invariance contract (SURVEY.md §7.2):

  * every hit is keyed by (subject, SUBJECT-LOCAL diagonal bin) — values
    independent of how subjects are packed into shard buffers. Within a
    shard the subject is the local row, PACKED with the bin into ONE int32
    (row * nbins + bin), so grouping needs a single-key sort; rows convert
    to global subject ids only when proposals leave the shard;
  * votes are counted scatter-free: sort + run-length via a cummin/cummax
    neighbour pass (static shapes, no scatter);
  * per-query ranking uses lax.top_k over the vote counts — on ties it
    keeps the earliest position in the (row, bin)-sorted order, which IS
    the deterministic key (votes desc, subject asc, bin asc);
  * each shard only PROPOSES its top-N; the engine selects the global
    top-N across shards (all_gather on the mesh, host concat in the loop
    path), so the SW candidate set — and hence the output table — is
    identical for any shard count.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

BIG = jnp.int32(1 << 30)


def _per_query(k: jnp.ndarray, nbins: int, ncand: int, min_votes: int,
               smooth: bool, chain_gamma: int = 0):
    """k: (M,) int32 packed (row * nbins + bin) hit keys, SORTED ascending
    (invalid = BIG, at the tail). Returns (key (ncand,), votes (ncand,)) by
    (votes desc, key asc).

    chain_gamma > 0 enables COLLINEAR CHAINING (SURVEY.md §5.7, config 5):
    ranking uses chain scores C instead of raw per-bin votes, where
      C[i] = votes[i] + max(0, max_{j<i} (C[j] - gamma * (key[j..i] bin
             distance)))
    — the classic collinear-chaining DP over diagonal runs, with a linear
    drift penalty of `gamma` votes per bin. Long-read alignments whose
    diagonal drifts across many bins (indels over kbp queries) then
    concentrate their seed support on the chain's best bin instead of
    splitting it. TPU-native form: the DP is a first-order (max, +)
    recurrence RM[i] = max(votes[i] + gamma*key[i], RM[i-1] + votes[i]),
    solved by a log2(M)-step SEGMENTED Hillis-Steele scan over the
    associative operator (A1,B1)x(A2,B2) = (max(A2, A1+B2), B1+B2),
    segmented at subject boundaries so chains can never span subjects —
    which also keeps chain scores shard-invariant (keys are shard-local,
    bin DISTANCES within a subject are not)."""
    M = k.shape[0]
    valid = k < BIG
    first = jnp.concatenate([valid[:1], (k[1:] != k[:-1]) & valid[1:]])
    idx = jnp.arange(M, dtype=jnp.int32)
    # Next run boundary per position; invalid positions are boundaries too,
    # else the last valid run would swallow the invalid tail.
    bnd = first | ~valid
    s_next = jnp.concatenate([jnp.where(bnd, idx, BIG)[1:], jnp.int32([M])])
    next_start = lax.cummin(s_next, axis=0, reverse=True)
    votes = jnp.where(first, next_start - idx, 0)
    if chain_gamma > 0:
        NEGC = jnp.int32(-(1 << 30))
        gam = jnp.int32(chain_gamma)
        row = k // nbins              # invalid (BIG) rows segment alone
        A = jnp.where(valid, votes + gam * k, NEGC)
        B = votes
        F = jnp.concatenate(
            [jnp.ones(1, jnp.bool_), row[1:] != row[:-1]]
        )
        d = 1
        while d < M:
            As = jnp.concatenate([jnp.full(d, NEGC), A[:-d]])
            Bs = jnp.concatenate([jnp.zeros(d, jnp.int32), B[:-d]])
            Fs = jnp.concatenate([jnp.ones(d, jnp.bool_), F[:-d]])
            A = jnp.maximum(A, jnp.where(F, NEGC, As + B))
            B = jnp.where(F, B, Bs + B)
            F = F | Fs
            d *= 2
        rm_ex = jnp.concatenate([jnp.full(1, NEGC), A[:-1]])
        same_seg = jnp.concatenate(
            [jnp.zeros(1, jnp.bool_), row[1:] == row[:-1]]
        )
        rm_ex = jnp.where(same_seg, rm_ex, NEGC)
        chained = votes + jnp.maximum(0, rm_ex - gam * k)
        votes = jnp.where(first, chained, 0)
    if smooth:
        # (row, bin+-1) neighbour runs are adjacent in sorted order; a
        # key+-1 neighbour is same-subject iff the bin does not wrap.
        rep_idx = lax.cummax(jnp.where(bnd, idx, 0), axis=0)
        nxt = jnp.clip(next_start, 0, M - 1)
        prv = rep_idx[jnp.clip(rep_idx - 1, 0, M - 1)]
        b = k % nbins
        add_n = jnp.where((k[nxt] == k + 1) & (b + 1 < nbins), votes[nxt], 0)
        add_p = jnp.where((k[prv] == k - 1) & (b > 0), votes[prv], 0)
        votes = votes + jnp.where(first, add_n + add_p, 0)
    votes = jnp.where(votes >= min_votes, votes, 0)
    # Iterative packed argmax instead of lax.top_k: top_k lowers to a full
    # variadic sort on TPU (~75 ms/chunk); ncand max-reductions cost ~1 ms.
    # pack = (votes, M-1-idx): max() picks (votes desc, idx asc), exactly
    # top_k's first-index-on-ties contract. Run starts are key-ascending in
    # idx, so idx-asc == key-asc.
    shift = M.bit_length()
    top_keys, top_votes = [], []
    if 2 * shift > 31:
        # (votes << shift | idx) overflows int32 for very long frames
        # (10 kbp reads: M = Lq * expand > 32k); same contract via two
        # reductions per candidate: max votes, then first index at that max.
        vcur = votes
        for _ in range(ncand):
            v = jnp.max(vcur)
            i = jnp.min(jnp.where(vcur == v, idx, jnp.int32(M - 1)))
            top_votes.append(v)
            top_keys.append(jnp.where(v > 0, k[i], BIG))
            vcur = jnp.where(idx == i, 0, vcur)
        return jnp.stack(top_keys), jnp.stack(top_votes)
    pk = (votes << shift) | (M - 1 - idx)
    for _ in range(ncand):
        m = jnp.max(pk)
        v = m >> shift
        i = (M - 1) - (m & ((1 << shift) - 1))
        top_votes.append(v)
        top_keys.append(jnp.where(v > 0, k[i], BIG))
        pk = jnp.where(idx == i, 0, pk)
    return jnp.stack(top_keys), jnp.stack(top_votes)


@functools.partial(
    jax.jit,
    static_argnames=("ncand", "min_votes", "smooth", "nbins",
                     "use_sort_kernel", "presorted_run", "chain_gamma"),
)
def vote_and_rank(
    keys: jnp.ndarray,        # (Q, M) int32 packed (row*nbins + bin) hit
                              # keys, invalid = BIG
    subject_ids: jnp.ndarray, # (S,) int32 global ids (sorted, pad BIG)
    ncand: int,
    min_votes: int,
    smooth: bool = False,
    nbins: int = 1 << 20,
    use_sort_kernel: bool = False,
    presorted_run: int = 0,
    chain_gamma: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Vote packed (subject-row, local-diagonal-bin) cells; return this
    shard's top-N proposals per query frame: (gsid, lbin, votes), each
    (Q, ncand) int32. The caller builds `keys` with direct gathers from
    position-parallel key tables (engine.propose_shard) — no searchsorted,
    no per-hit position gather (TPU gathers are the enemy, SURVEY.md §7.2).

    The row sort dominates: with use_sort_kernel (TPU) it runs on the
    Pallas bitonic network (kernels/sort.py) instead of XLA's sort —
    bit-identical output (integer sort is unique), ~15x faster.
    """
    Q, M = keys.shape
    S = subject_ids.shape[0]
    if S * nbins >= (1 << 31):
        raise ValueError(
            f"packed vote keys overflow int32: {S} subjects x {nbins} bins; "
            "use more shards or a wider band"
        )
    if chain_gamma and chain_gamma * S * nbins + M >= (1 << 31):
        raise ValueError(
            f"chain_gamma={chain_gamma} overflows the (max,+) chain scan "
            f"for {S} subjects x {nbins} bins; use more shards"
        )
    # Fully-fused fast path (r04): sort + run-length vote + top-ncand in
    # ONE Pallas kernel — the XLA rank passes after a separate sort cost
    # ~30 ms/chunk of pure HBM re-reads at config-2 scale
    # (PROFILE_r04.json); in-kernel they are VPU work on resident data.
    # Falls back to sort + vmapped _per_query for the smooth / chaining
    # variants and when the packed in-kernel top-k cannot cover the row.
    if use_sort_kernel and not smooth and not chain_gamma:
        from ghostm_tpu.kernels.sort import (
            _LANES, merge_vote_rank_rows, sort_rows, sort_vote_rank_rows,
        )
        L = max(1 << max(M - 1, 1).bit_length(), 128)
        # ncand must fit the kernel's fixed (rows, _LANES) output lanes —
        # beyond that the fused path would silently truncate each shard's
        # proposals and break the "any global top-N candidate is in its own
        # shard's top-N" contract; the sort_rows + _per_query fallback
        # below handles any ncand.
        if 2 * L.bit_length() <= 31 and ncand <= _LANES:
            run = presorted_run
            nruns = M // run if run > 1 and M % run == 0 else 0
            m1 = run << (nruns.bit_length() - 1) if nruns else 0
            if nruns and (nruns & (nruns - 1)) and m1 >= 1024:
                # SPLIT-SORT (r05): when the run count is not a power of
                # two, the monolithic kernel pads the row to the next
                # power of two and re-merges the pad on every stage
                # (config-2: 36 runs of 128 -> 4608 lanes padded to 8192,
                # 63 full-width passes). Sorting the leading 2^a runs and
                # the remainder separately, then one final bitonic merge
                # stage in the vote kernel, does the same unique integer
                # sort in ~62% of the element-passes. Bit-identical.
                A = sort_rows(keys[:, :m1], presorted_run=run)
                B = sort_rows(keys[:, m1:], presorted_run=run)
                top_keys, votes = merge_vote_rank_rows(
                    A, B, ncand, max(min_votes, 1)
                )
            else:
                top_keys, votes = sort_vote_rank_rows(
                    keys, ncand, max(min_votes, 1),
                    presorted_run=presorted_run,
                )
            top_row = jnp.clip(top_keys // nbins, 0, S - 1)
            gsid = jnp.where(votes > 0, subject_ids[top_row], BIG)
            lbin = jnp.where(votes > 0, top_keys % nbins, BIG)
            return gsid, lbin, votes
    if use_sort_kernel:
        from ghostm_tpu.kernels.sort import sort_rows
        sorted_keys = sort_rows(keys, presorted_run=presorted_run)
    else:
        sorted_keys = jnp.sort(keys, axis=1)
    fn = functools.partial(
        _per_query, nbins=nbins, ncand=ncand,
        min_votes=max(min_votes, 1), smooth=smooth,
        chain_gamma=chain_gamma,
    )
    top_keys, votes = jax.vmap(fn)(sorted_keys)
    top_row = jnp.clip(top_keys // nbins, 0, S - 1)
    gsid = jnp.where(votes > 0, subject_ids[top_row], BIG)
    lbin = jnp.where(votes > 0, top_keys % nbins, BIG)
    return gsid, lbin, votes


def select_global(
    gsid: jnp.ndarray, lbin: jnp.ndarray, votes: jnp.ndarray, ncand: int,
    use_kernel: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Merge proposals from all shards, (Q, n_shards * ncand) each, into the
    global top-N by the same deterministic key. Any candidate in the global
    top-N is in its own shard's top-N, so per-shard proposal followed by
    this merge is EXACTLY the single-index selection.

    Single-shard fast path: vote_and_rank already emits each shard's
    proposals in the global order — (votes desc, key asc), and key =
    row * nbins + bin orders identically to (gsid asc, bin asc) because
    subject ids are sorted within a shard — with gsid/lbin BIG-masked at
    votes == 0. With one shard the merge is therefore the identity, and
    the (Q, ncand) lax.sort it would run costs ~37 ms/batch on TPU
    (PROFILE_r04.json) for nothing."""
    if gsid.shape[1] == ncand:
        return (
            jnp.where(votes > 0, gsid, BIG),
            jnp.where(votes > 0, lbin, BIG),
            votes,
        )
    g = jnp.where(votes > 0, gsid, BIG)
    b = jnp.where(votes > 0, lbin, BIG)
    if use_kernel:
        from ghostm_tpu.kernels.sort import lex_rank_rows

        nv, sg, sb = lex_rank_rows((-votes, g, b), 3, ncand)
        return sg, sb, -nv
    nv, sg, sb = lax.sort((-votes, g, b), num_keys=3)
    return sg[:, :ncand], sb[:, :ncand], -nv[:, :ncand]
