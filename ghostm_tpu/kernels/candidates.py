"""Diagonal voting + candidate proposal (SURVEY.md §2 "Diagonal voting").

Reference equivalent: GHOSTM accumulates seed hits per (subject, diagonal)
cell and keeps the top-N regions per query. TPU-native re-design with a
shard-invariance contract (SURVEY.md §7.2):

  * every hit is keyed by (GLOBAL subject id, SUBJECT-LOCAL diagonal bin) —
    values independent of how subjects are packed into shard buffers;
  * votes are counted scatter-free: a two-key lax.sort groups equal pairs,
    run lengths come from a cummax/cummin neighbour pass (static shapes);
  * each shard only PROPOSES its top-N candidates, ordered by the
    deterministic key (votes desc, gsid asc, bin asc); the engine selects
    the global top-N across shards (all_gather on the mesh, host concat in
    the loop path) so the SW candidate set — and hence the output table —
    is identical for any shard count.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

BIG = jnp.int32(1 << 30)


def _per_query(
    gsid: jnp.ndarray, lbin: jnp.ndarray, ncand: int, min_votes: int,
    smooth: bool = False,
):
    """gsid/lbin: (M,) int32 hit keys (invalid = BIG). Returns per-query
    proposals (gsid (ncand,), lbin (ncand,), votes (ncand,)) ordered by
    (votes desc, gsid asc, lbin asc).

    With `smooth`, each bin is also credited its (gsid, bin+-1) neighbours'
    counts before ranking — the long-read chaining approximation
    (SURVEY.md §5.7): indel drift moves seed hits into adjacent bins, and
    the smoothed vote concentrates them onto one candidate band."""
    M = gsid.shape[0]
    g, b = lax.sort((gsid, lbin), num_keys=2)
    valid = g < BIG
    first = jnp.concatenate(
        [valid[:1], ((g[1:] != g[:-1]) | (b[1:] != b[:-1])) & valid[1:]]
    )
    idx = jnp.arange(M, dtype=jnp.int32)
    # Index of the next run boundary for each position. Invalid (padding)
    # positions must also act as boundaries, otherwise the run length of the
    # LAST valid run would swallow the whole invalid tail.
    bnd = first | ~valid
    s_next = jnp.concatenate([jnp.where(bnd, idx, BIG)[1:], jnp.int32([M])])
    next_start = lax.cummin(s_next, axis=0, reverse=True)
    votes = jnp.where(first, next_start - idx, 0)
    if smooth:
        # Runs are sorted by (g, b), so a (g, b+-1) neighbour run, if any,
        # is the immediately adjacent run. For each rep: the next run's rep
        # sits at next_start; the previous run's rep is the run start of the
        # element just before our own run start.
        rep_idx = lax.cummax(jnp.where(bnd, idx, 0), axis=0)  # own run start
        nxt = jnp.clip(next_start, 0, M - 1)
        prv = rep_idx[jnp.clip(rep_idx - 1, 0, M - 1)]
        add_n = jnp.where((g[nxt] == g) & (b[nxt] == b + 1), votes[nxt], 0)
        add_p = jnp.where((g[prv] == g) & (b[prv] == b - 1), votes[prv], 0)
        votes = votes + jnp.where(first, add_n + add_p, 0)
    votes = jnp.where(votes >= min_votes, votes, 0)
    cg = jnp.where(votes > 0, g, BIG)
    cb = jnp.where(votes > 0, b, BIG)
    nv, sg, sb = lax.sort((-votes, cg, cb), num_keys=3)
    return sg[:ncand], sb[:ncand], -nv[:ncand]


@functools.partial(
    jax.jit, static_argnames=("half", "ncand", "min_votes", "qlen", "smooth")
)
def propose_candidates(
    hit_pos: jnp.ndarray,     # (Q, Lq, H) int32 shard-buffer positions
    hit_valid: jnp.ndarray,   # (Q, Lq, H) bool
    starts: jnp.ndarray,      # (S,) int32 subject starts (sorted, pad big)
    subject_ids: jnp.ndarray, # (S,) int32 global ids (sorted, pad BIG)
    half: int,                # band_width // 2 (diagonal bin size)
    ncand: int,
    min_votes: int,
    qlen: int,
    smooth: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Vote (subject, local-diagonal-bin) cells; return this shard's top-N
    proposals per query frame: (gsid, lbin, votes), each (Q, ncand) int32."""
    Q, Lq, H = hit_pos.shape
    S = starts.shape[0]
    srow = jnp.clip(
        jnp.searchsorted(starts, hit_pos, side="right") - 1, 0, S - 1
    )
    gsid = jnp.where(hit_valid, subject_ids[srow], BIG)
    qpos = jnp.arange(Lq, dtype=jnp.int32)[None, :, None]
    # subject-local diagonal, >= -(qlen-1); bin is >= 0 after the +qlen shift
    ldiag = hit_pos - starts[srow] - qpos
    lbin = jnp.where(hit_valid, (ldiag + qlen) // half, BIG)
    fn = functools.partial(
        _per_query, ncand=ncand, min_votes=max(min_votes, 1), smooth=smooth
    )
    return jax.vmap(fn)(gsid.reshape(Q, Lq * H), lbin.reshape(Q, Lq * H))


def select_global(
    gsid: jnp.ndarray, lbin: jnp.ndarray, votes: jnp.ndarray, ncand: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Merge proposals from all shards, (Q, n_shards * ncand) each, into the
    global top-N by the same deterministic key. Any candidate in the global
    top-N is in its own shard's top-N, so per-shard proposal followed by this
    merge is EXACTLY the single-index selection."""
    g = jnp.where(votes > 0, gsid, BIG)
    b = jnp.where(votes > 0, lbin, BIG)
    nv, sg, sb = lax.sort((-votes, g, b), num_keys=3)
    return sg[:, :ncand], sb[:, :ncand], -nv[:, :ncand]
