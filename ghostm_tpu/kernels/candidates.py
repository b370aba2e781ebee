"""Diagonal voting + candidate selection (SURVEY.md §2 "Diagonal voting").

Reference equivalent: GHOSTM accumulates seed hits per (subject, diagonal)
cell and keeps the top-N regions per query. TPU-native re-design: because the
subject store is ONE concatenated buffer, (subject, diagonal) collapses to
the single global diagonal g = dbpos - qpos. Diagonals are coarsened into
bins of band_width/2 so one candidate band covers all hits in a bin, votes
are counted by a sort + run-length pass (static shapes, no scatter), and the
top-N bins are selected by a multi-key lax.sort — fully deterministic:
(votes desc, bin asc), which makes results invariant to shard count and
evaluation order (SURVEY.md §7.2 "Determinism across shard counts").
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

BIGBIN = jnp.int32(1 << 30)


def _per_query(bins_flat: jnp.ndarray, ncand: int, min_votes: int):
    """bins_flat: (M,) int32 diagonal bins (invalid = BIGBIN).
    Returns (bin (ncand,), votes (ncand,)) sorted by (votes desc, bin asc)."""
    M = bins_flat.shape[0]
    b = jnp.sort(bins_flat)
    valid = b < BIGBIN
    first = jnp.concatenate([valid[:1], (b[1:] != b[:-1]) & valid[1:]])
    rid = jnp.cumsum(first.astype(jnp.int32)) - 1
    ones = valid.astype(jnp.int32)
    counts = jax.ops.segment_sum(ones, rid, num_segments=M)
    votes = jnp.where(first, counts[jnp.clip(rid, 0, M - 1)], 0)
    votes = jnp.where(votes >= min_votes, votes, 0)
    cbin = jnp.where(votes > 0, b, BIGBIN)
    neg, sbin = lax.sort((-votes, cbin), num_keys=2)
    return sbin[:ncand], -neg[:ncand]


@functools.partial(
    jax.jit, static_argnames=("band", "ncand", "min_votes", "qlen")
)
def select_candidates(
    hit_pos: jnp.ndarray,
    hit_valid: jnp.ndarray,
    band: int,
    ncand: int,
    min_votes: int,
    qlen: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Vote diagonals, pick top-N bands per query.

    Args:
      hit_pos: (Q, Lq, H) int32 global DB positions per query seed.
      hit_valid: (Q, Lq, H) bool.
    Returns:
      g0    (Q, ncand) int32 — band window start (may be negative; the
            engine adds its buffer lead-padding before slicing),
      votes (Q, ncand) int32,
      valid (Q, ncand) bool.
    """
    Q, Lq, H = hit_pos.shape
    half = band // 2
    qpos = jnp.arange(Lq, dtype=jnp.int32)[None, :, None]
    g = hit_pos - qpos                       # global diagonal, >= -(Lq-1)
    bins = jnp.where(hit_valid, (g + qlen) // half, BIGBIN)
    sbin, votes = jax.vmap(
        functools.partial(_per_query, ncand=ncand, min_votes=max(min_votes, 1))
    )(bins.reshape(Q, Lq * H))
    valid = votes > 0
    # Band [g0, g0+band) centred on the bin's diagonal range:
    # bin covers g in [bin*half - qlen, bin*half - qlen + half).
    g0 = jnp.where(valid, sbin * half - qlen - band // 4, 0)
    return g0, votes, valid
