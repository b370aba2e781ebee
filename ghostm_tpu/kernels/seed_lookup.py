"""Device-side seed lookup (SURVEY.md §2 "Seed-search kernel").

Reference equivalent: GHOSTM's CUDA kernel binary-searching a sorted seed
table, one thread per query seed. TPU-native re-design: the index is a
direct-addressed CSR (index/seeds.py), so lookup is branch-free gathers —
  start = bucket_starts[key]; count = bucket_starts[key+1] - start
  hits[h] = positions[start + h]  (h < hits_per_seed, masked)
All shapes are static; the per-seed hit cap is the deterministic overflow
policy (lowest positions win, because buckets are position-sorted —
SURVEY.md §7.2 "Ragged everything").
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ghostm_tpu.index.seeds import NUM_SEED_AA


def query_kmer_keys(qcodes: jnp.ndarray, seed_len: int) -> jnp.ndarray:
    """(Q, Lq) int32 k-mer keys per query position; windows containing any
    non-seed code (>= 20) or running off the end get the overflow key 20**k
    (whose bucket is empty). Mirrors index.seeds.kmer_keys."""
    Q, Lq = qcodes.shape
    k = seed_len
    nb = NUM_SEED_AA**k
    c = qcodes.astype(jnp.int32)
    keys = jnp.zeros((Q, Lq), jnp.int32)
    valid = jnp.ones((Q, Lq), jnp.bool_)
    for t in range(k):
        ct = jnp.concatenate(
            [c[:, t:], jnp.full((Q, t), NUM_SEED_AA, jnp.int32)], axis=1
        )
        keys = keys * NUM_SEED_AA + jnp.clip(ct, 0, NUM_SEED_AA - 1)
        valid &= ct < NUM_SEED_AA
    return jnp.where(valid, keys, nb)


def lookup_hits(
    bucket_starts: jnp.ndarray,
    positions: jnp.ndarray,
    keys: jnp.ndarray,
    hits_per_seed: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Expand each query seed into up to `hits_per_seed` DB positions.

    Returns (pos (Q, Lq, H) int32, valid (Q, Lq, H) bool).
    """
    P = positions.shape[0]
    start = bucket_starts[keys]                      # (Q, Lq)
    count = bucket_starts[keys + 1] - start
    offs = jnp.arange(hits_per_seed, dtype=jnp.int32)
    idx = start[..., None] + offs                    # (Q, Lq, H)
    valid = offs < count[..., None]
    pos = positions[jnp.clip(idx, 0, P - 1)]
    return pos, valid
