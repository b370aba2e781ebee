"""Seed index: direct-addressed k-mer buckets over the subject buffer.

Reference equivalent: GHOSTM's sorted fixed-length seed index / depth-k
suffix array (SURVEY.md §1.1 step 1, §2 "DB builder: seed index"). TPU-native
re-design: instead of binary-searching a sorted key list on device (random
branchy probes), we store

  - ``positions``     (P,) int32 — every valid seed position in the buffer,
                      sorted by (k-mer key, position);
  - ``bucket_starts`` (20**k + 2,) int32 — CSR offsets per key, with one
                      extra EMPTY bucket at index 20**k that invalid query
                      seeds are routed to.

Device-side lookup is then two contiguous gathers (bucket_starts[key],
bucket_starts[key+1]) + a strided slice of positions — no search loop at all,
which is the layout the TPU's vector memory system likes (SURVEY.md §7.2
"Random gather on TPU").

Keys use base 20: only the 20 standard amino acids form seeds (codes >= 20 —
B/Z/X/*/sentinel — never seed, matching seed-and-extend family convention).
"""

from __future__ import annotations

import dataclasses

import numpy as np

NUM_SEED_AA = 20


@dataclasses.dataclass
class SeedIndex:
    seed_len: int
    positions: np.ndarray      # (P,) int32
    bucket_starts: np.ndarray  # (20**k + 2,) int32

    @property
    def num_buckets(self) -> int:
        return NUM_SEED_AA**self.seed_len

    @property
    def num_positions(self) -> int:
        return len(self.positions)


def kmer_keys(buf: np.ndarray, k: int) -> np.ndarray:
    """(len(buf) - k + 1,) int32 keys; invalid windows (any code >= 20) get
    key == 20**k (the empty overflow bucket)."""
    buf = np.asarray(buf, dtype=np.int64)
    n = len(buf) - k + 1
    if n <= 0:
        return np.zeros((0,), dtype=np.int32)
    keys = np.zeros(n, dtype=np.int64)
    valid = np.ones(n, dtype=bool)
    for t in range(k):
        c = buf[t : t + n]
        keys = keys * NUM_SEED_AA + np.clip(c, 0, NUM_SEED_AA - 1)
        valid &= c < NUM_SEED_AA
    keys[~valid] = NUM_SEED_AA**k
    return keys.astype(np.int32)


def build_seed_index(buf: np.ndarray, k: int) -> SeedIndex:
    """Sort-free CSR build: bincount keys -> cumsum -> stable scatter."""
    keys = kmer_keys(buf, k)
    valid = keys < NUM_SEED_AA**k
    vkeys = keys[valid]
    vpos = np.nonzero(valid)[0].astype(np.int32)
    counts = np.bincount(vkeys, minlength=NUM_SEED_AA**k)
    bucket_starts = np.zeros(NUM_SEED_AA**k + 2, dtype=np.int64)
    np.cumsum(counts, out=bucket_starts[1 : NUM_SEED_AA**k + 1])
    bucket_starts[NUM_SEED_AA**k + 1] = bucket_starts[NUM_SEED_AA**k]
    # Positions sorted by (key, pos): vpos is already position-ordered, so a
    # stable argsort on key alone preserves position order within buckets.
    order = np.argsort(vkeys, kind="stable")
    positions = vpos[order]
    return SeedIndex(k, positions.astype(np.int32), bucket_starts.astype(np.int32))
