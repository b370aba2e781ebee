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

    @property
    def max_bucket_len(self) -> int:
        nb = self.num_buckets
        if not len(self.positions):
            return 0
        return int(
            (self.bucket_starts[1 : nb + 1] - self.bucket_starts[:nb]).max()
        )


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


def _mix(x: np.ndarray) -> np.ndarray:
    """Deterministic 32-bit integer hash (splitmix-style avalanche)."""
    x = x.astype(np.uint64)
    x = (x ^ (x >> 16)) * np.uint64(0x45D9F3B)
    x = (x ^ (x >> 16)) * np.uint64(0x45D9F3B)
    return (x ^ (x >> 16)) & np.uint64(0xFFFFFFFF)


def global_bucket_truncation(
    seqs: list, k: int, cap: int
) -> list:
    """Decide, GLOBALLY and before sharding, which seed positions survive the
    per-k-mer cap (reference analogue: GHOSTM limits hits for high-frequency
    seeds). Survivors are chosen by a deterministic HASH of the global
    (subject id, offset) — a pure function of layout-invariant identifiers,
    so the surviving set (and every vote count downstream) is identical for
    ANY shard layout (SURVEY.md §7.2) while sampling each bucket uniformly
    across subjects (plain id-order would make late subjects unfindable in
    over-full buckets).

    Args:
      seqs: encoded subject sequences in GLOBAL id order.
      cap: max kept positions per k-mer bucket (Config.hits_per_seed).
    Returns:
      per-subject bool arrays, len == max(len(seq)-k+1, 0): keep flags.
    """
    per_keys = [kmer_keys(s, k) for s in seqs]
    if not per_keys:
        return []
    all_keys = np.concatenate(per_keys)
    nb = NUM_SEED_AA**k
    lens = np.array([len(pk) for pk in per_keys], dtype=np.int64)
    gsid = np.repeat(np.arange(len(per_keys), dtype=np.int64), lens)
    offset = np.arange(len(all_keys), dtype=np.int64) - np.repeat(
        np.cumsum(lens) - lens, lens
    )
    prio = _mix(gsid * np.uint64(1_000_003) + offset.astype(np.uint64))
    order = np.lexsort((offset, gsid, prio, all_keys))  # primary: key, then hash
    sorted_keys = all_keys[order]
    bucket_starts = np.searchsorted(sorted_keys, np.arange(nb + 1))
    rank = np.empty(len(all_keys), dtype=np.int64)
    rank[order] = np.arange(len(all_keys)) - bucket_starts[
        np.clip(sorted_keys, 0, nb)
    ]
    keep = (rank < cap) & (all_keys < nb)
    out, off = [], 0
    for pk in per_keys:
        out.append(keep[off : off + len(pk)])
        off += len(pk)
    return out


def build_seed_index(buf: np.ndarray, k: int, keep: np.ndarray | None = None) -> SeedIndex:
    """Sort-free CSR build: bincount keys -> cumsum -> stable scatter.

    `keep`: optional bool mask over buffer positions (len >= len(buf)-k+1)
    from global_bucket_truncation, mapped into shard-buffer coordinates.

    Uses the native C++ builder (ghostm_tpu.native, counting sort) when the
    shared library is available; the numpy path below is the reference
    implementation and produces bit-identical output (tests/test_native.py).
    """
    from ghostm_tpu import native

    res = native.kmer_csr(buf, k, keep)
    if res is not None:
        positions, bucket_starts = res
        return SeedIndex(k, positions, bucket_starts)
    keys = kmer_keys(buf, k)
    valid = keys < NUM_SEED_AA**k
    if keep is not None:
        valid &= keep[: len(keys)]
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
