"""Index (de)serialisation (SURVEY.md §2 "Index (de)serializer").

On-disk format (per DB prefix):
  <prefix>.manifest.json   — format version, config echo, per-shard sizes
  <prefix>.shard{i}.npz    — buffer/starts/lengths/subject_ids/names +
                             positions/bucket_starts (the seed index)

Each shard is self-contained so a multi-host job loads only its own shards
(SURVEY.md §3.3). `stack_shards` pads every shard to the max shard size and
stacks along a leading axis — the static-shape form the device mesh consumes
(pad positions point at the leading sentinel run, so even an unmasked lookup
lands on un-alignable residues).
"""

from __future__ import annotations

import dataclasses
import json
from typing import List

import numpy as np

from ghostm_tpu.index.seeds import SeedIndex
from ghostm_tpu.index.store import SubjectStore
from ghostm_tpu.ops.encode import SENTINEL

FORMAT_VERSION = 1


@dataclasses.dataclass
class IndexShard:
    store: SubjectStore
    seeds: SeedIndex


@dataclasses.dataclass
class StackedIndex:
    """Device-ready stacked form: leading axis = shard.

    `starts`/`subject_ids` let the DEVICE map an alignment endpoint (a global
    buffer position) to a global subject id + subject-local offset, which is
    what makes top-k merge keys shard-invariant (SURVEY.md §7.2)."""
    seed_len: int
    buffers: np.ndarray        # (n_shards, Bmax) int8
    positions: np.ndarray      # (n_shards, Pmax) int32
    bucket_starts: np.ndarray  # (n_shards, 20**k + 2) int32
    starts: np.ndarray         # (n_shards, Smax) int32, pad = Bmax+1
    subject_ids: np.ndarray    # (n_shards, Smax) int32, pad = 1<<30 (sorted!)
    lengths: np.ndarray        # (n_shards, Smax) int32, pad = 0
    shards: List[IndexShard]   # host-side metadata for reporting
    total_residues: int        # whole-DB residue count (E-value search space)
    expand_width: int          # max seed-bucket length across shards (the
                               # static per-seed hit expansion that makes
                               # lookup lossless after build-time truncation)


def save_index(prefix: str, shards: List[IndexShard], seed_len: int) -> None:
    manifest = {
        "format_version": FORMAT_VERSION,
        "seed_len": seed_len,
        "n_shards": len(shards),
        "shards": [
            {
                "buffer_len": len(sh.store.buffer),
                "num_positions": sh.seeds.num_positions,
                "num_subjects": sh.store.num_subjects,
                "residues": sh.store.total_residues,
            }
            for sh in shards
        ],
    }
    with open(f"{prefix}.manifest.json", "w") as f:
        json.dump(manifest, f, indent=2)
    for i, sh in enumerate(shards):
        np.savez(
            f"{prefix}.shard{i}.npz",
            buffer=sh.store.buffer,
            starts=sh.store.starts,
            lengths=sh.store.lengths,
            subject_ids=sh.store.subject_ids,
            names=np.array(sh.store.names, dtype=object),
            positions=sh.seeds.positions,
            bucket_starts=sh.seeds.bucket_starts,
        )


def load_index(prefix: str) -> StackedIndex:
    with open(f"{prefix}.manifest.json") as f:
        manifest = json.load(f)
    if manifest["format_version"] != FORMAT_VERSION:
        raise ValueError(f"index format {manifest['format_version']} unsupported")
    k = manifest["seed_len"]
    shards: List[IndexShard] = []
    for i in range(manifest["n_shards"]):
        z = np.load(f"{prefix}.shard{i}.npz", allow_pickle=True)
        store = SubjectStore(
            buffer=z["buffer"],
            starts=z["starts"],
            lengths=z["lengths"],
            subject_ids=z["subject_ids"],
            names=[str(n) for n in z["names"]],
        )
        shards.append(IndexShard(store, SeedIndex(k, z["positions"], z["bucket_starts"])))
    return stack_shards(shards, k)


def stack_shards(shards: List[IndexShard], seed_len: int) -> StackedIndex:
    n = len(shards)
    bmax = max(len(s.store.buffer) for s in shards)
    pmax = max(1, max(s.seeds.num_positions for s in shards))
    # Round up so device arrays tile cleanly regardless of shard content.
    bmax = -(-bmax // 128) * 128
    pmax = -(-pmax // 128) * 128
    buffers = np.full((n, bmax), SENTINEL, dtype=np.int8)
    positions = np.zeros((n, pmax), dtype=np.int32)
    nb = shards[0].seeds.bucket_starts.shape[0]
    bucket_starts = np.zeros((n, nb), dtype=np.int32)
    smax = max(s.store.num_subjects for s in shards)
    starts = np.full((n, smax), bmax + 1, dtype=np.int32)
    subject_ids = np.full((n, smax), 1 << 30, dtype=np.int32)
    lengths = np.zeros((n, smax), dtype=np.int32)
    for i, s in enumerate(shards):
        buffers[i, : len(s.store.buffer)] = s.store.buffer
        positions[i, : s.seeds.num_positions] = s.seeds.positions
        bucket_starts[i] = s.seeds.bucket_starts
        ns = s.store.num_subjects
        starts[i, :ns] = s.store.starts
        subject_ids[i, :ns] = s.store.subject_ids
        lengths[i, :ns] = s.store.lengths
        if ns and not (np.diff(s.store.subject_ids) > 0).all():
            raise ValueError("shard subject_ids must be strictly increasing")
    total = sum(s.store.total_residues for s in shards)
    expand = max(1, max(s.seeds.max_bucket_len for s in shards))
    return StackedIndex(
        seed_len, buffers, positions, bucket_starts, starts, subject_ids,
        lengths, shards, total, expand,
    )
