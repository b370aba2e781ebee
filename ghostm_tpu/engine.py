"""Search engine: jit-compiled propose/select/align phases + host driver.

Reference equivalent: GHOSTM's `aln` pipeline driver (SURVEY.md §3.2) — load
index, stream query chunks, launch seed-search and SW kernels, rank. The
TPU-native shape (SURVEY.md §3.3) is a three-phase step with an exact
shard-invariance contract (SURVEY.md §7.2 "Determinism across shard counts"):

  1. PROPOSE (per shard): seed lookup -> (subject, local-diagonal-bin) votes
     -> this shard's top-N candidate proposals per query frame;
  2. SELECT (global): merge all shards' proposals by the deterministic key
     (votes desc, subject id asc, bin asc) -> THE global top-N candidate set,
     identical for any shard layout;
  3. ALIGN (per shard): banded SW over the selected candidates owned by this
     shard, with substitution scores masked to the candidate's subject span
     (so windows overlapping neighbouring subjects can never leak
     alignments), then a disjoint-mask merge and per-read top-k by
     (-score, subject id, frame, qend, subject-local end).

On a ("data", "db") mesh all three phases run inside ONE compiled shard_map
program (ghostm_tpu.parallel.search) with two small collectives; the host
loop path runs the same phases per shard and merges with numpy. Both produce
bit-identical tables.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ghostm_tpu.config import Config
from ghostm_tpu.index.diskio import StackedIndex
from ghostm_tpu.kernels import candidates as cand_mod
from ghostm_tpu.kernels import seed_lookup, sw_fused, sw_pallas, sw_wave, sw_xla
from ghostm_tpu.ops.encode import SENTINEL
from ghostm_tpu.ops.scoring import LOW, padded_matrix
from ghostm_tpu.ops.translate import six_frame_translate

NFRAMES = 6
BIG = 1 << 30
SORT_NUM_KEYS = 5  # (-score, gsid, frame, qend, s_end) — the tie-break spec
# Direct-table sentinel: pad slots hold this value; any packed value below
# it is a real position. Must exceed every valid packed value (checked at
# build) and be comparable BEFORE the diagonal division (a post-division
# sentinel can't reach BIG in int32: BIG * half overflows).
DIRECT_SENT = 0x7FF00000
# TOTAL device budget for the direct tables (each spends (nb+1) * W * 4
# bytes, nb = 20^k buckets, W = pow2 >= max bucket count): k=5/W=128 is
# 1.64 GB of the 16 GB v5e HBM. On the colocated loop path every shard's
# table lives on the ONE device, so build_key_tables splits this budget
# n_shards ways; on a mesh each shard has its own device and gets the
# full cap. Overridable for small-HBM or huge-k setups.
DIRECT_TABLE_CAP = int(
    os.environ.get("GHOSTM_TPU_DIRECT_TABLE_CAP", 3 << 30)
)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def lead_pad(cfg: Config) -> int:
    """Sentinel padding prepended to the buffer so window starts
    g0 >= -(qlen + band) always slice in-bounds."""
    return _round_up(cfg.query_frame_len + cfg.band_width, 128)


def pad_buffer(buf: np.ndarray, cfg: Config) -> np.ndarray:
    """Sentinel-pad the shard buffer. Invariants the align phase relies on:
    total length is a multiple of 256 (the buffer is viewed as (M, 128)
    or (M, 256) rows for the aligned window row-gathers) and the tail pad
    is >= 512 bytes past any valid window start (so neither the two-row
    128-gather nor the r04 single-row 512 B overlap-view gather ever
    clamps or wraps for an owned candidate)."""
    lead = lead_pad(cfg)
    tail = lead + 512
    out = np.pad(buf, (lead, tail), constant_values=SENTINEL)
    extra = (-len(out)) % 256
    if extra:
        out = np.pad(out, (0, extra), constant_values=SENTINEL)
    return out


def seed_key_tables(index: StackedIndex, shard: int, nbins: int):
    """Key tables PARALLEL to the shard's seed-position array: for position
    positions[j] at subject row r with subject-local offset o,
      rowbase[j] = r * nbins        localoff[j] = o.
    The propose phase then builds each hit's packed vote key with two
    direct gathers at the hit's bucket index — no searchsorted, no gather
    of the position value itself, and bucket-contiguous access locality.
    (Fallback path: the aligned tables below are the fast path.)"""
    st = index.shards[shard].store
    pos = index.positions[shard].astype(np.int64)
    row = np.clip(
        np.searchsorted(np.asarray(st.starts, np.int64), pos, side="right") - 1,
        0, max(st.num_subjects - 1, 0),
    )
    starts_row = (
        np.asarray(st.starts, np.int64)[row] if st.num_subjects else row
    )
    rowbase = (row * nbins).astype(np.int32)
    localoff = (pos - starts_row).astype(np.int32)
    return rowbase, localoff


def _packed_value_bound(st, mult: int, Lq: int):
    """Max packed value (row * mult + localoff + Lq) any seed position in
    this store can take, from per-subject bounds — avoids materialising
    the multi-M int64 vals array an exact check would need. Conservative:
    a borderline index routes to the next (bit-identical, slower) table
    layout."""
    S = st.num_subjects
    starts64 = np.asarray(st.starts, np.int64)
    strides = (
        np.diff(starts64, append=np.int64(len(st.buffer))) if S
        else starts64
    )
    if not S:
        return 0
    return int(
        (np.arange(S, dtype=np.int64) * mult + strides - 1 + Lq).max()
    )


def _packed_valmap(st, mult: int, Lq: int) -> np.ndarray:
    """Per-buffer-position packed value row*mult + (pos - start[row]) + Lq
    as ONE int32 array: the value increases by exactly 1 per position
    within a subject, so the map is arange(L) + repeat(per-subject base)
    (r03: replaced a 98M-query searchsorted + int64 temp chain costing
    ~60 s/shard of init at k=5 scale). The leading sentinel pad
    [0, starts[0]) folds into subject 0's span — no seed positions fall
    there (k-mers over sentinels are masked)."""
    S = st.num_subjects
    starts64 = np.asarray(st.starts, np.int64)
    base = (
        np.arange(S, dtype=np.int64) * mult - starts64 + Lq
    ).astype(np.int32) if S else np.full(1, Lq, np.int32)
    rep = (
        np.diff(starts64, append=np.int64(len(st.buffer)))
        if S else np.asarray([len(st.buffer)])
    )
    if S:
        rep = rep.copy()
        rep[0] += starts64[0]
    valmap = np.arange(len(st.buffer), dtype=np.int32)
    valmap += np.repeat(base, rep)
    return valmap


def aligned_key_tables(
    index: StackedIndex, shard: int, nbins: int, half: int, Lq: int,
    width: int,
):
    """Bucket-ALIGNED fused key table: every k-mer bucket's packed values
    start at a multiple of `width`, so the propose expansion is plain
    whole-row gathers with NO rotation network (the unaligned layout needed
    2x the gather volume plus log2(width) conditional-roll passes — the
    propose phase's single largest cost, measured).

      tab[astart[k]//width + i]  — rows i in [0, ceil(expand/width))
                                   hold bucket k's packed values
                                   row*nbins*half + localoff + Lq
      aux[k] = (astart[k]//width) << cbits | count[k]
                                 — ONE gather yields both the row index
                                   and the valid count.

    Returns (tab2d int32 (R, width), aux int32 (nb+2,), fits: bool);
    fits=False means int32 packing would overflow — caller falls back to
    the unaligned rowbase/localoff path.
    """
    sd = index.shards[shard].seeds
    st = index.shards[shard].store
    bs = np.asarray(sd.bucket_starts, np.int64)
    pos = np.asarray(sd.positions)
    P = len(pos)
    counts = np.diff(bs)                      # (nb+1,)
    padw = -(-counts // width) * width
    astart = np.zeros(len(bs), np.int64)
    np.cumsum(padw, out=astart[1:])
    nrows_need = max(1, -(-index.expand_width // width))
    total = int(astart[-1])
    S = st.num_subjects
    mult = nbins * half
    cbits = int(width).bit_length()           # count in [0, width]
    r_max = (total // width) + nrows_need
    fits = (
        len(st.buffer) < (1 << 31)
        and _packed_value_bound(st, mult, Lq) < (1 << 31)
        and ((r_max << cbits) | width) < (1 << 31)
    )
    if not fits:
        return None, None, False
    tab = np.zeros(total + nrows_need * width, np.int32)
    if P:
        vals = _packed_valmap(st, mult, Lq)[pos]
        dshift = (astart[:-1] - bs[:-1]).astype(np.int32)
        dst = np.arange(P, dtype=np.int32) + np.repeat(dshift, counts)
        tab[dst] = vals
    aux = ((astart // width) << cbits) | np.concatenate(
        [counts, np.zeros(1, np.int64)]
    )
    return (
        tab.reshape(-1, width),
        aux.astype(np.int32),
        True,
    )


def direct_key_tables(
    index: StackedIndex, shard: int, nbins: int, half: int, Lq: int,
    width: int, cap_bytes: int = DIRECT_TABLE_CAP,
):
    """DIRECT-indexed sentinel table (r04, from PROFILE_r04.json): row k of
    the (nb + 1, width) tab holds bucket k's packed values
    (row * nbins * half + localoff + Lq), padded with DIRECT_SENT; row nb
    (the invalid-kmer overflow bucket) is all sentinel.

    The propose expansion is then ONE whole-row gather at r = kmer —
    no aux gather (the aux row-start gather was ~half the measured
    propose gather cost), no count unpack; validity is the vector
    compare `value < DIRECT_SENT`. And because width is a power of two
    and every row's (qpos, bucket) run is width-long, the presorted-run
    bitonic stage skip applies even when the max bucket count (105 at
    config-2-true) is not a power of two — the aligned layout lost that
    skip entirely.

    Returns (tab2d int32 (nb+1, width), None, fits). fits=False when a
    packed value would reach DIRECT_SENT or the table would exceed
    `cap_bytes` — caller falls back to the aligned layout."""
    sd = index.shards[shard].seeds
    st = index.shards[shard].store
    bs = np.asarray(sd.bucket_starts, np.int64)
    pos = np.asarray(sd.positions)
    P = len(pos)
    counts = np.diff(bs)                      # (nb + 1,) incl. overflow
    nrows = len(counts)
    mult = nbins * half
    if nrows * width * 4 > cap_bytes:
        return None, None, False
    if len(st.buffer) >= (1 << 31) \
            or _packed_value_bound(st, mult, Lq) >= DIRECT_SENT \
            or int(counts.max(initial=0)) > width:
        return None, None, False
    tab = np.full(nrows * width, DIRECT_SENT, np.int32)
    if P:
        vals = _packed_valmap(st, mult, Lq)[pos]
        dshift = (np.arange(nrows, dtype=np.int64) * width - bs[:-1]).astype(
            np.int64
        )
        dst = np.arange(P, dtype=np.int64) + np.repeat(dshift, counts)
        tab[dst] = vals
    return tab.reshape(nrows, width), None, True


def build_key_tables(
    index: StackedIndex, nbins: int, half: int, Lq: int, width: int,
    expand: int, colocated_shards: bool = True,
):
    """Per-shard (tab_main, tab_aux) for ALL shards + the layout mode.

    Tries layouts fastest-first, same for every shard (mixed layouts are
    not worth supporting): "direct" (sentinel table, no aux gather,
    presorted runs always) -> "aligned" (bucket-aligned rows + aux) ->
    "csr" (position-parallel fallback). Returns (maps, mode, width_used);
    for "direct" width_used is the pow2 >= expand row width and tab_aux
    is a 1-element dummy (the argument plumbing stays uniform).

    colocated_shards: the loop path puts EVERY shard's table on the one
    device, so the direct-table budget is split n_shards ways; on a mesh
    each shard lives on its own device and gets the full cap."""
    n_shards = index.buffers.shape[0]
    dw = 8
    while dw < expand:
        dw *= 2
    cap = DIRECT_TABLE_CAP // (n_shards if colocated_shards else 1)
    maps = []
    ok_all = True
    for i in range(n_shards):
        tab, _, ok = direct_key_tables(
            index, i, nbins, half, Lq, dw, cap_bytes=cap
        )
        ok_all &= ok
        maps.append((tab, np.zeros(1, np.int32)))
        if not ok_all:
            break
    if ok_all:
        return maps, "direct", dw
    maps = []
    fuse = True
    for i in range(n_shards):
        tab, aux, ok = aligned_key_tables(index, i, nbins, half, Lq, width)
        fuse &= ok
        maps.append((tab, aux))
    if not fuse:
        maps = [seed_key_tables(index, i, nbins) for i in range(n_shards)]
    return maps, ("aligned" if fuse else "csr"), width


def _merge_fits_direct(index: StackedIndex, cfg: Config) -> bool:
    """Would the MERGED (1-shard) form of this index still take the direct
    table layout? Cheap exact check (no merge performed): the packed-value
    bound over merged global-id-ordered rows, the int32 buffer bound, and
    the direct-table byte cap at the merged bucket widths. If any fails,
    merging would land on a slower layout than the per-shard loop's own
    direct tables — not worth it."""
    half = cfg.band_width // 2
    Lq = cfg.query_frame_len
    nbins = int(index.lengths.max() + Lq) // half + 2
    mult = nbins * half
    lens = np.concatenate(
        [np.asarray(s.store.lengths, np.int64) for s in index.shards]
    )
    ids = np.concatenate(
        [np.asarray(s.store.subject_ids, np.int64) for s in index.shards]
    )
    S = len(lens)
    if not S:
        return False
    pad = int(index.shards[0].store.starts[0])
    total = pad + int((lens + pad).sum())
    if total >= (1 << 31):
        return False
    lens_m = lens[np.argsort(ids, kind="stable")]
    bound = int(
        (np.arange(S, dtype=np.int64) * mult + lens_m + pad - 1 + Lq).max()
    )
    if bound >= DIRECT_SENT:
        return False
    counts_m = sum(
        np.diff(np.asarray(s.seeds.bucket_starts, np.int64))
        for s in index.shards
    )
    nb = index.shards[0].seeds.num_buckets
    expand_m = int(counts_m[:nb].max(initial=1))
    dw = 8
    while dw < expand_m:
        dw *= 2
    return len(counts_m) * dw * 4 <= DIRECT_TABLE_CAP


def pad_stack(xs: List[np.ndarray]) -> np.ndarray:
    """Stack per-shard arrays along a new leading axis, zero-padding the
    first dim to the max shard size (device arrays need static shapes)."""
    n = max(x.shape[0] for x in xs)
    pad = [(0, 0)] * (xs[0].ndim - 1)
    return np.stack([np.pad(x, [(0, n - x.shape[0])] + pad) for x in xs])


# --------------------------------------------------------------------------
# Phase 1: propose (seed lookup + voting), traceable per-shard function
# --------------------------------------------------------------------------

def propose_shard(
    qflat: jnp.ndarray,
    bucket_starts: jnp.ndarray,
    tab_main: jnp.ndarray,
    tab_aux: jnp.ndarray,
    subject_ids: jnp.ndarray,
    *,
    seed_len: int,
    expand: int,
    band: int,
    ncand: int,
    min_votes: int,
    smooth: bool = False,
    nbins: int = 1 << 20,
    use_sort_kernel: bool = False,
    fuse_tables: bool = False,
    direct_tables: bool = False,
    table_width: int = 64,
    presorted_run: int = 0,
    chain_gamma: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(Q, ncand) proposals (gsid, lbin, votes) for this shard.

    Chunked over query frames so the expanded hit tensor (Q, Lq, expand)
    stays bounded (~128 MB) even with the large per-seed expansions that
    realistic DB scales need (seed_len 4-5, caps 64-256).

    Fastest path (direct_tables, r04): tab_main is the DIRECT-indexed
    sentinel table (engine.direct_key_tables) — the whole expansion is
    ONE row gather at r = kmer; validity is `value < DIRECT_SENT`
    (vector compare, no count gather, no aux table at all), and the
    effective expansion is table_width (pow2), so the presorted-run
    stage skip always applies. Fast path (fuse_tables): tab_main is the
    bucket-ALIGNED packed table and tab_aux the (row << cbits | count)
    lookup (engine.aligned_key_tables) — ONE aux gather + whole
    aligned-row gathers. Fallback: tab_main/tab_aux are the
    position-parallel rowbase/localoff tables.

    presorted_run = run length (power of two): each (qpos, bucket) run
    of the key row is monotone by construction, so runs are built
    ASCENDING for even qpos and DESCENDING (flipped) for odd qpos and
    the bitonic sort kernel skips its first log2(run) stages — the
    padded tail and run interiors already satisfy the
    stage-log2(run)+1 precondition. The sorted row (and every
    downstream value) is bit-identical: an integer sort's output does
    not depend on input order."""
    Qf, Lq = qflat.shape
    qi = qflat.astype(jnp.int32)
    exp_eff = table_width if direct_tables else expand
    per_frame = Lq * exp_eff * 4
    qcap = max(128, min(Qf, (128 << 20) // per_frame // 128 * 128))
    # chunk so Qf divides with MINIMAL padding: the padded tail rows ride
    # through the gather + sort + rank at full cost (a naive cap of 6528
    # padded config-2's 49152 frames to 52224 — 6% of the propose wall
    # for nothing, PROFILE_r05)
    nch = -(-Qf // qcap)
    qchunk = max(128, min(qcap, _round_up(-(-Qf // nch), 128)))
    qpad = _round_up(Qf, qchunk)
    qi_p = jnp.concatenate(
        [qi, jnp.full((qpad - Qf, Lq), 25, jnp.int32)], axis=0
    )

    half = band // 2
    qpos = jnp.arange(Lq, dtype=jnp.int32)[None, :, None]
    nrows = -(-expand // table_width)
    cbits = int(table_width).bit_length()

    # the last seed_len - 1 query positions can never host a valid k-mer
    # (window runs off the frame) — statically trim them from the direct
    # gather: the gather is row-count bound (~106 ns/row), so k=5 saves
    # 10% of the propose gather wall for free (trimmed keys were BIG).
    Lq_eff = max(Lq - seed_len + 1, 1) if direct_tables else Lq
    qpos_eff = qpos[:, :Lq_eff]

    def chunk_fn(qc):
        kmers = seed_lookup.query_kmer_keys(qc, seed_len)
        if direct_tables:
            tg = tab_main[kmers[:, :Lq_eff].reshape(-1)].reshape(
                qc.shape[0], Lq_eff, table_width
            )
            keys = jnp.where(
                tg < DIRECT_SENT, (tg - qpos_eff) // half, cand_mod.BIG
            )
        elif fuse_tables:
            offs = jnp.arange(expand, dtype=jnp.int32)
            aux = tab_aux[kmers]                       # (qc, Lq)
            count = aux & ((1 << cbits) - 1)
            valid = offs < count[..., None]
            r = (aux >> cbits).reshape(-1)
            if nrows == 1:
                w2 = tab_main[r]
            else:
                w2 = jnp.concatenate(
                    [tab_main[r + i] for i in range(nrows)], axis=1
                )
            tg = w2[:, :expand].reshape(qc.shape[0], Lq, expand)
            keys = jnp.where(valid, (tg - qpos) // half, cand_mod.BIG)
        else:
            offs = jnp.arange(expand, dtype=jnp.int32)
            start = bucket_starts[kmers]
            count = bucket_starts[kmers + 1] - start
            valid = offs < count[..., None]
            idx = jnp.clip(
                start[..., None] + offs, 0, tab_main.shape[0] - 1
            )
            lbin = (tab_aux[idx] - qpos + Lq) // half
            keys = jnp.where(valid, tab_main[idx] + lbin, cand_mod.BIG)
        if presorted_run > 1:
            odd = (
                jnp.arange(keys.shape[1], dtype=jnp.int32) & 1
            )[None, :, None]
            keys = jnp.where(odd == 1, jnp.flip(keys, axis=2), keys)
        return cand_mod.vote_and_rank.__wrapped__(
            keys.reshape(qc.shape[0], keys.shape[1] * keys.shape[2]),
            subject_ids,
            ncand, min_votes, smooth, nbins, use_sort_kernel,
            presorted_run, chain_gamma,
        )

    # Python-unrolled chunk loop: gathers inside a lax.map/scan body run
    # ~12x slower on TPU than the same gather at top level (measured;
    # XLA's while-loop lowering pessimizes them), and batches keep the
    # chunk count small.
    outs = [chunk_fn(c) for c in qi_p.reshape(qpad // qchunk, qchunk, Lq)]
    g, b, v = (jnp.concatenate(x, axis=0) for x in zip(*outs))
    return g[:Qf], b[:Qf], v[:Qf]


@functools.partial(
    jax.jit, static_argnames=("gap_open", "gap_extend", "band")
)
def _refine_device(qc, w, g0, lo, hi, matrix, *, gap_open, gap_extend, band):
    """Moves DP + device traceback for the reported hits (small batch)."""
    Lq = qc.shape[1]
    sc = sw_xla.banded_scores(qc, w, matrix, band)
    iota_ib = (
        jnp.arange(Lq, dtype=jnp.int32)[:, None]
        + jnp.arange(band, dtype=jnp.int32)[None, :]
    )
    j = g0[:, None, None] + iota_ib[None]
    inb = (j >= lo[:, None, None]) & (j < hi[:, None, None])
    sc = jnp.where(inb, sc, LOW)
    s2, ie2, be2, moves = sw_xla.sw_banded_moves.__wrapped__(
        sc, gap_open, gap_extend
    )
    stats = sw_xla.traceback_stats_device.__wrapped__(moves, ie2, be2, qc, w)
    return s2, stats


def _overlap_rows(buf: jnp.ndarray) -> jnp.ndarray:
    """(M/256, 512) int8 overlap view: row j = buf[j*256 : j*256 + 512],
    built ON DEVICE (two concats over the resident buffer, ~0.5 ms for a
    200 MB shard) so window fetches need ONE row gather instead of two.
    PROFILE_r04.json: the fetch cost is row-COUNT bound (~106 ns/row
    through XLA gather regardless of row bytes), so halving the row count
    halves the align/refine fetch wall. Last row wraps to row 0 — only
    reachable for clamped (unowned, masked) windows.

    HBM accounting (DESIGN.md "Device-memory budget"): this view is a
    SECOND full copy of the shard buffer (2 B/residue vs the resident
    1 B/residue), live while align/refine executes — for multi-GB k=5
    colocated multi-shard indexes that transient doubles buffer
    residency and is part of the headroom the sync-pipeline fallback
    (GHOSTM_TPU_SYNC_PIPELINE=1) exists to protect."""
    b256 = buf.reshape(-1, 256)
    nxt = jnp.concatenate([b256[1:], b256[:1]], axis=0)
    return jnp.concatenate([b256, nxt], axis=1)


def fetch_windows(buf: jnp.ndarray, g0: jnp.ndarray, lead: int, wlen: int):
    """Aligned-row window fetch: per-alignment slice gathers are ~10x
    slower than gathering whole aligned rows and rotating by the start
    offset with conditional binary shifts (see align_shard). buf must be
    pad_buffer-ed (length % 256 == 0, >= 512 tail sentinels).

    wlen <= 257: ONE 512 B row gather from the overlap view (any o in
    [0, 256) leaves o + wlen <= 512) + 8 conditional rolls. Longer
    windows (long-read shapes) fall back to the multi-row 128-gather."""
    if wlen <= 257:
        V = _overlap_rows(buf)
        gl = jnp.clip(g0 + lead, 0, (V.shape[0] - 2) * 256)
        r = gl // 256
        o = gl - r * 256
        w2 = V[r]
        for k in range(7, -1, -1):
            d = 1 << k
            w2 = jnp.where(
                (o[:, None] & d) != 0, jnp.roll(w2, -d, axis=1), w2
            )
        return w2[:, :wlen]
    M2 = buf.shape[0] // 128
    b2 = buf.reshape(M2, 128)
    nrows = (wlen + 127) // 128 + 1
    gl = jnp.clip(g0 + lead, 0, (M2 - nrows) * 128)
    r = gl // 128
    o = gl - r * 128
    w2 = jnp.concatenate([b2[r + i] for i in range(nrows)], axis=1)
    for k in range(6, -1, -1):
        d = 1 << k
        w2 = jnp.where((o[:, None] & d) != 0, jnp.roll(w2, -d, axis=1), w2)
    return w2[:, :wlen]


def refine_stats_packed(
    qcodes3: jnp.ndarray,   # (R, 6, Lq) int8/int32 translated frames
    packed: jnp.ndarray,    # (9, R, K) int32 ranked hits
    matrix: jnp.ndarray,
    w: jnp.ndarray,         # (R*K, Lq+band) int32 windows (fetched per shard)
    lo: jnp.ndarray,        # (R*K,) subject span start
    hi: jnp.ndarray,        # (R*K,)
    *, band: int, gap_open: int, gap_extend: int,
) -> jnp.ndarray:
    """Moves DP + traceback on pre-fetched windows -> (9, R, K) stats
    (8 stat fields + score_check). Shared by the loop path's packed refine
    and the mesh step's in-graph refine."""
    R, _, Lq = qcodes3.shape
    K = packed.shape[2]
    frame = packed[2].reshape(-1)
    g0 = packed[6].reshape(-1)
    flat_read = jnp.repeat(jnp.arange(R, dtype=jnp.int32), K)
    qc = qcodes3[flat_read, frame].astype(jnp.int32)
    s2, stats = _refine_device.__wrapped__(
        qc, w, g0, lo, hi, matrix,
        gap_open=gap_open, gap_extend=gap_extend, band=band,
    )
    rows = [stats[k] for k in SearchEngine.STAT_KEYS] + [s2]
    return jnp.stack([r.reshape(R, K) for r in rows])


def _make_refine_packed(n_shards: int, band: int, gap_open: int,
                        gap_extend: int, lead: int):
    """Device-resident refine for the packed (9, R, K) hit array: window
    fetch (aligned row gather per shard + disjoint shard-mask select),
    moves DP and traceback walk all on device, producing a packed
    (9, R, K) stats array — the pipeline then fetches ONE array per batch
    instead of ~10 (engine.refine's host path costs a fetch per field,
    ~30 ms each on the tunnel). Bit-identical to engine.refine."""

    def fn(qcodes, packed, matrix, *shard_args):
        buffers = shard_args[0::3]
        starts = shard_args[1::3]
        lengths = shard_args[2::3]
        R, _, Lq = qcodes.shape
        K = packed.shape[2]
        n = R * K
        g0 = packed[6].reshape(-1)
        srow = packed[7].reshape(-1)
        shard = packed[8].reshape(-1)
        wlen = Lq + band
        w = jnp.zeros((n, wlen), jnp.int32)
        lo = jnp.zeros(n, jnp.int32)
        hi = jnp.zeros(n, jnp.int32)
        for si in range(n_shards):
            w2 = fetch_windows(buffers[si], g0, lead, wlen)
            m = shard == si
            w = jnp.where(m[:, None], w2.astype(jnp.int32), w)
            S = starts[si].shape[0]
            sr = jnp.clip(srow, 0, S - 1)
            lo = jnp.where(m, starts[si][sr], lo)
            hi = jnp.where(m, starts[si][sr] + lengths[si][sr], hi)
        return refine_stats_packed(
            qcodes, packed, matrix, w, lo, hi,
            band=band, gap_open=gap_open, gap_extend=gap_extend,
        )

    return jax.jit(fn)


# --------------------------------------------------------------------------
# Phase 3: align (subject-bounded banded SW on selected candidates)
# --------------------------------------------------------------------------

def align_shard(
    qflat: jnp.ndarray,        # (Qf, Lq)
    buffer: jnp.ndarray,       # lead-padded shard buffer
    starts: jnp.ndarray,
    subject_ids: jnp.ndarray,
    lengths: jnp.ndarray,
    matrix: jnp.ndarray,
    sel_gsid: jnp.ndarray,     # (Qf, C) global top-N candidates (all shards)
    sel_lbin: jnp.ndarray,     # (Qf, C)
    *,
    band: int,
    gap_open: int,
    gap_extend: int,
    chunk: int,
    use_pallas: bool,
    lead: int,
    fused_words: Optional[tuple] = None,
    code_limit: int = 23,
    fused_interpret: bool = False,
    srow_identity: int = 0,
):
    """Returns (score, qend, bend, s_end, g0, srow, owned), each (Qf, C);
    score is 0 (and fields garbage) for candidates not owned by this shard.

    srow_identity > 0: the caller guarantees subject_ids[:srow_identity]
    == arange(srow_identity) (true for every 1-shard / merged-colocated
    index; the stacked row is BIG-padded beyond it) — the gsid -> row
    map is then the identity and the (Qf x C)-lane searchsorted (a
    20-step binary search of elementwise gathers, one of the largest
    non-kernel costs in PROFILE_r05's align_prep wall) plus the
    ownership gather drop to pure arithmetic. Bit-identical by
    construction.
    """
    Qf, Lq = qflat.shape
    C = sel_gsid.shape[1]
    qi = qflat.astype(jnp.int32)
    S = subject_ids.shape[0]
    if srow_identity:
        srow = jnp.clip(sel_gsid, 0, S - 1)
        owned = (sel_gsid >= 0) & (sel_gsid < srow_identity)
    else:
        srow = jnp.clip(jnp.searchsorted(subject_ids, sel_gsid), 0, S - 1)
        owned = (subject_ids[srow] == sel_gsid) & (sel_gsid < BIG)
    sub_start = starts[srow]
    sub_len = lengths[srow]
    half = band // 2
    g0 = jnp.where(
        owned, sub_start + sel_lbin * half - Lq - band // 4, 0
    ).astype(jnp.int32)
    lo = jnp.where(owned, sub_start, 0).astype(jnp.int32)
    hi = (lo + jnp.where(owned, sub_len, 0)).astype(jnp.int32)

    N = Qf * C
    npad = _round_up(N, chunk)

    def padflat(x, fill):
        f = x.reshape(-1)
        return jnp.concatenate([f, jnp.full(npad - N, fill, f.dtype)])

    qrep = jnp.repeat(qi, C, axis=0)
    qrep = jnp.concatenate(
        [qrep, jnp.full((npad - N, Lq), 25, jnp.int32)], axis=0
    )
    g0f, lof, hif = padflat(g0, 0), padflat(lo, 0), padflat(hi, 0)
    # Row tiling: pad Lq up to a multiple of the kernel row tile (padded
    # rows get masked scores — they decay every DP value strictly, so they
    # can never change the best cell or its tie-break).
    rtile = Lq if Lq <= 256 else 128
    # Fused-scoring wavefront kernel (kernels/sw_fused.py): the flagship
    # align path — no HBM score tensor, scores generated in-kernel from the
    # raw codes. Falls back to the score-fed kernels when its packed
    # best-tracking cannot cover Lq. MUST stay the same predicate the
    # engine's chunk sizing uses (sw_fused.fused_ok) — a divergence would
    # size score-fed chunks for the fused kernel's tiny footprint.
    use_fused = (
        (use_pallas or fused_interpret) and fused_words is not None
        and sw_fused.fused_ok(Lq, band)
    )
    use_wave = (
        use_pallas and not use_fused
        and Lq >= 64 and band >= 16 and band % 2 == 0
        # conservative bound on sw_wave's internal packing check
        and 15 * Lq < (1 << (31 - (Lq + 2 * band).bit_length()))
    )
    lq_pad = _round_up(Lq, rtile) - Lq
    use_i8 = band % 32 == 0  # int8 masked tiles: 1/4 score-tensor traffic
    iota_ib = (
        jnp.arange(Lq, dtype=jnp.int32)[:, None]
        + jnp.arange(band, dtype=jnp.int32)[None, :]
    )

    # Window fetch, TPU-native: per-alignment slice gathers (vmapped
    # dynamic_slice) measure ~60 ms and elementwise gathers ~35 ms for a
    # 4096-read batch; whole aligned-ROW gathers are row-count bound
    # (~106 ns/row) — fetch_windows uses ONE 512 B overlap-view row per
    # window at short wlen, two 128 B rows otherwise.
    w_all = fetch_windows(buffer, g0f, lead, Lq + band)

    def chunk_fn(args):
        qc, w, g0c, loc, hic = args
        if use_fused:
            return sw_fused.sw_fused_wave(
                qc, w, fused_words, loc - g0c, hic - g0c,
                gap_open, gap_extend, band, code_limit=code_limit,
                interpret=fused_interpret,
            )
        if use_i8:
            sc = sw_xla.banded_scores_i8(qc, w, matrix, band, g0c, loc, hic)
            pad_val = sw_xla.MASKED_I8
        else:
            sc = sw_xla.banded_scores(qc, w, matrix, band)
            j = g0c[:, None, None] + iota_ib[None]
            inb = (j >= loc[:, None, None]) & (j < hic[:, None, None])
            sc = jnp.where(inb, sc, LOW)
            pad_val = LOW
        if use_wave:
            # wavefront kernel: ~1.5x the row kernel's DP throughput; its
            # fixed skew cost (B/2-1 extra slabs) amortizes for longer
            # frames, so it is the long-frame/long-read kernel
            return sw_wave.sw_banded_wave(sc, gap_open, gap_extend)
        if lq_pad:
            sc = jnp.pad(
                sc, ((0, 0), (0, lq_pad), (0, 0)), constant_values=pad_val
            )
        if use_pallas:
            return sw_pallas.sw_banded_pallas(
                sc, gap_open, gap_extend, row_tile=rtile
            )
        return sw_xla.sw_banded.__wrapped__(sc, gap_open, gap_extend)

    nchunks = npad // chunk
    if nchunks == 1:
        # single-chunk fast path: no lax.map wrapper at all — the map's
        # while-loop lowering pessimizes the enclosed gathers/selects
        # (part of PROFILE_r05's 79 ms align_prep wall)
        s, ie, be = chunk_fn((qrep, w_all, g0f, lof, hif))
    else:
        s, ie, be = lax.map(
            chunk_fn,
            (
                qrep.reshape(nchunks, chunk, Lq),
                w_all.reshape(nchunks, chunk, Lq + band),
                g0f.reshape(nchunks, chunk),
                lof.reshape(nchunks, chunk),
                hif.reshape(nchunks, chunk),
            ),
        )
    score = s.reshape(-1)[:N].reshape(Qf, C)
    qend = ie.reshape(-1)[:N].reshape(Qf, C)
    bend = be.reshape(-1)[:N].reshape(Qf, C)
    score = jnp.where(owned & (score > 0), score, 0)
    s_end = sel_lbin * half - Lq - band // 4 + qend + bend  # subject-local
    s_end = jnp.where(score > 0, s_end, 0)
    qend = jnp.where(score > 0, qend, 0)
    bend = jnp.where(score > 0, bend, 0)
    return score, qend, bend, s_end, g0, srow, owned


def rank_reads(score, gsid, frame, qend, s_end, bend, g0, srow, shard, topk,
               use_kernel: bool = False):
    """Per-read deterministic top-k over (R, M) fields (device path).

    use_kernel (TPU): the 9-operand variadic lax.sort lowers to ~28 ms
    on TPU for a (4096, 48) problem (PROFILE_r04.json) — the Pallas
    lexicographic bitonic (kernels/sort.lex_rank_rows) does the same
    compare-exchange work in well under a millisecond. Both paths break
    full-5-key ties by original position (lax.sort defaults
    is_stable=True; the kernel carries the original index as its final
    compare key), so the outputs are bit-identical in ALL cases,
    including full-key ties with differing payloads."""
    g = jnp.where(score > 0, gsid, BIG)
    fields = (-score, g, frame, qend, s_end, bend, g0, srow, shard)
    if use_kernel:
        from ghostm_tpu.kernels.sort import lex_rank_rows

        out = lex_rank_rows(fields, SORT_NUM_KEYS, topk)
    else:
        ops = lax.sort(fields, num_keys=SORT_NUM_KEYS)
        out = tuple(op[:, :topk] for op in ops)
    return (-out[0],) + out[1:]


# --------------------------------------------------------------------------
# Jitted single-shard convenience wrappers (loop path)
# --------------------------------------------------------------------------

propose_shard_jit = functools.partial(
    jax.jit,
    static_argnames=("seed_len", "expand", "band", "ncand", "min_votes",
                     "smooth", "nbins", "use_sort_kernel", "fuse_tables",
                     "direct_tables", "table_width", "presorted_run",
                     "chain_gamma"),
)(propose_shard)

align_shard_jit = functools.partial(
    jax.jit,
    static_argnames=("band", "gap_open", "gap_extend", "chunk", "use_pallas",
                     "lead", "fused_words", "code_limit", "fused_interpret",
                     "srow_identity"),
)(align_shard)


@functools.partial(jax.jit, static_argnames=("ncand", "use_kernel"))
def _select_jit(pg, pb, pv, ncand, use_kernel=False):
    """Global candidate selection on device (votes desc, gsid, lbin)."""
    sel_g, sel_b, sel_v = cand_mod.select_global(
        pg, pb, pv, ncand, use_kernel
    )
    return (
        jnp.where(sel_v > 0, sel_g, BIG),
        jnp.where(sel_v > 0, sel_b, BIG),
    )


@functools.partial(jax.jit, static_argnames=("R", "K", "use_kernel"))
def _merge_rank_jit(stacked, sel_g, R, K, use_kernel=False):
    """Disjoint-mask merge of per-shard align outputs + per-read top-k,
    on device; returns ONE packed (9, R, K) int32 array (single fetch)."""
    score, qend, bend, s_end, g0, srow, owned = stacked  # each (S, Qf, C)
    live = owned & (score > 0)
    S = score.shape[0]
    sid = jnp.arange(S, dtype=jnp.int32)[:, None, None]
    m = lambda f: jnp.sum(jnp.where(live, f, 0), axis=0)
    score_m = jnp.sum(score, axis=0)  # align_shard zeroes unowned scores
    qend_m, bend_m, s_end_m = m(qend), m(bend), m(s_end)
    g0_m, srow_m = m(g0), m(srow)
    shard_m = jnp.sum(jnp.where(live, sid, 0), axis=0)
    C = score_m.shape[1]
    M = NFRAMES * C
    rs = lambda a: a.reshape(R, M)
    frame = jnp.tile(
        jnp.repeat(jnp.arange(NFRAMES, dtype=jnp.int32), C)[None, :], (R, 1)
    )
    gsid = jnp.where(score_m > 0, sel_g, BIG).reshape(R, M)
    return jnp.stack(rank_reads(
        rs(score_m), gsid, frame, rs(qend_m), rs(s_end_m), rs(bend_m),
        rs(g0_m), rs(srow_m), rs(shard_m), K, use_kernel,
    ))


@dataclasses.dataclass
class BatchHits:
    """Merged per-read top-k across shards (host numpy, (R, K) arrays)."""
    score: np.ndarray
    gsid: np.ndarray
    frame: np.ndarray
    qend: np.ndarray
    s_end: np.ndarray
    bend: np.ndarray
    g0: np.ndarray
    srow: np.ndarray
    shard: np.ndarray


class SearchEngine:
    """Host driver: owns device copies of the index and the compiled steps."""

    def __init__(
        self,
        cfg: Config,
        index: StackedIndex,
        use_pallas: Optional[bool] = None,
        mesh=None,
        fused_interpret: bool = False,
    ):
        """fused_interpret=True routes the align phase through the fused
        Pallas kernel in INTERPRET mode even off-TPU — covers the fused
        static-arg plumbing (incl. through shard_map) on the CPU mesh."""
        self.cfg = cfg
        self._checked_fn = None
        self._fullstep_cache = {}
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        self.use_pallas = use_pallas
        # Colocated-shard merge (VERDICT r04 missing #2): on the loop path
        # every shard's propose/align runs sequentially on the ONE device,
        # costing ~n_shards x the single-shard work (measured: 2-shard
        # colocated ran at ~53% of 1-shard reads/s). When the merged index
        # still fits the direct-table int32 packing, fold all shards into
        # one logical shard at init — bit-identical by the shard-invariance
        # contract (tests/test_index.py asserts byte-equality with a
        # 1-shard build), full 1-shard throughput. Shards whose merged
        # packing would overflow keep the sequential loop (the documented
        # reason to shard a single-host index in the first place —
        # DESIGN.md "replicate-vs-shard rule"). GHOSTM_TPU_MERGE_COLOCATED=0
        # disables (tests use it to cover the true multi-shard loop path).
        self.merged_colocated = False
        if (
            mesh is None and index.buffers.shape[0] > 1
            and os.environ.get("GHOSTM_TPU_MERGE_COLOCATED", "1") != "0"
            and _merge_fits_direct(index, cfg)
        ):
            from ghostm_tpu.index.diskio import merge_shards

            index = merge_shards(index)
            self.merged_colocated = True
        self.index = index
        self.lead = lead_pad(cfg)
        self.matrix = jnp.asarray(padded_matrix(cfg.matrix, hard_stop=True))
        self.mesh = mesh
        self.n_shards = index.buffers.shape[0]
        n_sw = cfg.query_batch * NFRAMES * cfg.candidates_per_frame
        # SW chunk sizing is KERNEL-MODE-AWARE (r04, PROFILE_r04.json):
        # the fused kernel has no HBM score tensor — its per-chunk
        # footprint is just the transposed code slabs (~1 KB/alignment at
        # config-2) — so it takes big chunks (fewer sequential lax.map
        # steps, each with fixed prep cost). Score-fed paths keep the
        # 8192 cap bounding the in-flight int32 score tensor (~128 MB) so
        # long-read configs (large Lq * band) do not blow HBM.
        fused_words, code_limit = sw_fused.build_packed_matrix(
            padded_matrix(cfg.matrix, hard_stop=True)
        )
        fused_engaged = (
            (use_pallas or fused_interpret)
            and fused_words is not None  # matrix fits the nibble packing
            and sw_fused.fused_ok(cfg.query_frame_len, cfg.band_width)
        )
        if fused_engaged:
            per_aln = (3 * cfg.query_frame_len + 3 * cfg.band_width + 64) * 4
            # r05: budget sized so a full config-2 batch (Qf x ncand =
            # 393k alignments, ~440 MB of streamed code slabs) runs as
            # ONE chunk — the lax.map wrapper's while-loop lowering was
            # pessimizing the per-chunk gathers/selects (PROFILE_r05
            # align_prep 79 ms); the slabs stream through HBM, they are
            # not VMEM-resident, so the old 128 MB budget was spurious
            hard_cap = 1 << 19
            mem_budget = 512 << 20
        else:
            per_aln = cfg.query_frame_len * cfg.band_width * 4
            hard_cap = 8192
            mem_budget = 128 << 20
        mem_cap = max(128, mem_budget // per_aln)
        self.chunk = max(
            128, min(hard_cap, _round_up(n_sw, 128), mem_cap // 128 * 128)
        )
        self.expand = index.expand_width
        # gsid -> subject-row identity per shard (1-shard and merged
        # indexes always qualify): lets align_shard skip its searchsorted
        self._srow_ident = []
        for i in range(self.n_shards):
            st = index.shards[i].store
            n = st.num_subjects
            ident = n > 0 and bool(
                (np.asarray(st.subject_ids) == np.arange(n)).all()
            )
            self._srow_ident.append(n if ident else 0)
        self._propose_static = dict(
            seed_len=cfg.seed_len,
            expand=self.expand,
            band=cfg.band_width,
            ncand=cfg.candidates_per_frame,
            min_votes=cfg.min_votes,
            smooth=cfg.smooth_bins,
            chain_gamma=cfg.chain_gamma,
            nbins=int(index.lengths.max() + cfg.query_frame_len)
            // (cfg.band_width // 2) + 2,
            use_sort_kernel=use_pallas,
        )
        self._nbins = self._propose_static["nbins"]
        self._align_static = dict(
            band=cfg.band_width,
            gap_open=cfg.gap_open,
            gap_extend=cfg.gap_extend,
            chunk=self.chunk,
            use_pallas=use_pallas,
            lead=self.lead,
            fused_words=(
                fused_words if (use_pallas or fused_interpret) else None
            ),
            code_limit=code_limit,
            fused_interpret=fused_interpret,
        )
        half = cfg.band_width // 2
        Lqf = cfg.query_frame_len
        # Aligned-table row width: whole-row gathers cover the expansion in
        # ceil(expand/width) gathers; every non-empty bucket pads to a
        # multiple of width. At k=5 scales (3.2M buckets, hits_per_seed
        # 128-256) a full-expansion width can inflate the table to several
        # GB (VERDICT r01 weak #4) — step the width down (propose already
        # supports multi-row gathers) until padding stays within 2x the
        # raw positions.
        width = 64
        while width < self.expand:
            width *= 2
        raw_positions = max(
            1, sum(len(sh.seeds.positions) for sh in index.shards)
        )
        while width > 32 and self._padded_total(width) > 2 * raw_positions:
            width //= 2
        self._table_width = width
        maps, mode, width = build_key_tables(
            index, self._nbins, half, Lqf, width, self.expand,
            colocated_shards=mesh is None,
        )
        # presorted-run stage skip needs runs that exactly tile power-of-two
        # blocks of the key row (see propose_shard docstring). Direct
        # tables guarantee this (run = row width); the aligned layout only
        # gets it when the max bucket count happens to be a power of two.
        if mode == "direct":
            run = width if use_pallas else 0
        else:
            run = (
                self.expand
                if use_pallas and self.expand >= 8
                and (self.expand & (self.expand - 1)) == 0 and mode == "aligned"
                else 0
            )
        self.table_mode = mode
        self._propose_static["fuse_tables"] = mode == "aligned"
        self._propose_static["direct_tables"] = mode == "direct"
        self._propose_static["table_width"] = width
        self._propose_static["presorted_run"] = run

        if mesh is None:
            self.shard_dev: List[dict] = []
            for i in range(self.n_shards):
                self.shard_dev.append(
                    dict(
                        buffer=jnp.asarray(pad_buffer(index.buffers[i], cfg)),
                        bucket_starts=jnp.asarray(index.bucket_starts[i]),
                        starts=jnp.asarray(index.starts[i]),
                        subject_ids=jnp.asarray(index.subject_ids[i]),
                        lengths=jnp.asarray(index.lengths[i]),
                        tab_main=jnp.asarray(maps[i][0]),
                        tab_aux=jnp.asarray(maps[i][1]),
                    )
                )
        else:
            from ghostm_tpu.parallel import mesh as pm
            from ghostm_tpu.parallel.search import make_distributed_step

            n_db = mesh.shape[pm.DB_AXIS]
            n_data = mesh.shape[pm.DATA_AXIS]
            if self.n_shards != n_db:
                raise ValueError(
                    f"index has {self.n_shards} shards, mesh db axis is {n_db}"
                )
            if cfg.query_batch % n_data:
                raise ValueError("query_batch must divide by mesh data axis")
            idx_sh = pm.index_sharding(mesh)
            put = functools.partial(jax.device_put, device=idx_sh)
            buffers = np.stack(
                [pad_buffer(index.buffers[i], cfg) for i in range(n_db)]
            )
            self.shard_dev = [
                dict(
                    buffer=put(buffers),
                    bucket_starts=put(index.bucket_starts),
                    starts=put(index.starts),
                    subject_ids=put(index.subject_ids),
                    lengths=put(index.lengths),
                    tab_main=put(pad_stack([m[0] for m in maps])),
                    tab_aux=put(pad_stack([m[1] for m in maps])),
                )
            ]
            self._qsharding = pm.query_sharding(mesh)
            self.matrix = jax.device_put(
                np.asarray(self.matrix), pm.replicated(mesh)
            )
            self._dist_step = make_distributed_step(
                mesh, self._propose_static, self._align_static, cfg.max_hits
            )

    def translate(self, dna: np.ndarray, lengths: np.ndarray) -> np.ndarray:
        return six_frame_translate(dna, lengths, self.cfg.query_frame_len)

    def _padded_total(self, width: int) -> int:
        """Total bucket-aligned table entries at a given row width."""
        total = 0
        for sh in self.index.shards:
            counts = np.diff(np.asarray(sh.seeds.bucket_starts, np.int64))
            total += int((-(-counts // width) * width).sum())
        return total

    # ------------------------------------------------------------------
    def _search_phases(self, qflat: jnp.ndarray, R: int, jitted=True,
                       shard_dev=None, matrix=None) -> jnp.ndarray:
        """Loop-path search entirely on device: propose -> select -> align
        -> rank; returns the packed (9, R, K) int32 array WITHOUT fetching.
        The tunnel backend charges ~30 ms per host fetch, so everything
        stays device-resident until the caller fetches ONE array.

        jitted=True runs the phases as SEPARATE jitted programs chained
        asynchronously (CPU/test path); jitted="inline" runs the raw phase
        functions with the PRODUCTION static flags so a caller can trace
        the whole batch into ONE program (self._fullstep_for — the TPU
        pipeline path: the axon runtime misbehaves on long cross-program
        async chains, and one program per batch is also fewer dispatches);
        jitted=False traces the raw phase functions on the XLA
        (non-Pallas) paths so a checkify transform can see through them
        (search_batch_checked) — bit-identical values all three ways."""
        C = self.cfg.candidates_per_frame
        K = self.cfg.max_hits
        if jitted is True:
            pfn, afn = propose_shard_jit, align_shard_jit
            sfn, mfn = _select_jit, _merge_rank_jit
            ps, als = self._propose_static, self._align_static
        elif jitted == "inline":
            pfn, afn = propose_shard, align_shard
            sfn, mfn = _select_jit.__wrapped__, _merge_rank_jit.__wrapped__
            ps, als = self._propose_static, self._align_static
        else:
            pfn, afn = propose_shard, align_shard
            sfn, mfn = _select_jit.__wrapped__, _merge_rank_jit.__wrapped__
            ps = dict(self._propose_static, use_sort_kernel=False,
                      presorted_run=0)
            als = dict(self._align_static, use_pallas=False,
                       fused_words=None, fused_interpret=False)
        shard_dev = shard_dev if shard_dev is not None else self.shard_dev
        matrix = matrix if matrix is not None else self.matrix
        props = []
        for d in shard_dev:
            props.append(pfn(
                qflat, d["bucket_starts"], d["tab_main"],
                d["tab_aux"], d["subject_ids"], **ps,
            ))
        pg = jnp.concatenate([p[0] for p in props], axis=1)
        pb = jnp.concatenate([p[1] for p in props], axis=1)
        pv = jnp.concatenate([p[2] for p in props], axis=1)
        sel_g, sel_b = sfn(pg, pb, pv, C, als.get("use_pallas", False))
        outs = []
        for i, d in enumerate(shard_dev):
            outs.append(afn(
                qflat, d["buffer"], d["starts"], d["subject_ids"],
                d["lengths"], matrix, sel_g, sel_b,
                **dict(als, srow_identity=self._srow_ident[i]),
            ))
        stacked = [jnp.stack(x) for x in zip(*outs)]
        uk = als.get("use_pallas", False)
        return mfn(stacked, sel_g, R, K, uk)

    def _search_dev(self, qflat: jnp.ndarray, R: int) -> jnp.ndarray:
        return self._search_phases(qflat, R, jitted=True)

    _SHARD_KEYS = ("bucket_starts", "tab_main", "tab_aux", "subject_ids",
                   "lengths", "buffer", "starts")

    def _step_body(self, qcodes3, matrix, flat, R):
        """Traced body shared by the qcodes and the dna full-step
        programs: propose (all shards) -> select -> align -> rank ->
        packed refine, returning the (18, R, K) array."""
        cfg = self.cfg
        n_shards = self.n_shards
        nkeys = len(self._SHARD_KEYS)
        shard_dev = [
            dict(zip(self._SHARD_KEYS, flat[i * nkeys:(i + 1) * nkeys]))
            for i in range(n_shards)
        ]
        qflat = qcodes3.reshape(R * NFRAMES, cfg.query_frame_len)
        packed = self._search_phases(
            qflat, R, jitted="inline", shard_dev=shard_dev, matrix=matrix,
        )
        refine_args = []
        for d in shard_dev:
            refine_args += [d["buffer"], d["starts"], d["lengths"]]
        stats = self._refine_packed_jit.__wrapped__(
            qcodes3, packed, matrix, *refine_args
        )
        return jnp.concatenate([packed, stats], axis=0)

    def _fullstep_for(self, R: int):
        """ONE jitted program for a whole loop-path batch: propose (all
        shards) -> select -> align -> rank -> packed refine, returning the
        (18, R, K) array search_refine_async fetches. One execution + one
        fetch per batch: besides saving ~6 dispatches (1-4 ms each on the
        tunnel), this avoids an axon-runtime failure mode where long
        ASYNC chains of separate programs poison the next execution
        (INVALID_ARGUMENT on any later program; first seen at config-3
        scale, 2-shard k=5 index — each program individually re-executes
        fine, only the cross-program chain breaks). Index arrays are
        explicit arguments, not jit-captured constants, so multi-GB
        tables never get baked into the executable."""
        fn = self._fullstep_cache.get(R)
        if fn is not None:
            return fn

        def step(qcodes3, matrix, *flat):
            return self._step_body(qcodes3, matrix, flat, R)

        fn = jax.jit(step)
        self._fullstep_cache[R] = fn
        return fn

    def _pack_transport(self, out18):
        """(18, R, K) full-step output -> (6, R, K) int32 packed
        transport holding EXACTLY the fields report.write_hits consumes
        (gsid, score, frame, subject-local end, qstart/qend, window-local
        sstart/send, length, matches, mismatch, gapopen). The tunnel
        fetches D2H at ~12-40 MB/s (weather; tools probe r05), so the
        72 B/hit full payload cost 200-500 ms/batch — 3x fewer bytes is
        the single biggest e2e lever after the device step itself.
        Bounds asserted by _pack_ok at init; bit-exact round trip
        (unpack_results, tests/test_pipeline.py)."""
        score, gsid, frame = out18[0], out18[1], out18[2]
        s_end = out18[4]
        qs, qe, ss, se = (out18[9] + 1, out18[10] + 1, out18[11] + 1,
                          out18[12] + 1)
        length, matches, mism, gap = (out18[13], out18[14], out18[15],
                                      out18[16])
        w1 = (score << 15) | (frame << 12) | gap
        w2 = (qs << 13) | qe
        w3 = (ss << 13) | se
        w4 = (length << 13) | matches
        w5 = (mism << 19) | s_end
        return jnp.stack([gsid, w1, w2, w3, w4, w5])

    @functools.cached_property
    def _pack_ok(self) -> bool:
        """Can the packed transport hold this config's value ranges?
        (score < 2^17, coords+1 < 2^13, subject-local end < 2^19,
        mismatch < 2^13, gapopen < 2^12.) Falls back to the full
        (18, R, K) payload otherwise — e.g. very long frames or
        million-residue subjects."""
        cfg = self.cfg
        Lq, B = cfg.query_frame_len, cfg.band_width
        max_score = int(np.asarray(self.matrix).max()) * Lq
        return bool(
            Lq + B + 2 < (1 << 13)
            and max_score < (1 << 17)
            and Lq < (1 << 12)
            and int(self.index.lengths.max()) + B + Lq < (1 << 19)
        )

    def unpack_transport(self, arr: np.ndarray):
        """(6, R, K) packed transport -> (BatchHits, stats). The
        bookkeeping fields the writer never reads (qend/bend/g0/srow/
        shard — window coordinates internal to the device step) come
        back as zeros; score_check is omitted (the full payload keeps
        it — used by tests and --check only)."""
        w = arr.astype(np.uint32)
        z = np.zeros_like(arr[0])
        score = (w[1] >> 15).astype(np.int32)
        frame = ((w[1] >> 12) & 7).astype(np.int32)
        gap = (w[1] & 0xFFF).astype(np.int32)
        qs = ((w[2] >> 13) & 0x1FFF).astype(np.int32) - 1
        qe = (w[2] & 0x1FFF).astype(np.int32) - 1
        ss = ((w[3] >> 13) & 0x1FFF).astype(np.int32) - 1
        se = (w[3] & 0x1FFF).astype(np.int32) - 1
        length = ((w[4] >> 13) & 0x1FFF).astype(np.int32)
        matches = (w[4] & 0x1FFF).astype(np.int32)
        mism = (w[5] >> 19).astype(np.int32)
        s_end = (w[5] & 0x7FFFF).astype(np.int32)
        hits = BatchHits(
            score=score, gsid=arr[0], frame=frame, qend=z, s_end=s_end,
            bend=z, g0=z, srow=z, shard=z,
        )
        stats = dict(qstart=qs, qend=qe, sstart=ss, send=se, length=length,
                     matches=matches, mismatch=mism, gapopen=gap)
        return hits, stats

    def _fullstep_dna_for(self, R: int):
        """The dna-input full step (the pipeline's operative program):
        six-frame translation runs ON DEVICE inside the same compiled
        program (ops.translate.six_frame_translate_jnp — the host
        translate cost ~34 ms of serial main-thread time per 8192-read
        batch, PROFILE_r05 gap analysis), the H2D transfer shrinks 2.4x
        (raw dna vs 6 translated frames), and the result is PACKED to
        6 words/hit for the slow tunnel D2H (when _pack_ok).
        Writer-visibly identical to translate + _fullstep_for
        (tests/test_pipeline.py)."""
        from ghostm_tpu.ops.translate import six_frame_translate_jnp

        fn = self._fullstep_cache.get(("dna", R))
        if fn is not None:
            return fn
        Lq = self.cfg.query_frame_len
        pack = self._pack_ok

        def step(dna, lens, matrix, *flat):
            qcodes3 = six_frame_translate_jnp(dna, lens, Lq)
            out = self._step_body(qcodes3, matrix, flat, R)
            return self._pack_transport(out) if pack else out

        fn = jax.jit(step)
        self._fullstep_cache[("dna", R)] = fn
        return fn

    def search_batch_checked(self, qcodes: np.ndarray) -> BatchHits:
        """Debug mode (SURVEY.md §5.2, CLI --check): run the full search
        math under jax.experimental.checkify with out-of-bounds index and
        float-error checks, on the XLA (non-Pallas) phase variants — the
        values are bit-identical to the production paths, so a check
        failure here means the production step computes with OOB gathers
        or NaNs too. Raises checkify.JaxRuntimeError on violation."""
        from jax.experimental import checkify

        assert self.mesh is None, "--check supports the loop path only"
        R = qcodes.shape[0]
        qflat = jnp.asarray(
            qcodes.reshape(R * NFRAMES, self.cfg.query_frame_len)
        )
        if self._checked_fn is None or self._checked_fn[0] != R:
            f = functools.partial(self._search_phases, R=R, jitted=False)
            self._checked_fn = (R, jax.jit(checkify.checkify(
                f, errors=checkify.index_checks | checkify.float_checks
            )))
        err, packed = self._checked_fn[1](qflat)
        checkify.check_error(err)
        out = np.asarray(packed)
        return BatchHits(*(out[i] for i in range(9)))

    def search_batch(self, qcodes: np.ndarray) -> BatchHits:
        """qcodes: (R, 6, Lq) int8 translated frames. Returns merged top-k."""
        R = qcodes.shape[0]
        qflat_np = qcodes.reshape(R * NFRAMES, self.cfg.query_frame_len)
        if self.mesh is not None:
            return self.search_batch_stats(qcodes)[0]
        packed = self._search_dev(jnp.asarray(qflat_np), R)
        out = np.asarray(packed)
        return BatchHits(*(out[i] for i in range(9)))

    def search_batch_stats(self, qcodes: np.ndarray):
        """Mesh path: ONE compiled shard_map step returns the ranked hits
        AND their refine stats (in-graph window fetch + moves DP, VERDICT
        weak #5 — no per-batch host buffer work). Returns
        (BatchHits, stats dict), both host numpy."""
        assert self.mesh is not None
        R = qcodes.shape[0]
        qflat_np = qcodes.reshape(R * NFRAMES, self.cfg.query_frame_len)
        d = self.shard_dev[0]
        out = self._dist_step(
            jax.device_put(qflat_np, self._qsharding),
            d["buffer"], d["bucket_starts"], d["tab_main"],
            d["tab_aux"], d["starts"], d["subject_ids"], d["lengths"],
            self.matrix,
        )
        out = {k: np.asarray(v) for k, v in out.items()}
        hits = BatchHits(
            **{k: out[k] for k in BatchHits.__dataclass_fields__}
        )
        stats = {k: out["qend_s" if k == "qend" else k]
                 for k in self.STAT_KEYS}
        stats["score_check"] = out["score_check"]
        return hits, stats

    def search_batch_stats_local(self, qcodes: np.ndarray):
        """Multi-process mesh path (SURVEY.md config 4): run the same
        compiled step, but fetch only the rows THIS process holds.
        Outputs are data-sharded and db-replicated; taking each row
        block's replica 0 means every global row is returned by exactly
        one process. Returns [(row_start, BatchHits, stats)] sorted by
        row_start — the pipeline writes row-addressed result parts."""
        assert self.mesh is not None
        R = qcodes.shape[0]
        qflat_np = qcodes.reshape(R * NFRAMES, self.cfg.query_frame_len)
        d = self.shard_dev[0]
        out = self._dist_step(
            jax.device_put(qflat_np, self._qsharding),
            d["buffer"], d["bucket_starts"], d["tab_main"],
            d["tab_aux"], d["starts"], d["subject_ids"], d["lengths"],
            self.matrix,
        )

        def blocks(arr):
            b = {}
            for sh in arr.addressable_shards:
                if sh.replica_id == 0:
                    b[sh.index[0].start or 0] = np.asarray(sh.data)
            return b

        per = {k: blocks(v) for k, v in out.items()}
        res = []
        for st0 in sorted(per["score"]):
            hits = BatchHits(
                **{k: per[k][st0] for k in BatchHits.__dataclass_fields__}
            )
            stats = {k: per["qend_s" if k == "qend" else k][st0]
                     for k in self.STAT_KEYS}
            stats["score_check"] = per["score_check"][st0]
            res.append((st0, hits, stats))
        return res

    # ------------------------------------------------------------------
    STAT_KEYS = ("qstart", "qend", "sstart", "send", "length", "matches",
                 "mismatch", "gapopen")

    def search_refine_async(self, qcodes: np.ndarray) -> jnp.ndarray:
        """Dispatch search + refine for one batch WITHOUT blocking: returns
        one device-resident (18, R, K) int32 array (9 hit fields + 8
        alignment stats + score_check). JAX dispatch is asynchronous, so the
        pipeline can overlap this batch's device work with the previous
        batch's host-side fetch/format/write (ghostm_tpu.pipeline). Loop
        path only (the mesh path fetches through search_batch).
        Bit-identical to search_batch + refine (tests/test_pipeline.py).
        The whole batch is ONE compiled program (_fullstep_for). A tail
        batch smaller than cfg.query_batch is PADDED up to it with inert
        reads (code 25 frames — every row's search is row-independent, so
        real rows are bit-identical) and the pad rows sliced off: one
        program shape ever compiles, instead of paying a second
        minutes-long trace for the final partial batch."""
        assert self.mesh is None
        R = qcodes.shape[0]
        Rb = self.cfg.query_batch
        if R < Rb:
            pad = np.full((Rb - R,) + qcodes.shape[1:], 25, qcodes.dtype)
            qcodes = np.concatenate([qcodes, pad])
        args = []
        for d in self.shard_dev:
            args += [d[k] for k in self._SHARD_KEYS]
        out = self._fullstep_for(qcodes.shape[0])(
            jnp.asarray(qcodes), self.matrix, *args
        )
        return out[:, :R] if R < Rb else out

    def search_refine_async_dna(self, dna: np.ndarray,
                                lens: np.ndarray) -> jnp.ndarray:
        """search_refine_async taking RAW DNA reads: translation runs on
        device inside the one compiled program (_fullstep_dna_for). Same
        tail-batch padding contract (pad reads are length-0 -> all-PAD
        frames -> inert). Bit-identical to
        search_refine_async(translate(dna, lens))."""
        assert self.mesh is None
        R = dna.shape[0]
        Rb = self.cfg.query_batch
        if R < Rb:
            dna = np.concatenate(
                [dna, np.full((Rb - R,) + dna.shape[1:], 4, dna.dtype)]
            )
            lens = np.concatenate([lens, np.zeros(Rb - R, lens.dtype)])
        args = []
        for d in self.shard_dev:
            args += [d[k] for k in self._SHARD_KEYS]
        out = self._fullstep_dna_for(dna.shape[0])(
            jnp.asarray(dna), jnp.asarray(np.asarray(lens, np.int32)),
            self.matrix, *args,
        )
        return out[:, :R] if R < Rb else out

    def unpack_results(self, arr: np.ndarray):
        """Fetched full-step array -> (BatchHits, stats dict); accepts
        the full (18, R, K) payload or the (6, R, K) packed transport."""
        if arr.shape[0] == 6:
            return self.unpack_transport(arr)
        hits = BatchHits(*(arr[i] for i in range(9)))
        stats = {k: arr[9 + j] for j, k in enumerate(self.STAT_KEYS)}
        stats["score_check"] = arr[17]
        return hits, stats

    @functools.cached_property
    def _padded_host(self) -> List[np.ndarray]:
        """Sentinel-padded host buffers, built once (engine.refine used to
        re-pad every batch — O(buffer) host copy per shard per batch)."""
        return [
            pad_buffer(self.index.buffers[i], self.cfg)
            for i in range(self.n_shards)
        ]

    @functools.cached_property
    def _refine_packed_jit(self):
        cfg = self.cfg
        return _make_refine_packed(
            self.n_shards, cfg.band_width, cfg.gap_open, cfg.gap_extend,
            self.lead,
        )

    # ------------------------------------------------------------------
    def refine(self, qcodes: np.ndarray, hits: BatchHits) -> Dict[str, np.ndarray]:
        """Recompute the banded DP with move recording for reported hits and
        return alignment stats, all (R, K): qstart/qend (frame-local aa,
        inclusive), sstart/send (window-local), length, matches, mismatch,
        gapopen. Invalid hits (score 0) get -1 coords.

        The DP, move recording AND traceback walk all run on device; only
        the small stat vectors cross the host boundary (the move matrices
        are ~50 MB/batch — SURVEY.md §3.3 boundary discipline)."""
        cfg = self.cfg
        R, K = hits.score.shape
        Lq, B = cfg.query_frame_len, cfg.band_width
        n = R * K
        flat_read = np.repeat(np.arange(R), K)
        qc = qcodes[flat_read, hits.frame.reshape(-1)]        # (n, Lq)
        wlen = Lq + B
        w = np.full((n, wlen), SENTINEL, dtype=np.int8)
        lo = np.zeros(n, np.int64)
        hi = np.zeros(n, np.int64)
        g0f = hits.g0.reshape(-1).astype(np.int64)
        srowf = hits.srow.reshape(-1)
        for si in range(self.n_shards):
            m = hits.shard.reshape(-1) == si
            if not m.any():
                continue
            buf = self._padded_host[si]
            starts_w = g0f[m] + self.lead
            w[m] = buf[starts_w[:, None] + np.arange(wlen)[None, :]]
            st = self.index.starts[si][srowf[m]]
            lo[m] = st
            hi[m] = st + self.index.lengths[si][srowf[m]]
        s2, stats = _refine_device(
            jnp.asarray(qc.astype(np.int32)), jnp.asarray(w.astype(np.int32)),
            jnp.asarray(g0f.astype(np.int32)), jnp.asarray(lo.astype(np.int32)),
            jnp.asarray(hi.astype(np.int32)), self.matrix,
            gap_open=cfg.gap_open, gap_extend=cfg.gap_extend, band=B,
        )
        stats = {k: np.asarray(v).reshape(R, K) for k, v in stats.items()}
        stats["score_check"] = np.asarray(s2).reshape(R, K)
        return stats
