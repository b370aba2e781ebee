"""Pallas bitonic row sort — the propose phase's workhorse.

Reference equivalent: GHOSTM's CUDA candidate search accumulates
(subject, diagonal) votes with atomic increments (SURVEY.md §2 "Diagonal
voting"); our scatter-free redesign votes by SORTING each query frame's
packed hit keys and run-length-counting (kernels/candidates.py). That
makes the row sort the propose phase's hot loop — and XLA's general
`lax.sort` on TPU is an order of magnitude off what the VPU can do for
a plain int32 ascending sort (measured: >1 s for 24576x2560 keys, vs
tens of ms for this kernel).

TPU-native design:
  * one kernel block = (ROWS, L) int32 in VMEM, L a power of two; each
    row is an independent bitonic sorting network, all rows advance in
    lockstep as full-width vector ops (no comparator function, no
    variadic operands — min/max/select only);
  * the butterfly exchange partner (i XOR d) is built from two
    `pltpu.roll`s along the minor axis plus an iota-bit select, so every
    pass is ~10 elementwise VPU ops;
  * the network is PYTHON-UNROLLED with static shift distances (stages
    k = 1..log2(L), strides d = 2^(k-1)..1 — L=4096 gives 78 passes):
    static rolls compile to single lane-rotate/vreg-permute ops, where
    the earlier SMEM-scheduled fori_loop needed dynamic rotates that
    lowered to multi-op shift networks — measured 69 -> 24 ms on the
    config-2 propose sort. One-time Mosaic compile is ~25 s per shape,
    amortised by the persistent compile cache. Rows that are pure
    padding sort harmlessly.

Caller contract: pad keys with INT32_MAX-class sentinels (our BIG =
2^30 sorts before the pad value below), slice [:, :M] afterwards.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAD = jnp.int32(0x7FFFFFFF)
BIG = 1 << 30   # first invalid key value (matches candidates.BIG)
_LANES = 128


def _bitonic_passes(v, iota, length: int, first: int):
    L = length
    nstage = L.bit_length() - 1
    for k in range(first, nstage + 1):
        # run direction: ascending iff bit k of the index is 0
        dirbit = (iota >> k) & 1
        for j in range(k - 1, -1, -1):
            d = 1 << j
            bit = (iota >> j) & 1
            take_max = bit ^ dirbit
            partner = jnp.where(
                bit == 1,
                pltpu.roll(v, d, axis=1),
                pltpu.roll(v, L - d, axis=1),
            )
            lo = jnp.minimum(v, partner)
            hi = jnp.maximum(v, partner)
            v = jnp.where(take_max == 1, hi, lo)
    return v


def _sort_kernel(x_ref, o_ref, *, rows: int, length: int, first: int):
    iota = jax.lax.broadcasted_iota(jnp.int32, (rows, length), 1)
    o_ref[:] = _bitonic_passes(x_ref[:], iota, length, first)


def _sort_vote_kernel(x_ref, k_ref, v_ref, *, rows: int, length: int,
                      first: int, ncand: int, min_votes: int):
    """Sort + run-length vote + iterative top-ncand, all in VMEM (r04,
    PROFILE_r04.json: the XLA rank passes cost ~30 ms/chunk of pure HBM
    traffic re-reading the 130 MB sorted tensor; in-kernel they are a few
    ms of VPU work on data already resident).

    Emits, per row, lanes [0, ncand) = top keys and [ncand, 2*ncand) =
    top votes in two (rows, LANES) outputs — bit-identical to
    jax.vmap(candidates._per_query)(sorted) with smooth=False,
    chain_gamma=0 (same (votes desc, position asc) selection; the lane
    index differs from the XLA path's M only in the pad tail, where
    votes are 0 both ways)."""
    L = length
    iota = jax.lax.broadcasted_iota(jnp.int32, (rows, L), 1)
    v = _bitonic_passes(x_ref[:], iota, L, first)
    BIGv = jnp.int32(BIG)
    valid = v < BIGv
    prev = pltpu.roll(v, 1, axis=1)
    frst = valid & ((iota == 0) | (v != prev))
    bnd = (frst | ~valid).astype(jnp.int32)   # i32: Mosaic can't roll i1
    # s_next[i] = i + 1 if bnd[i + 1] (i + 1 == L counts as boundary)
    bnd_n = pltpu.roll(bnd, L - 1, axis=1)          # bnd[i + 1], wrapped
    s_next = jnp.where(
        iota == L - 1, L, jnp.where(bnd_n == 1, iota + 1, BIGv)
    ).astype(jnp.int32)
    # suffix (reverse) cummin, Hillis-Steele over lane rolls
    d = 1
    while d < L:
        t = jnp.where(
            iota < L - d, pltpu.roll(s_next, L - d, axis=1), BIGv
        )
        s_next = jnp.minimum(s_next, t)
        d *= 2
    votes = jnp.where(frst, s_next - iota, 0)
    votes = jnp.where(votes >= min_votes, votes, 0)
    shift = L.bit_length()
    pk = (votes << shift) | (L - 1 - iota)
    keys_out = jnp.zeros((rows, _LANES), jnp.int32)
    votes_out = jnp.zeros((rows, _LANES), jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1)
    for c in range(ncand):
        m = jnp.max(pk, axis=1, keepdims=True)       # unique (idx packed)
        tv = m >> shift
        kk = jnp.max(jnp.where(pk == m, v, 0), axis=1, keepdims=True)
        kk = jnp.where(tv > 0, kk, BIGv)
        keys_out = jnp.where(lane == c, kk, keys_out)
        votes_out = jnp.where(lane == c, tv, votes_out)
        pk = jnp.where(pk == m, 0, pk)
    k_ref[:] = keys_out
    v_ref[:] = votes_out


def _lex_rank_kernel(*refs, rows: int, length: int, num_keys: int,
                     nops: int):
    """Multi-operand bitonic sort, ascending-lexicographic on the first
    num_keys operands with the ORIGINAL POSITION as the final tie-break
    (stable-sort semantics); remaining operands ride as payload. Used for
    the per-read hit ranking: XLA's 9-operand variadic lax.sort costs
    ~28 ms/batch on TPU for a (4096, 48) problem whose actual compare
    work is well under a millisecond of VPU time."""
    ins = refs[:nops]
    outs = refs[nops:]
    L = length
    iota = jax.lax.broadcasted_iota(jnp.int32, (rows, L), 1)
    vs = [r[:] for r in ins] + [iota]          # original index rides last
    nstage = L.bit_length() - 1
    for k in range(1, nstage + 1):
        dirbit = (iota >> k) & 1
        for j in range(k - 1, -1, -1):
            d = 1 << j
            bit = (iota >> j) & 1
            take_max = (bit ^ dirbit) == 1
            partners = [
                jnp.where(
                    bit == 1,
                    pltpu.roll(v, d, axis=1),
                    pltpu.roll(v, L - d, axis=1),
                )
                for v in vs
            ]
            # partner < self on (key_0..key_{nk-1}, original index)
            less = None
            eq = None
            for i in list(range(num_keys)) + [nops]:
                li = partners[i] < vs[i]
                if less is None:
                    less, eq = li, partners[i] == vs[i]
                else:
                    less = less | (eq & li)
                    if i != nops:
                        eq = eq & (partners[i] == vs[i])
            vs = [
                jnp.where(
                    take_max,
                    jnp.where(less, v, p),     # hi
                    jnp.where(less, p, v),     # lo
                )
                for v, p in zip(vs, partners)
            ]
    for o, v in zip(outs, vs[:nops]):
        o[:] = v


@functools.partial(
    jax.jit, static_argnames=("num_keys", "topk", "interpret")
)
def lex_rank_rows(ops, num_keys: int, topk: int, interpret: bool = False):
    """Sort each row of the (Q, M) int32 operand tuple ascending-
    lexicographically by the first num_keys operands (original position
    breaks full-key ties, i.e. stable-sort semantics) and return the
    first topk columns of every operand. Pad columns hold PAD in every
    operand, so they sort last. topk clamps to M — the lax.sort path a
    caller may substitute slices [:, :topk] of M-wide arrays, which
    clamps implicitly; without this the kernel path would return extra
    PAD columns for topk > M and the two paths would diverge in shape."""
    Q, M = ops[0].shape
    topk = min(topk, M)
    nops = len(ops)
    L = 1 << max(M - 1, 1).bit_length()
    if L < _LANES:
        L = _LANES
    rows = max(8, min(256, (1 << 20) // (L * 4 * (nops + 1)) // 8 * 8))
    Qp = -(-Q // rows) * rows
    padded = []
    for op in ops:
        xp = jnp.full((Qp, L), PAD, jnp.int32)
        padded.append(
            jax.lax.dynamic_update_slice(xp, op.astype(jnp.int32), (0, 0))
        )
    outs = pl.pallas_call(
        functools.partial(
            _lex_rank_kernel, rows=rows, length=L, num_keys=num_keys,
            nops=nops,
        ),
        grid=(Qp // rows,),
        in_specs=[
            pl.BlockSpec((rows, L), lambda g: (g, 0), memory_space=pltpu.VMEM)
        ] * nops,
        out_specs=[
            pl.BlockSpec((rows, L), lambda g: (g, 0), memory_space=pltpu.VMEM)
        ] * nops,
        out_shape=[jax.ShapeDtypeStruct((Qp, L), jnp.int32)] * nops,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # long-read rows (L = 32k+) exceed the default 16 MB scoped-
            # vmem accounting even at the minimum 8-row block (Mosaic
            # keeps ~20 block-sized temporaries live across the unrolled
            # passes); v5e has 128 MB physical VMEM.
            vmem_limit_bytes=96 << 20,
        ),
        interpret=interpret,
    )(*padded)
    return tuple(o[:Q, :topk] for o in outs)


def _plan(Q, M, presorted_run):
    run = max(presorted_run, 1)
    if run & (run - 1) or (run > 1 and M % run):
        raise ValueError(f"presorted_run={presorted_run} invalid for M={M}")
    L = 1 << max(M - 1, 1).bit_length()
    if L < _LANES:
        L = _LANES
    # block rows: keep the block <= 1 MB (Mosaic scoped-vmem accounting
    # charges in+out, their grid double-buffers, and the loop carry)
    rows = max(8, min(256, (1 << 20) // (L * 4) // 8 * 8))
    Qp = -(-Q // rows) * rows
    return run, L, rows, Qp


@functools.partial(
    jax.jit, static_argnames=("ncand", "min_votes", "presorted_run",
                              "interpret")
)
def sort_vote_rank_rows(
    x: jnp.ndarray, ncand: int, min_votes: int, presorted_run: int = 0,
    interpret: bool = False,
):
    """Fused sort + run-length vote + top-ncand per row of an (Q, M)
    int32 key array (invalid keys >= BIG). Returns (top_keys, top_votes),
    each (Q, ncand) int32, bit-identical to
    jax.vmap(candidates._per_query)(sort_rows(x)) with smooth=False,
    chain_gamma=0. Requires 2 * log2(L) + 1 <= 31 for the packed top-k
    (caller falls back to the XLA rank path otherwise)."""
    Q, M = x.shape
    run, L, rows, Qp = _plan(Q, M, presorted_run)
    if 2 * L.bit_length() > 31:
        raise ValueError(f"row length {L} overflows packed in-kernel top-k")
    if ncand > _LANES:
        # the kernel writes top candidates into fixed (rows, _LANES) lanes;
        # more would silently truncate (callers fall back to _per_query)
        raise ValueError(f"ncand={ncand} exceeds kernel lane width {_LANES}")
    xp = jnp.full((Qp, L), PAD, jnp.int32)
    xp = jax.lax.dynamic_update_slice(xp, x.astype(jnp.int32), (0, 0))
    nstage = L.bit_length() - 1
    first = min(run.bit_length(), nstage + 1)
    ko, vo = pl.pallas_call(
        functools.partial(
            _sort_vote_kernel, rows=rows, length=L, first=first,
            ncand=ncand, min_votes=min_votes,
        ),
        grid=(Qp // rows,),
        in_specs=[
            pl.BlockSpec((rows, L), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rows, _LANES), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ] * 2,
        out_shape=[jax.ShapeDtypeStruct((Qp, _LANES), jnp.int32)] * 2,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # long-read rows (L = 32k+) exceed the default 16 MB scoped-
            # vmem accounting even at the minimum 8-row block (Mosaic
            # keeps ~20 block-sized temporaries live across the unrolled
            # passes); v5e has 128 MB physical VMEM.
            vmem_limit_bytes=96 << 20,
        ),
        interpret=interpret,
    )(xp)
    return ko[:Q, :ncand], vo[:Q, :ncand]


@functools.partial(
    jax.jit, static_argnames=("ncand", "min_votes", "interpret")
)
def merge_vote_rank_rows(
    a: jnp.ndarray, b: jnp.ndarray, ncand: int, min_votes: int,
    interpret: bool = False,
):
    """Fused vote+rank over the UNION of two row-sorted key arrays —
    the top half of the split-sort propose path (r05, PROFILE_r05:
    the monolithic sort+vote kernel was 49% of the batch step, and
    28% of its passes were spent re-merging the power-of-two padding).

    a: (Q, La) rows sorted ascending, La a power of two >= 128;
    b: (Q, Mb) rows sorted ascending, Mb <= La.

    Assembles the bitonic row [a | PAD | flip(b)] (ascending then
    descending — a valid bitonic sequence) and runs ONLY the final
    bitonic merge stage (log2(2*La) passes) before the in-kernel
    run-length vote + top-ncand. Bit-identical to
    sort_vote_rank_rows(concat([a_raw, b_raw])) for any inputs whose
    sorts these are: integer sort output is unique, so the merged row
    equals the full sort of the concatenation."""
    Q, La = a.shape
    Mb = b.shape[1]
    if Mb > La or La & (La - 1) or La < _LANES:
        raise ValueError(f"merge needs pow2 La >= {_LANES} >= Mb; "
                         f"got La={La} Mb={Mb}")
    L = 2 * La
    if 2 * L.bit_length() > 31:
        raise ValueError(f"row length {L} overflows packed in-kernel top-k")
    if ncand > _LANES:
        raise ValueError(f"ncand={ncand} exceeds kernel lane width {_LANES}")
    assembled = jnp.concatenate([
        a.astype(jnp.int32),
        jnp.full((Q, La - Mb), PAD, jnp.int32),
        jnp.flip(b.astype(jnp.int32), axis=1),
    ], axis=1)
    rows = max(8, min(256, (1 << 20) // (L * 4) // 8 * 8))
    Qp = -(-Q // rows) * rows
    if Qp != Q:
        assembled = jnp.concatenate([
            assembled, jnp.full((Qp - Q, L), PAD, jnp.int32)
        ])
    nstage = L.bit_length() - 1
    ko, vo = pl.pallas_call(
        functools.partial(
            _sort_vote_kernel, rows=rows, length=L, first=nstage,
            ncand=ncand, min_votes=min_votes,
        ),
        grid=(Qp // rows,),
        in_specs=[
            pl.BlockSpec((rows, L), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rows, _LANES), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ] * 2,
        out_shape=[jax.ShapeDtypeStruct((Qp, _LANES), jnp.int32)] * 2,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=96 << 20,
        ),
        interpret=interpret,
    )(assembled)
    return ko[:Q, :ncand], vo[:Q, :ncand]


@functools.partial(
    jax.jit, static_argnames=("presorted_run", "interpret")
)
def sort_rows(
    x: jnp.ndarray, presorted_run: int = 0, interpret: bool = False
) -> jnp.ndarray:
    """Ascending sort of each row of an (Q, M) int32 array.

    Bit-identical to jnp.sort(x, axis=1) (integer sort is unique), at VPU
    rather than XLA-sort speed. Q is padded to the block row count and M
    to the next power of two internally.

    presorted_run = 2^p > 1: the caller guarantees each aligned 2^p block
    of every row is already sorted ASCENDING for even block index and
    DESCENDING for odd (exactly the state after bitonic stage p), so the
    network starts at stage p+1 — for runs of 64 that skips 21 of the 78
    passes of a 4096-wide sort. M must be a multiple of the run (the PAD
    tail is constant, hence sorted in either direction).
    """
    Q, M = x.shape
    run = max(presorted_run, 1)
    if run & (run - 1) or (run > 1 and M % run):
        raise ValueError(f"presorted_run={presorted_run} invalid for M={M}")
    L = 1 << max(M - 1, 1).bit_length()
    if L < _LANES:
        L = _LANES
    # block rows: keep the block <= 1 MB (Mosaic scoped-vmem accounting
    # charges in+out, their grid double-buffers, and the loop carry)
    rows = max(8, min(256, (1 << 20) // (L * 4) // 8 * 8))
    Qp = -(-Q // rows) * rows
    xp = jnp.full((Qp, L), PAD, jnp.int32)
    xp = jax.lax.dynamic_update_slice(xp, x.astype(jnp.int32), (0, 0))
    nstage = L.bit_length() - 1
    first = run.bit_length()  # == p + 1
    if first > nstage:
        # the run covers the whole (power-of-two) row: already sorted
        return xp[:Q, :M]
    out = pl.pallas_call(
        functools.partial(_sort_kernel, rows=rows, length=L, first=first),
        grid=(Qp // rows,),
        in_specs=[
            pl.BlockSpec((rows, L), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (rows, L), lambda g: (g, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Qp, L), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # long-read rows (L = 32k+) exceed the default 16 MB scoped-
            # vmem accounting even at the minimum 8-row block (Mosaic
            # keeps ~20 block-sized temporaries live across the unrolled
            # passes); v5e has 128 MB physical VMEM.
            vmem_limit_bytes=96 << 20,
        ),
        interpret=interpret,
    )(xp)
    return out[:Q, :M]
