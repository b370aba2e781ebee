"""Fused-scoring anti-diagonal wavefront banded SW — substitution scores are
computed INSIDE the kernel from raw query/window codes.

Reference equivalent: GHOSTM's CUDA SW kernel (SURVEY.md §2, §3.5). The
round-1 pipeline precomputed a (N, Lq, B) substitution-score tensor in HBM
via a one-hot einsum (~96 VPU ops/cell), skewed it for the wavefront layout
(kernels/sw_wave.skew_tiles) and transposed it into lane-blocks — prep that
ran the fused step at ~8 GCUPS while the DP kernel alone ran ~27
(VERDICT.md "weak #1"). This kernel removes the score tensor entirely; its
only inputs are the transposed query codes (Lq ints/alignment) and window
codes (Lq + B ints/alignment):

  * PROFILE WORDS (in-kernel, per 8-step group): for query code q, the 32
    substitution scores matrix[q, :] live in four int32 words of 8 NIBBLES
    (value + 4 in [0, 15]; BLOSUM62 values span [-4, 11]), baked into the
    kernel as 128 scalar constants (build_packed_matrix). A group's 8 query
    rows select their words with a 5-level binary select tree on the code
    bits — 31 vector selects per word over a full (8, W) register, ~0.5
    elem-ops/cell. Rows whose matrix row is LOW (stop '*', sentinel, pad)
    select all-zero words — the row-validity marker.
  * NIBBLE EXTRACTION (per cell, no gather): score = ((word >> ((w & 7)
    * 4)) & 15) - 4, the word picked from the four profile planes by w >> 3
    with two nested vector selects. TPU Mosaic has no vector gather, but
    elementwise variable shifts are native VPU ops — the lookup table rides
    in the shifted word.
  * MASK FOLDING (host/XLA): window positions outside the candidate's
    subject span [rel_lo, rel_hi) are rewritten to code 31 BEFORE the
    kernel, so the single in-kernel test `w < code_limit` covers sentinel /
    pad / hard-stop residues AND the positional span mask — no per-cell
    position arithmetic. Bit-identical to sw_xla.banded_scores_i8 masking.
  * WAVEFRONT STATE (same staggered diagonal-pair recurrence as
    kernels/sw_wave.py): both halves of step `a` read query row a - m, with
    windows w[a + m] (even diagonals 2m) and w[a + m + 1] (odd). The query
    profile slab advances by one sublane roll + row insert per step; the
    window slab rolls once BETWEEN the half-steps, serving the even half
    before and the odd half (and the next step's even half) after. Query
    and window insert rows stream through VMEM in sublane-ALIGNED groups of
    UNROLL=8 steps (one aligned load per group, static row picks inside).

Cell values and the endpoint contract (max score, min i, min b) are
bit-identical to ghostm_tpu.oracle.sw_banded / kernels/sw_xla.py; tests
assert integer equality against the reference path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ghostm_tpu.kernels.sw_xla import _finalize
from ghostm_tpu.ops.scoring import LOW

NEG = -(1 << 30)
LANES = 128
MASK_CODE = 31  # window code for positionally-masked cells (>= code_limit)
# Lane-block width: the fused kernel carries ~11 (h, W) state planes in
# its loop; modest widths keep a band-32 state set near the register
# file. On-chip slope-timed sweep (TUNE_r03b.json): W=128 890 us/call,
# W=256 1030 us at config-2 shapes -> 128.
DEFAULT_WIDTH = 128
# independent problem slices interleaved per kernel instance. The r03
# slope-timed sweep shows the kernel is THROUGHPUT-bound, not
# latency-bound: il=4 is ~12% SLOWER than il=1 at W=128 (more live state,
# same issue slots), so interleaving stays off. (r02's chained-dispatch
# sweep that motivated it was measuring the ~4 ms tunnel floor, not the
# kernel — docs/DESIGN.md r03 measurement notes.)
DEFAULT_INTERLEAVE = 1
UNROLL = 8
NIBBLE_BIAS = 4  # packed nibble = score + 4; BLOSUM62 scores are in [-4, 11]


def fused_ok(Lq: int, band: int) -> bool:
    """True when this kernel's packed best-tracking covers (Lq, band) —
    the engine and align_shard share this predicate (chunk sizing must
    agree with the kernel choice)."""
    if band % 2 or band < 16:
        return False
    h = band // 2
    A = Lq + h - 1
    at = -(-(A if A <= 256 else 128) // UNROLL) * UNROLL
    SH = int(-(-A // at) * at + 2 * h).bit_length()
    return 15 * Lq < (1 << (31 - SH))


def build_packed_matrix(matrix: np.ndarray) -> Tuple[tuple, int]:
    """(32, 32) int32 padded scoring table -> ((32, 4) nibble-word tuple,
    code_limit).

    Row q's 32 scores become 4 int32 words of 8 nibbles (score + 4). LOW
    rows (stop/sentinel/pad under the engine's hard-stop matrix) pack to
    zero words — the kernel's row-validity marker (asserted distinct from
    every valid row's word0). code_limit is the first LOW *column*: window
    codes >= it are masked in-kernel. Returned as a hashable tuple-of-
    tuples so it can be a static jit argument baked into the kernel.
    """
    m = np.asarray(matrix, np.int64)
    assert m.shape == (32, 32)
    row_valid = ~(m <= LOW).all(axis=1)
    col_valid = ~(m <= LOW).all(axis=0)
    code_limit = int(np.nonzero(~col_valid)[0][0]) if (~col_valid).any() else 32
    assert col_valid[:code_limit].all(), "valid codes must be contiguous from 0"
    nib = np.where(m <= LOW, 0, m + NIBBLE_BIAS)
    nib = np.where(row_valid[:, None] & col_valid[None, :], nib, 0)
    if not ((nib >= 0) & (nib <= 15) | ~row_valid[:, None]).all():
        # matrix values outside the nibble range [-4, 11] (e.g. BLOSUM50's
        # [-5, 15], PAM30's [-17, 13]) cannot ride the 4-bit profile
        # words — signal the engine to use the score-fed kernels, which
        # take any int matrix, instead of failing at init.
        return None, code_limit
    words = np.zeros((32, 4), np.int64)
    for k in range(4):
        for s in range(8):
            words[:, k] |= nib[:, k * 8 + s] << (4 * s)
    words[~row_valid] = 0
    assert (words[row_valid, 0] != 0).all(), (
        "a valid matrix row packed word0 == 0 — row-validity marker broken"
    )
    # int32 two's-complement for in-kernel constants
    w32 = ((words + (1 << 31)) % (1 << 32) - (1 << 31)).astype(np.int64)
    return tuple(tuple(int(v) for v in row) for row in w32), code_limit


def _fused_kernel(
    qrow_ref,   # (1, IL, ATILE, W) int32 query codes, row a entered at step a
    wins_ref,   # (1, IL, ATILE, W) int32 window-code insert rows w[a + h]
    whead_ref,  # (1, IL, h, W) int32 initial window slab w[0..h-1]
    pe_ref, po_ref,                 # (1, IL, h, W) packed (H << SH | inv)
    He_s, Ho_s, Eo_s, Fo_s, pe_s, po_s, W_s, P0_s, P1_s, P2_s, P3_s,
    *,
    atile: int,
    band: int,
    go1: int,
    ge: int,
    n_a_tiles: int,
    width: int,
    pack_shift: int,
    code_limit: int,
    words: tuple,   # (32, 4) nibble-word constants
    il: int,        # interleaved independent problems per instance
):
    h = band // 2
    W = width
    SH = pack_shift
    at = pl.program_id(1)
    m_iota = jax.lax.broadcasted_iota(jnp.int32, (h, W), 0)
    negv = jnp.full((il, h, W), NEG, jnp.int32)
    negrow = jnp.full((1, W), NEG, jnp.int32)

    @pl.when(at == 0)
    def _():
        He_s[:] = jnp.zeros((il, h, W), jnp.int32)
        Ho_s[:] = jnp.zeros((il, h, W), jnp.int32)
        Eo_s[:] = negv
        Fo_s[:] = negv
        pe_s[:] = jnp.zeros((il, h, W), jnp.int32)
        po_s[:] = jnp.zeros((il, h, W), jnp.int32)
        W_s[:] = whead_ref[0]
        # zero profile slab = "row not yet entered" (masked like LOW rows)
        P0_s[:] = jnp.zeros((il, h, W), jnp.int32)
        P1_s[:] = jnp.zeros((il, h, W), jnp.int32)
        P2_s[:] = jnp.zeros((il, h, W), jnp.int32)
        P3_s[:] = jnp.zeros((il, h, W), jnp.int32)

    def qwords(q8):
        """(8, W) query codes -> four (8, W) profile word planes via a
        5-level binary select tree over the 32 baked word constants."""
        bits = [((q8 >> lvl) & 1) == 1 for lvl in range(5)]
        planes = []
        for k in range(4):
            cur = [jnp.int32(words[c][k]) for c in range(32)]
            for lvl in range(5):
                cur = [
                    jnp.where(bits[lvl], cur[2 * i + 1], cur[2 * i])
                    for i in range(len(cur) // 2)
                ]
            planes.append(cur[0])
        return planes

    def extract(P0, P1, P2, P3, wv, qok):
        """Per-cell profile-word lookup: s[m, lane] =
        matrix[qrow, wv[m, lane]], NEG when masked (invalid query row, or
        window code >= code_limit — includes host-folded span masking)."""
        ws = (wv & 7) << 2
        sel = jnp.where(
            (wv & 16) != 0,
            jnp.where((wv & 8) != 0, P3, P2),
            jnp.where((wv & 8) != 0, P1, P0),
        )
        val = ((sel >> ws) & 15) - NIBBLE_BIAS
        ok = qok & (wv < code_limit)
        return jnp.where(ok, val, NEG)

    def one(u, Q8, wi8, carry):
        He, Ho, Eo, Fo, pe, po, Wv, P0, P1, P2, P3, inv = carry
        # enter query row a: profile slab rolls down one sublane
        ins = lambda P, w8: jnp.where(
            m_iota == 0, w8[u : u + 1], pltpu.roll(P, 1, axis=0)
        )
        P0, P1, P2, P3 = (
            ins(P0, Q8[0]), ins(P1, Q8[1]), ins(P2, Q8[2]), ins(P3, Q8[3])
        )
        qok = P0 != 0
        # even half-step (diagonals 2m at row a - m, window w[a + m])
        se = extract(P0, P1, P2, P3, Wv, qok)
        Hogo = Ho - go1
        Ee = jnp.concatenate(
            [negrow, jnp.maximum(Hogo, Eo - ge)[:-1]], axis=0
        )
        Fe = jnp.maximum(Hogo, Fo - ge)
        He = jnp.maximum(jnp.maximum(He + se, 0), jnp.maximum(Ee, Fe))
        pe = jnp.maximum(pe, (He << SH) | inv)
        # window slab advances between the halves: odd reads w[a + m + 1],
        # which is exactly the next step's even slab
        Wv = jnp.where(
            m_iota == h - 1, wi8[u : u + 1], pltpu.roll(Wv, h - 1, axis=0)
        )
        # odd half-step (diagonals 2m+1 at row a - m, reads the evens)
        so = extract(P0, P1, P2, P3, Wv, qok)
        Hego = He - go1
        Eo = jnp.maximum(Hego, Ee - ge)
        Fo = jnp.concatenate(
            [jnp.maximum(Hego, Fe - ge)[1:], negrow], axis=0
        )
        Ho = jnp.maximum(jnp.maximum(Ho + so, 0), jnp.maximum(Eo, Fo))
        po = jnp.maximum(po, (Ho << SH) | inv)
        return He, Ho, Eo, Fo, pe, po, Wv, P0, P1, P2, P3

    a0 = at * atile
    inv0 = ((1 << SH) - 1) - (a0 - m_iota) - h

    def body(t, carry):
        # one sublane-aligned load per UNROLL-step group; profile words for
        # the whole group are computed on full (UNROLL, W) registers.
        # The il problems are INDEPENDENT: interleaving their steps gives
        # the scheduler il dependency-free chains per issue slot.
        states, inv = carry
        Q8s, wi8s = [], []
        for i in range(il):
            q8 = qrow_ref[0, i, pl.ds(t * UNROLL, UNROLL)]   # (UNROLL, W)
            wi8s.append(wins_ref[0, i, pl.ds(t * UNROLL, UNROLL)])
            Q8s.append(qwords(q8))
        for u in range(UNROLL):
            states = tuple(
                one(u, Q8s[i], wi8s[i], states[i] + (inv,))[:11]
                for i in range(il)
            )
            inv = inv - 1
        return states, inv

    init_states = tuple(
        (He_s[i], Ho_s[i], Eo_s[i], Fo_s[i], pe_s[i], po_s[i], W_s[i],
         P0_s[i], P1_s[i], P2_s[i], P3_s[i])
        for i in range(il)
    )
    states, _ = jax.lax.fori_loop(
        0, atile // UNROLL, body, (init_states, inv0)
    )
    for i in range(il):
        (He_s[i], Ho_s[i], Eo_s[i], Fo_s[i], pe_s[i], po_s[i], W_s[i],
         P0_s[i], P1_s[i], P2_s[i], P3_s[i]) = states[i]

    @pl.when(at == n_a_tiles - 1)
    def _():
        pe_ref[0] = pe_s[:]
        po_ref[0] = po_s[:]


@functools.partial(
    jax.jit,
    static_argnames=(
        "packed_words", "gap_open", "gap_extend", "band", "code_limit",
        "a_tile", "lane_width", "interleave", "interpret",
    ),
)
def sw_fused_wave(
    qcodes: jnp.ndarray,        # (N, Lq) int8/int32 query codes
    windows: jnp.ndarray,       # (N, Lq + B) int8/int32 window codes
    packed_words: tuple,        # (32, 4) tuple from build_packed_matrix
    rel_lo: jnp.ndarray,        # (N,) int32: lo - g0 (subject span, window-local)
    rel_hi: jnp.ndarray,        # (N,) int32: hi - g0
    gap_open: int,
    gap_extend: int,
    band: int,
    code_limit: int = 23,
    a_tile: int = 0,
    lane_width: int = 0,
    interleave: int = 0,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched banded SW, scores fused in-kernel.

    Bit-identical to
    sw_wave.sw_banded_wave(sw_xla.banded_scores_i8(qcodes, windows, ...))
    (same endpoint contract: max score, min i, min b; (-1, -1) when 0).
    N must be a multiple of 128; B even, >= 16.
    """
    N, Lq = qcodes.shape
    B = band
    if B % 2 or B < 16:
        raise ValueError("fused wavefront kernel needs an even band >= 16")
    if N % LANES:
        raise ValueError(f"N={N} must be a multiple of {LANES}")
    if windows.shape[1] < Lq + B:
        raise ValueError("windows must cover Lq + band columns")
    h = B // 2
    A = Lq + h - 1
    atile = a_tile or (A if A <= 256 else 128)
    atile = -(-atile // UNROLL) * UNROLL
    Ap = -(-A // atile) * atile
    SH = int(Ap + 2 * h).bit_length()
    if 15 * Lq >= (1 << (31 - SH)):
        raise ValueError(
            f"Lq={Lq} too long for packed best-tracking (SH={SH}); "
            "use sw_banded_pallas"
        )
    W = lane_width or DEFAULT_WIDTH
    while W > LANES and N % W:
        W //= 2
    G = N // W
    AT = Ap // atile

    # fold the subject-span mask into the window codes (see module doc)
    jpos = jnp.arange(windows.shape[1], dtype=jnp.int32)[None, :]
    w32 = jnp.where(
        (jpos >= rel_lo.astype(jnp.int32)[:, None])
        & (jpos < rel_hi.astype(jnp.int32)[:, None]),
        windows.astype(jnp.int32),
        MASK_CODE,
    )
    # query rows padded to Ap with the masked code (LOW row -> zero words)
    qpad = jnp.pad(
        qcodes.astype(jnp.int32), ((0, 0), (0, Ap - Lq)),
        constant_values=MASK_CODE,
    )
    qrow_t = jnp.transpose(qpad.reshape(G, W, Ap), (0, 2, 1))
    wins = w32[:, h : h + Ap] if w32.shape[1] >= h + Ap else jnp.pad(
        w32[:, h:], ((0, 0), (0, h + Ap - w32.shape[1])),
        constant_values=MASK_CODE,
    )
    wins_t = jnp.transpose(wins.reshape(G, W, Ap), (0, 2, 1))
    whead_t = jnp.transpose(w32[:, :h].reshape(G, W, h), (0, 2, 1))

    pe, po = kernel_call(
        qrow_t, wins_t, whead_t, packed_words,
        band=B, gap_open=gap_open, gap_extend=gap_extend, atile=atile,
        pack_shift=SH, code_limit=code_limit, cells=N * Lq * B,
        interleave=interleave, interpret=interpret,
    )
    pk = jnp.stack([pe, po], axis=2).reshape(G, B, W)
    pk = jnp.moveaxis(pk, -1, 1).reshape(N, B)
    bH = pk >> SH
    bI = ((1 << SH) - 1) - (pk & ((1 << SH) - 1)) - h
    bI = jnp.where(bH > 0, bI, 0)
    return _finalize(bH, bI, B)


def kernel_call(
    qrow_t: jnp.ndarray,   # (G, Ap, W) int32 transposed query rows
    wins_t: jnp.ndarray,   # (G, Ap, W) int32 transposed window inserts
    whead_t: jnp.ndarray,  # (G, h, W) int32 initial window slab
    packed_words: tuple,
    *,
    band: int,
    gap_open: int,
    gap_extend: int,
    atile: int,
    pack_shift: int,
    code_limit: int,
    cells: int,
    interleave: int = 0,
    interpret: bool = False,
):
    """The bare pallas_call on pre-prepped tensors — exposed so bench.py
    can measure the DP kernel proper (the BASELINE roofline target)
    separately from the XLA-side prep."""
    G, Ap, W = qrow_t.shape
    h = band // 2
    AT = Ap // atile
    il = interleave or DEFAULT_INTERLEAVE
    while il > 1 and G % il:
        il //= 2
    G2 = G // il
    r4 = lambda x: x.reshape(G2, il, *x.shape[1:])
    kernel = functools.partial(
        _fused_kernel,
        atile=atile,
        band=band,
        go1=gap_open + gap_extend,
        ge=gap_extend,
        n_a_tiles=AT,
        width=W,
        pack_shift=pack_shift,
        code_limit=code_limit,
        words=packed_words,
        il=il,
    )
    out_spec = pl.BlockSpec((1, il, h, W), lambda g, at: (g, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    pe, po = pl.pallas_call(
        kernel,
        grid=(G2, AT),
        in_specs=[
            pl.BlockSpec((1, il, atile, W), lambda g, at: (g, 0, at, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, il, atile, W), lambda g, at: (g, 0, at, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, il, h, W), lambda g, at: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec] * 2,
        out_shape=[jax.ShapeDtypeStruct((G2, il, h, W), jnp.int32)] * 2,
        scratch_shapes=[pltpu.VMEM((il, h, W), jnp.int32)] * 11,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=36 * cells,
            bytes_accessed=G * W * (Ap * 8 + h * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(r4(qrow_t), r4(wins_t), r4(whead_t))
    return pe.reshape(G, h, W), po.reshape(G, h, W)
