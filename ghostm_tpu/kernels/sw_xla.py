"""Banded Smith-Waterman in pure XLA (lax.scan) + traceback support.

Same cell semantics and tie-breaks as ghostm_tpu.oracle.sw_banded (see its
module docstring for the contract). Three uses:
  1. CPU/interpret-mode reference for the Pallas kernel (tests);
  2. the FINAL-HIT path: `sw_banded_moves` records per-cell traceback moves
     so the engine can recover start coordinates and alignment statistics
     (identities/gaps) for the few reported hits — the reference recomputes
     this per hit too (SURVEY.md §1.1 step 5);
  3. fallback when Pallas is unavailable.

The in-row E dependency (gap-in-query) is resolved with an EXACT prefix
max-scan: E[b] = max_{b'<b}(Ht[b'] + b'*ge) - (open+ext) - (b-1)*ge, where Ht
is H computed without E. Opening a gap out of a gap-end cell is dominated
whenever open >= 0, so the scan over Ht is exact (Farrar/SWIPE-style row
scan re-derived for the skewed band layout).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

NEG = -(1 << 30)


def banded_scores(
    qcodes: jnp.ndarray, windows: jnp.ndarray, matrix: jnp.ndarray, band: int
) -> jnp.ndarray:
    """Precompute substitution scores for the skewed band.

    Args:
      qcodes: (N, Lq) int8/int32 query codes.
      windows: (N, Lq + band) int8/int32 subject buffer slices starting at g0.
      matrix: (32, 32) int32 padded scoring table.
    Returns:
      (N, Lq, band) int32 with sc[n, i, b] = matrix[q[n,i], windows[n, i+b]].

    TPU-native formulation: random gathers are catastrophically slow on TPU
    (measured 1.5 s for 84M cells), so both lookups become ONE-HOT
    CONTRACTIONS that XLA fuses onto the MXU/VPU:
      profile:  mq = onehot(q) @ matrix          (exact: one 1.0 per row)
      scores:   sc[n,i,b] = sum_a onehot(t)[n,i,b,a] * mq[n,i,a]
    Every matrix entry (BLOSUM ints and LOW = -2^20, a power of two) is
    bf16-exact, each sum has exactly one non-zero term, and accumulation is
    f32 — the result is bit-identical to the gather.
    """
    Lq = qcodes.shape[1]
    a32 = jnp.arange(32, dtype=jnp.int32)
    ohq = (qcodes.astype(jnp.int32)[..., None] == a32).astype(jnp.bfloat16)
    mq = jax.lax.dot_general(
        ohq, matrix.astype(jnp.bfloat16),
        (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (N, Lq, 32)
    tc = jnp.stack(
        [windows[:, b : b + Lq] for b in range(band)], axis=-1
    ).astype(jnp.int32)  # (N, Lq, band)
    oht = (tc[..., None] == a32).astype(jnp.float32)  # (N, Lq, B, 32)
    sc = jnp.einsum(
        "niba,nia->nib", oht, mq, preferred_element_type=jnp.float32
    )
    return sc.astype(jnp.int32)


MASKED_I8 = -128  # int8 sentinel meaning "hard-masked cell" (widens to NEG)


def banded_scores_i8(
    qcodes: jnp.ndarray,
    windows: jnp.ndarray,
    matrix: jnp.ndarray,
    band: int,
    g0: jnp.ndarray,    # (N,) window starts (global buffer coords)
    lo: jnp.ndarray,    # (N,) subject span start (inclusive)
    hi: jnp.ndarray,    # (N,) subject span end (exclusive)
) -> jnp.ndarray:
    """banded_scores + subject-span masking, packed to int8 tiles.

    Cells outside [lo, hi) (sentinels, neighbouring subjects) and cells
    whose matrix entry is LOW (stop/pad/sentinel residues) become
    MASKED_I8; everything else is a raw BLOSUM value (|v| <= 11). The SW
    kernels widen MASKED_I8 back to their -2^30 NEG, so the DP sees
    BIT-IDENTICAL values to the int32 path — at 1/4 the HBM traffic for
    the score tensor, which dominates the fused step (docs/DESIGN.md).
    """
    Lq = qcodes.shape[1]
    sc = banded_scores(qcodes, windows, matrix, band)
    iota_ib = (
        jnp.arange(Lq, dtype=jnp.int32)[:, None]
        + jnp.arange(band, dtype=jnp.int32)[None, :]
    )
    j = g0[:, None, None] + iota_ib[None]
    inb = (j >= lo[:, None, None]) & (j < hi[:, None, None])
    keep = inb & (sc > -100)
    return jnp.where(keep, jnp.clip(sc, -100, 127), MASKED_I8).astype(jnp.int8)


def widen_scores(s):
    """int8 masked tile -> int32 DP scores (MASKED_I8 -> NEG); int32 passes
    through unchanged."""
    if s.dtype == jnp.int8:
        return jnp.where(s == MASKED_I8, NEG, s.astype(jnp.int32))
    return s.astype(jnp.int32)


def _row_step(go1, ge, bext, cvec, carry, s):
    H, F, bestH, bestI, i = carry
    shl = lambda x: jnp.concatenate(
        [x[:, 1:], jnp.full_like(x[:, :1], NEG)], axis=1
    )
    Fn = jnp.maximum(shl(H) - go1, shl(F) - ge)
    Ht = jnp.maximum(jnp.maximum(H + s, Fn), 0)
    T = Ht + bext
    ic = lax.cummax(T, axis=1)
    P = jnp.concatenate([jnp.full_like(ic[:, :1], NEG), ic[:, :-1]], axis=1)
    E = P - cvec
    Hn = jnp.maximum(Ht, E)
    better = Hn > bestH
    bestH = jnp.where(better, Hn, bestH)
    bestI = jnp.where(better, i, bestI)
    return (Hn, Fn, bestH, bestI, i + 1), None


def _finalize(bestH, bestI, band):
    """Reduce (N, B) per-diagonal bests to (score, i_end, b_end) with the
    contract tie-break: max score, then min i, then min b."""
    N, B = bestH.shape
    big = jnp.int32(1 << 30)
    score = jnp.max(bestH, axis=1)
    m1 = bestH == score[:, None]
    i_end = jnp.min(jnp.where(m1, bestI, big), axis=1)
    m2 = m1 & (bestI == i_end[:, None])
    barange = jnp.arange(B, dtype=jnp.int32)[None, :]
    b_end = jnp.min(jnp.where(m2, barange, big), axis=1)
    empty = score <= 0
    i_end = jnp.where(empty, -1, i_end)
    b_end = jnp.where(empty, -1, b_end)
    return score, i_end.astype(jnp.int32), b_end.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("gap_open", "gap_extend"))
def sw_banded(
    sc: jnp.ndarray, gap_open: int, gap_extend: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched banded SW over precomputed scores.

    Args: sc (N, Lq, B) int32 or int8 masked tiles. Returns
    (score, i_end, b_end), each (N,) int32.
    """
    sc = widen_scores(sc)
    N, Lq, B = sc.shape
    go1 = jnp.int32(gap_open + gap_extend)
    ge = jnp.int32(gap_extend)
    bext = (jnp.arange(B, dtype=jnp.int32) * ge)[None, :]
    cvec = (go1 + (jnp.arange(B, dtype=jnp.int32) - 1) * ge)[None, :]
    init = (
        jnp.zeros((N, B), jnp.int32),
        jnp.full((N, B), NEG, jnp.int32),
        jnp.zeros((N, B), jnp.int32),
        jnp.zeros((N, B), jnp.int32),
        jnp.int32(0),
    )
    step = functools.partial(_row_step, go1, ge, bext, cvec)
    (H, F, bestH, bestI, _), _ = lax.scan(step, init, jnp.moveaxis(sc, 1, 0))
    return _finalize(bestH, bestI, B)


# --- moves variant (final hits only) -------------------------------------
# Move encoding per cell, packed in one uint8:
#   bits 0-1: H choice — 0 stop(0), 1 diag, 2 E(left), 3 F(up)
#   bit  2:   E opened here (came from Ht[b-1]-go1) vs extended
#   bit  3:   F opened here (came from H[i-1,b+1]-go1) vs extended
# Tie priority for H: diag > E > F > stop (deterministic stats).


@functools.partial(jax.jit, static_argnames=("gap_open", "gap_extend"))
def sw_banded_moves(sc: jnp.ndarray, gap_open: int, gap_extend: int):
    N, Lq, B = sc.shape
    go1 = jnp.int32(gap_open + gap_extend)
    ge = jnp.int32(gap_extend)
    bext = (jnp.arange(B, dtype=jnp.int32) * ge)[None, :]
    cvec = (go1 + (jnp.arange(B, dtype=jnp.int32) - 1) * ge)[None, :]

    def step(carry, s):
        H, F, bestH, bestI, i = carry
        shl = lambda x: jnp.concatenate(
            [x[:, 1:], jnp.full_like(x[:, :1], NEG)], axis=1
        )
        f_open_src = shl(H) - go1
        f_ext_src = shl(F) - ge
        Fn = jnp.maximum(f_open_src, f_ext_src)
        f_open = f_open_src >= f_ext_src
        Ht = jnp.maximum(jnp.maximum(H + s, Fn), 0)
        T = Ht + bext
        ic = lax.cummax(T, axis=1)
        P = jnp.concatenate([jnp.full_like(ic[:, :1], NEG), ic[:, :-1]], axis=1)
        E = P - cvec
        Hn = jnp.maximum(Ht, E)
        # E origin: opened from the immediately-left final H, else extension.
        h_left = jnp.concatenate([jnp.full_like(Hn[:, :1], NEG), Hn[:, :-1]], axis=1)
        e_open = (h_left - go1) >= E
        diag_v = H + s
        hc = jnp.where(
            Hn == 0,
            0,
            jnp.where(diag_v == Hn, 1, jnp.where(E == Hn, 2, 3)),
        ).astype(jnp.uint8)
        mv = hc | (e_open.astype(jnp.uint8) << 2) | (f_open.astype(jnp.uint8) << 3)
        better = Hn > bestH
        bestH = jnp.where(better, Hn, bestH)
        bestI = jnp.where(better, i, bestI)
        return (Hn, Fn, bestH, bestI, i + 1), mv

    init = (
        jnp.zeros((N, B), jnp.int32),
        jnp.full((N, B), NEG, jnp.int32),
        jnp.zeros((N, B), jnp.int32),
        jnp.zeros((N, B), jnp.int32),
        jnp.int32(0),
    )
    (H, F, bestH, bestI, _), moves = lax.scan(step, init, jnp.moveaxis(sc, 1, 0))
    score, i_end, b_end = _finalize(bestH, bestI, B)
    return score, i_end, b_end, jnp.moveaxis(moves, 0, 1)  # (N, Lq, B)


@functools.partial(jax.jit, static_argnames=())
def traceback_stats_device(
    moves: jnp.ndarray,  # (n, Lq, B) uint8 — encoding above
    ie: jnp.ndarray,
    be: jnp.ndarray,
    qc: jnp.ndarray,     # (n, Lq) query codes
    w: jnp.ndarray,      # (n, Lq + B) window codes
):
    """Vectorised traceback walk ON DEVICE (mirrors report.traceback_stats;
    tests assert equality). Device-side matters operationally: fetching the
    full move matrices to the host costs ~50 MB/batch, the six stat vectors
    cost ~1 MB (SURVEY.md §3.3 — host boundary carries only small results).
    """
    n, Lq, B = moves.shape
    i = ie.astype(jnp.int32)
    b = be.astype(jnp.int32)
    alive = i >= 0
    st = jnp.where(alive, 0, 3).astype(jnp.int32)  # 0=H 1=E 2=F 3=done
    qstart = jnp.where(alive, i, -1)
    sstart = jnp.where(alive, i + b, -1)
    zeros = jnp.zeros(n, jnp.int32)
    # Pack the diagonal match-equality bit (q[i] == w[i+b]) into bit 4 of
    # each move byte so the walk needs ONE element lookup per step instead
    # of three (mv + qchar + schar). r04: the lookup is a masked-SUM over
    # the int8 move plane, not a gather — take_along_axis inside the
    # while_loop cost ~1.4 ms/step on v5e (gathers in loop bodies are
    # pessimized ~12x), while streaming the 50 MB int8 plane through a
    # fused compare+select+reduce costs ~65 us/step. Exactly one lane
    # matches (the row index is unique), so the sum IS the element —
    # bit-identical.
    w_sk = jnp.stack([w[:, d : d + Lq] for d in range(B)], axis=-1)
    eq_plane = (qc[:, :, None] == w_sk).astype(jnp.uint8)
    mvi = (moves | (eq_plane << 4)).reshape(n, Lq * B)
    lanes = jnp.arange(Lq * B, dtype=jnp.int32)[None, :]

    def body(state):
        i, b, st, qstart, sstart, length, matches, mismatch, gapopen = state
        ii = jnp.clip(i, 0, Lq - 1)
        bb = jnp.clip(b, 0, B - 1)
        mv = jnp.sum(
            jnp.where((ii * B + bb)[:, None] == lanes, mvi, 0).astype(
                jnp.int32
            ),
            axis=1,
        )
        inH = st == 0
        c = mv & 3
        stop = inH & ((c == 0) | (i < 0) | (b < 0) | (b >= B))
        diag = inH & ~stop & (c == 1)
        toE = inH & ~stop & (c == 2)
        toF = inH & ~stop & (c == 3)
        eq = ((mv >> 4) & 1).astype(jnp.bool_) & diag
        matches = matches + eq
        mismatch = mismatch + (diag & ~eq)
        length = length + diag
        qstart = jnp.where(diag, i, qstart)
        sstart = jnp.where(diag, i + b, sstart)
        i = jnp.where(diag, i - 1, i)
        st = jnp.where(stop, 3, st)
        st = jnp.where(toE, 1, st)
        st = jnp.where(toF, 2, st)
        inE = st == 1
        eopen = ((mv >> 2) & 1).astype(jnp.bool_)
        length = length + inE
        sstart = jnp.where(inE, i + b - 1, sstart)
        b = jnp.where(inE, b - 1, b)
        gapopen = gapopen + (inE & eopen)
        st = jnp.where(inE & eopen, 0, st)
        inF = st == 2
        fopen = ((mv >> 3) & 1).astype(jnp.bool_)
        length = length + inF
        qstart = jnp.where(inF, i, qstart)
        i = jnp.where(inF, i - 1, i)
        b = jnp.where(inF, b + 1, b)
        gapopen = gapopen + (inF & fopen)
        st = jnp.where(inF & fopen, 0, st)
        st = jnp.where((st == 0) & (i < 0), 3, st)
        return (i, b, st, qstart, sstart, length, matches, mismatch, gapopen)

    # while_loop with an all-done predicate: the iteration BOUND is
    # 2*(Lq+B)+4, but the longest live path in a typical batch is ~Lq
    # steps, so early exit cuts the walk ~3x. Finished rows are no-ops,
    # so results are bit-identical to the bounded fori_loop.
    init = (jnp.int32(0), (i, b, st, qstart, sstart, zeros, zeros, zeros,
                           zeros))
    bound = 2 * (Lq + B) + 4

    def cond(state):
        t, s = state
        return (t < bound) & jnp.any(s[2] < 3)

    _, (i, b, st, qstart, sstart, length, matches, mismatch, gapopen) = (
        lax.while_loop(cond, lambda s: (s[0] + 1, body(s[1])), init)
    )
    empty = ie < 0
    return {
        "qstart": jnp.where(empty, -1, qstart),
        "qend": jnp.where(empty, -1, ie),
        "sstart": jnp.where(empty, -1, sstart),
        "send": jnp.where(empty, -1, ie + be),
        "length": length, "matches": matches,
        "mismatch": mismatch, "gapopen": gapopen,
    }
