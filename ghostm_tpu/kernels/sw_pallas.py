"""Banded Smith-Waterman as a Pallas TPU kernel — the engine's hot loop.

Reference equivalent: GHOSTM's CUDA SW kernel, one GPU thread per alignment
(SURVEY.md §2 "Smith-Waterman kernel", §3.5: >90% of runtime). TPU-native
re-design rather than a translation:

  * LAYOUT — 128 alignments ride the 128-lane axis; the band (B diagonals)
    rides the sublane axis. Every DP step is a full (B, 128) VPU vector op;
    there is no per-alignment thread, divergence, or scalar loop.
  * ROW RECURRENCE — rows (query residues) advance sequentially; the in-row
    gap-in-query dependency is an EXACT log2(B)-step max prefix scan (see
    kernels/sw_xla.py docstring for the derivation). All state (H, F,
    running best) lives in VMEM scratch.
  * ROW TILING — the grid is (batch_tiles, row_tiles) with
    ("parallel", "arbitrary") semantics: H/F carry across row tiles in
    scratch, so 10 kbp long-read queries stream through VMEM block by block
    (SURVEY.md §5.7) while Pallas double-buffers the score-tile DMA.
  * SCORES — substitution scores are precomputed outside (one gather per
    cell, done by XLA) and arrive as int32 tiles; the kernel itself is pure
    add/max VPU work, which is what the roofline target counts
    (BASELINE.md "Measurement protocol").

Cell semantics and tie-breaks match ghostm_tpu.oracle.sw_banded exactly;
tests/test_sw_pallas.py checks integer equality against the oracle.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ghostm_tpu.kernels.sw_xla import MASKED_I8, _finalize

NEG = -(1 << 30)
LANES = 128
# Lane-block width: alignments processed per kernel instance. Multiples of
# 128 lanes amortise loop and instruction-issue overhead over more data per
# vector op (the DP itself is element-wise along lanes).
DEFAULT_WIDTH = 1024


def _shift_down(x, d, b_iota):
    """y[b] = x[b-d] for b >= d else NEG (shift toward higher b)."""
    return jnp.where(b_iota >= d, pltpu.roll(x, d, axis=0), NEG)


def _shift_up1(x, b_iota, B):
    """y[b] = x[b+1] for b < B-1 else NEG (roll shift must be >= 0)."""
    return jnp.where(b_iota < B - 1, pltpu.roll(x, B - 1, axis=0), NEG)


def _sw_kernel(
    sc_ref,  # (1, RTILE, B, W) int32 scores block
    bestH_ref,  # (1, B, W) int32
    bestI_ref,  # (1, B, W) int32
    H_scr,
    F_scr,
    bH_scr,
    bI_scr,
    *,
    rtile: int,
    band: int,
    go1: int,
    ge: int,
    n_row_tiles: int,
    width: int,
    is_i8: bool,
):
    B = band
    W = width
    rt = pl.program_id(1)
    b_iota = jax.lax.broadcasted_iota(jnp.int32, (B, W), 0)
    bext = b_iota * ge
    cvec = go1 + (b_iota - 1) * ge

    @pl.when(rt == 0)
    def _():
        H_scr[:] = jnp.zeros((B, W), jnp.int32)
        F_scr[:] = jnp.full((B, W), NEG, jnp.int32)
        bH_scr[:] = jnp.zeros((B, W), jnp.int32)
        bI_scr[:] = jnp.zeros((B, W), jnp.int32)

    def row(r, carry):
        H, F, bH, bI = carry
        s = sc_ref[0, r]
        if is_i8:
            # int8 masked tile -> int32 (MASKED_I8 means hard-masked cell);
            # widen BEFORE comparing — Mosaic lacks int8 vector cmpi.
            s = s.astype(jnp.int32)
            s = jnp.where(s == MASKED_I8, NEG, s)
        # F[b] = max(H[b+1] - go1, F[b+1] - ge): fuse into ONE shift of the
        # pre-maxed operand (shift is linear, max args share the shift).
        Fn = _shift_up1(jnp.maximum(H - go1, F - ge), b_iota, B)
        Ht = jnp.maximum(jnp.maximum(H + s, Fn), 0)
        # Exclusive max-prefix-scan of T over the band axis (Hillis-Steele).
        X = _shift_down(Ht + bext, 1, b_iota)
        d = 1
        while d < B:
            X = jnp.maximum(X, _shift_down(X, d, b_iota))
            d *= 2
        Hn = jnp.maximum(Ht, X - cvec)
        i_global = rt * rtile + r
        better = Hn > bH
        bH = jnp.where(better, Hn, bH)
        bI = jnp.where(better, i_global, bI)
        return Hn, Fn, bH, bI

    H, F, bH, bI = jax.lax.fori_loop(
        0, rtile, row, (H_scr[:], F_scr[:], bH_scr[:], bI_scr[:])
    )
    H_scr[:], F_scr[:], bH_scr[:], bI_scr[:] = H, F, bH, bI

    @pl.when(rt == n_row_tiles - 1)
    def _():
        bestH_ref[0] = bH_scr[:]
        bestI_ref[0] = bI_scr[:]


@functools.partial(
    jax.jit, static_argnames=("gap_open", "gap_extend", "row_tile", "interpret")
)
def sw_banded_pallas(
    sc: jnp.ndarray,
    gap_open: int,
    gap_extend: int,
    row_tile: int = 128,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched banded SW on precomputed scores.

    Args:
      sc: (N, Lq, B) int32 — N is padded to a multiple of 128, Lq to a
          multiple of `row_tile` (pad scores with NEG; padded rows/lanes
          simply produce 0-score alignments).
    Returns:
      (score, i_end, b_end) each (N,) int32, tie-broken per the oracle
      contract (max score, min i, min b; (-1, -1) when score == 0).

    `sc` may be int8 masked tiles (sw_xla.banded_scores_i8): 1/4 the DMA
    traffic; widened to the identical int32 values in-register.
    """
    N, Lq, B = sc.shape
    is_i8 = sc.dtype == jnp.int8
    if is_i8 and B % 32:
        raise ValueError("int8 score tiles need band % 32 == 0")
    esize = 1 if is_i8 else 4
    if N % LANES:
        raise ValueError(f"N={N} must be a multiple of {LANES}")
    rtile = min(row_tile, Lq)
    if Lq % rtile:
        raise ValueError(f"Lq={Lq} must be a multiple of row_tile={rtile}")
    W = LANES
    while W * 2 <= DEFAULT_WIDTH and N % (W * 2) == 0 and (
        rtile * B * W * 2 * esize <= 6 * 1024 * 1024
    ):
        W *= 2
    G = N // W
    RT = Lq // rtile
    # (N, Lq, B) -> (G, Lq, B, W): alignments ride lanes.
    sct = jnp.moveaxis(sc.reshape(G, W, Lq, B), 1, -1)
    kernel = functools.partial(
        _sw_kernel,
        rtile=rtile,
        band=B,
        go1=gap_open + gap_extend,
        ge=gap_extend,
        n_row_tiles=RT,
        width=W,
        is_i8=is_i8,
    )
    bestH, bestI = pl.pallas_call(
        kernel,
        grid=(G, RT),
        in_specs=[
            pl.BlockSpec(
                (1, rtile, B, W),
                lambda g, rt: (g, rt, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=[
            pl.BlockSpec((1, B, W), lambda g, rt: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, W), lambda g, rt: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, B, W), jnp.int32),
            jax.ShapeDtypeStruct((G, B, W), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, W), jnp.int32),
            pltpu.VMEM((B, W), jnp.int32),
            pltpu.VMEM((B, W), jnp.int32),
            pltpu.VMEM((B, W), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=30 * N * Lq * B, bytes_accessed=4 * N * Lq * B, transcendentals=0
        ),
        interpret=interpret,
    )(sct)
    # (G, B, W) -> (N, B)
    bestH = jnp.moveaxis(bestH, -1, 1).reshape(N, B)
    bestI = jnp.moveaxis(bestI, -1, 1).reshape(N, B)
    return _finalize(bestH, bestI, B)
