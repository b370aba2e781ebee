"""Anti-diagonal wavefront banded SW — the speed-of-light successor to the
row-scan kernel (kernels/sw_pallas.py).

Reference equivalent: same GHOSTM CUDA SW kernel (SURVEY.md §2, §3.5); the
row-scan kernel resolved the in-row gap-in-query dependency with an exact
log2(B)-step prefix max-scan (~31 vector ops/cell). This kernel removes the
scan entirely by advancing the DP wavefront in STAGGERED DIAGONAL PAIRS:

  * the band's B diagonals are split into even (b = 2m) and odd
    (b = 2m+1) halves, each a (B/2, W) vector with one CURRENT cell per
    diagonal. The stagger invariant at step a: even diagonal 2m sits at
    query row i = a - m, odd diagonal 2m+1 at row a - m - 1.
  * one step advances the evens (reading the odds' carried state), then
    the odds (reading the just-computed evens). Every Gotoh dependency
    becomes a same-index read or a single sublane shift:
      even:  E <- shift_dn(max(Ho-go1, Eo-ge))   F <- max(Ho-go1, Fo-ge)
      odd :  E <- max(He-go1, Ee-ge)             F <- shift_up(max(He-go1, Fe-ge))
    No scan, ~16 vector ops per cell — roughly 2x the row-scan kernel's
    arithmetic throughput per cell.
  * scores arrive PRE-SKEWED (skew_tiles): step a reads one contiguous
    (B, W) slab whose sublane c holds the score of the cell advanced on
    diagonal (2(c%h) + (c>=h)) this step — i.e. M[q[a-m], w[a+m(+1)]].
  * a-tiles carry all ten state planes in VMEM scratch across the
    ("parallel", "arbitrary") grid, so long-read queries stream exactly
    like the row kernel's row tiles (SURVEY.md §5.7).

Cell values, the endpoint contract (max score, min i, min b) and masking
semantics are bit-identical to ghostm_tpu.oracle.sw_banded; tests assert
integer equality against the oracle and the row kernel.
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
DEFAULT_WIDTH = 1024


def skew_tiles(sc: jnp.ndarray) -> jnp.ndarray:
    """(N, Lq, B) band tiles -> (N, A, B) wavefront slabs, A = Lq + B//2 - 1.

    out[n, a, c] = sc[n, a - (c % h), 2*(c % h) + (c >= h)] (h = B//2),
    i.e. sublanes [0, h) hold the even diagonals and [h, B) the odd ones,
    both shifted so one step's inputs are contiguous. Pure data movement
    (B pad+slice ops); pads with the dtype's mask value.
    """
    N, Lq, B = sc.shape
    h = B // 2
    A = Lq + h - 1
    pad_val = MASKED_I8 if sc.dtype == jnp.int8 else NEG
    cols = []
    for c in range(B):
        m = c % h
        b = 2 * m + (1 if c >= h else 0)
        col = jnp.pad(
            sc[:, :, b], ((0, 0), (m, A - Lq - m)), constant_values=pad_val
        )
        cols.append(col)
    return jnp.stack(cols, axis=-1)


UNROLL = 4


def _wave_kernel(
    sc_ref,   # (1, ATILE, B, W) skewed score slabs
    pe_ref, po_ref,                # (1, h, W) packed (H << SH | inv-row)
    He_s, Ho_s, Eo_s, Fo_s, pe_s, po_s,
    *,
    atile: int,
    band: int,
    go1: int,
    ge: int,
    n_a_tiles: int,
    width: int,
    is_i8: bool,
    pack_shift: int,
):
    h = band // 2
    W = width
    SH = pack_shift
    at = pl.program_id(1)
    m_iota = jax.lax.broadcasted_iota(jnp.int32, (h, W), 0)
    negv = jnp.full((h, W), NEG, jnp.int32)
    negrow = jnp.full((1, W), NEG, jnp.int32)

    @pl.when(at == 0)
    def _():
        He_s[:] = jnp.zeros((h, W), jnp.int32)
        Ho_s[:] = jnp.zeros((h, W), jnp.int32)
        Eo_s[:] = negv
        Fo_s[:] = negv
        pe_s[:] = jnp.zeros((h, W), jnp.int32)
        po_s[:] = jnp.zeros((h, W), jnp.int32)

    def one(t, carry):
        He, Ho, Eo, Fo, pe, po, inv = carry
        s = sc_ref[0, t]
        if is_i8:
            s = s.astype(jnp.int32)
            s = jnp.where(s == MASKED_I8, NEG, s)
        se, so = s[:h], s[h:]
        # even half-step (diagonals 2m at row a - m)
        Hogo = Ho - go1
        Ee = jnp.concatenate(
            [negrow, jnp.maximum(Hogo, Eo - ge)[:-1]], axis=0
        )
        Fe = jnp.maximum(Hogo, Fo - ge)
        He = jnp.maximum(jnp.maximum(He + se, 0), jnp.maximum(Ee, Fe))
        # best-tracking: one packed max; inv = MASK - (irow + h) decreases
        # with irow, so max() picks (H desc, irow asc) — the contract's
        # (max score, min i) with min-b resolved in _finalize.
        pe = jnp.maximum(pe, (He << SH) | inv)
        # odd half-step (diagonals 2m+1 at row a - m, reads the evens)
        Hego = He - go1
        Eo = jnp.maximum(Hego, Ee - ge)
        Fo = jnp.concatenate(
            [jnp.maximum(Hego, Fe - ge)[1:], negrow], axis=0
        )
        Ho = jnp.maximum(jnp.maximum(Ho + so, 0), jnp.maximum(Eo, Fo))
        po = jnp.maximum(po, (Ho << SH) | inv)
        return He, Ho, Eo, Fo, pe, po, inv - 1

    inv0 = ((1 << SH) - 1) - (at * atile - m_iota) - h

    def body(t, carry):
        for u in range(UNROLL):
            carry = one(t * UNROLL + u, carry)
        return carry

    He, Ho, Eo, Fo, pe, po, _ = jax.lax.fori_loop(
        0, atile // UNROLL, body,
        (He_s[:], Ho_s[:], Eo_s[:], Fo_s[:], pe_s[:], po_s[:], inv0),
    )
    He_s[:], Ho_s[:], Eo_s[:], Fo_s[:], pe_s[:], po_s[:] = (
        He, Ho, Eo, Fo, pe, po
    )

    @pl.when(at == n_a_tiles - 1)
    def _():
        pe_ref[0] = pe_s[:]
        po_ref[0] = po_s[:]


@functools.partial(
    jax.jit, static_argnames=("gap_open", "gap_extend", "a_tile", "interpret")
)
def sw_banded_wave(
    sc: jnp.ndarray,
    gap_open: int,
    gap_extend: int,
    a_tile: int = 0,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched banded SW via the wavefront kernel.

    Args:
      sc: (N, Lq, B) int32 scores or int8 masked tiles (as for
          sw_banded_pallas); N a multiple of 128, B even.
    Returns:
      (score, i_end, b_end), each (N,) int32 — identical contract and
      tie-breaks to sw_banded_pallas / the oracle.
    """
    N, Lq, B = sc.shape
    if B % 2 or B < 16:
        raise ValueError("wavefront kernel needs an even band >= 16")
    if N % LANES:
        raise ValueError(f"N={N} must be a multiple of {LANES}")
    h = B // 2
    sk = skew_tiles(sc)
    A = sk.shape[1]
    is_i8 = sk.dtype == jnp.int8
    esize = 1 if is_i8 else 4
    atile = a_tile or (A if A <= 256 else 128)
    atile = -(-atile // UNROLL) * UNROLL
    a_pad = -A % atile
    pad_val = MASKED_I8 if is_i8 else NEG
    if a_pad:
        sk = jnp.pad(
            sk, ((0, 0), (0, a_pad), (0, 0)), constant_values=pad_val
        )
        A += a_pad
    # best-cell packing: one int32 holds (H << SH) | (MASK - irow - h)
    SH = int(A + 2 * h).bit_length()
    if 15 * Lq >= (1 << (31 - SH)):
        raise ValueError(
            f"Lq={Lq} too long for packed best-tracking (SH={SH}); "
            "use sw_banded_pallas"
        )
    MASK = (1 << SH) - 1
    W = LANES
    while W * 2 <= DEFAULT_WIDTH and N % (W * 2) == 0 and (
        atile * B * W * 2 * esize <= 6 * 1024 * 1024
    ):
        W *= 2
    G = N // W
    AT = A // atile
    skt = jnp.moveaxis(sk.reshape(G, W, A, B), 1, -1)
    kernel = functools.partial(
        _wave_kernel,
        atile=atile,
        band=B,
        go1=gap_open + gap_extend,
        ge=gap_extend,
        n_a_tiles=AT,
        width=W,
        is_i8=is_i8,
        pack_shift=SH,
    )
    out_spec = pl.BlockSpec((1, h, W), lambda g, at: (g, 0, 0),
                            memory_space=pltpu.VMEM)
    pe, po = pl.pallas_call(
        kernel,
        grid=(G, AT),
        in_specs=[
            pl.BlockSpec(
                (1, atile, B, W),
                lambda g, at: (g, at, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=[out_spec] * 2,
        out_shape=[jax.ShapeDtypeStruct((G, h, W), jnp.int32)] * 2,
        scratch_shapes=[pltpu.VMEM((h, W), jnp.int32)] * 6,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=16 * N * Lq * B,
            bytes_accessed=esize * N * A * B,
            transcendentals=0,
        ),
        interpret=interpret,
    )(skt)
    # (G, h, W) even/odd pairs -> (N, B) with b = 2m, 2m+1 interleaved
    pk = jnp.stack([pe, po], axis=2).reshape(G, B, W)
    pk = jnp.moveaxis(pk, -1, 1).reshape(N, B)
    bH = pk >> SH
    bI = MASK - (pk & MASK) - h
    bI = jnp.where(bH > 0, bI, 0)
    return _finalize(bH, bI, B)
