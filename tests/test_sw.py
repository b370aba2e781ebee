"""Kernel-vs-oracle equality: XLA scan and Pallas (interpret) banded SW
must match the scalar oracle EXACTLY, including endpoint tie-breaks
(SURVEY.md §4.2 "Kernel" row)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from ghostm_tpu import oracle
from ghostm_tpu.kernels import sw_pallas, sw_xla
from ghostm_tpu.ops.encode import SENTINEL
from ghostm_tpu.ops.scoring import padded_matrix

MAT = padded_matrix()
GO, GE = 11, 1


def _random_case(rng, Lq, B, related=True):
    q = rng.integers(0, 20, size=Lq).astype(np.int8)
    wlen = Lq + B
    w = rng.integers(0, 20, size=wlen).astype(np.int8)
    if related:
        # plant a mutated copy of part of q on some diagonal
        b0 = int(rng.integers(0, B))
        i0 = int(rng.integers(0, max(1, Lq // 2)))
        ln = int(rng.integers(3, Lq - i0))
        seg = q[i0 : i0 + ln].copy()
        mut = rng.random(ln) < 0.15
        seg[mut] = rng.integers(0, 20, size=mut.sum())
        w[i0 + b0 : i0 + b0 + ln] = seg
    return q, w


def _oracle(q, w, B):
    return oracle.sw_banded(q, w, 0, B, MAT, GO, GE)


def _scores(qs, ws, B):
    return sw_xla.banded_scores(
        jnp.asarray(np.stack(qs)), jnp.asarray(np.stack(ws)), jnp.asarray(MAT), B
    )


@pytest.mark.parametrize("Lq,B", [(16, 8), (40, 32), (24, 16)])
def test_xla_matches_oracle(rng, Lq, B):
    qs, ws, want = [], [], []
    for t in range(32):
        q, w = _random_case(rng, Lq, B, related=(t % 2 == 0))
        qs.append(q)
        ws.append(w)
        want.append(_oracle(q, w, B))
    sc = _scores(qs, ws, B)
    score, ie, be = sw_xla.sw_banded(sc, GO, GE)
    got = list(zip(np.asarray(score), np.asarray(ie), np.asarray(be)))
    assert [tuple(int(v) for v in g) for g in got] == want


def test_xla_sentinel_blocks_crossing(rng):
    # window containing a sentinel run >= B: alignment cannot bridge it
    Lq, B = 32, 8
    q = rng.integers(0, 20, size=Lq).astype(np.int8)
    w = np.concatenate(
        [q[:12], np.full(B, SENTINEL, np.int8), q[12 : 12 + Lq + B - 12 - B]]
    ).astype(np.int8)
    sc = _scores([q], [w], B)
    score, _, _ = sw_xla.sw_banded(sc, GO, GE)
    want = _oracle(q, w, B)
    assert int(score[0]) == want[0]


@pytest.mark.parametrize("Lq,B,rtile", [(40, 32, 40), (64, 16, 16), (16, 8, 8)])
def test_pallas_interpret_matches_oracle(rng, Lq, B, rtile):
    N = 128  # one lane tile
    qs, ws, want = [], [], []
    for t in range(N):
        q, w = _random_case(rng, Lq, B, related=(t % 3 != 0))
        qs.append(q)
        ws.append(w)
    for q, w in zip(qs[:12], ws[:12]):
        want.append(_oracle(q, w, B))
    sc = _scores(qs, ws, B)
    score, ie, be = sw_pallas.sw_banded_pallas(
        sc, GO, GE, row_tile=rtile, interpret=True
    )
    got = list(zip(np.asarray(score[:12]), np.asarray(ie[:12]), np.asarray(be[:12])))
    assert [tuple(int(v) for v in g) for g in got] == want
    # and pallas == xla on the whole batch
    s2, i2, b2 = sw_xla.sw_banded(sc, GO, GE)
    np.testing.assert_array_equal(np.asarray(score), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(ie), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(be), np.asarray(b2))


def test_moves_traceback_consistency(rng):
    """Traceback from moves reproduces the score by summing per-column costs."""
    Lq, B = 24, 16
    q, w = _random_case(rng, Lq, B)
    sc = _scores([q], [w], B)
    score, ie, be, moves = sw_xla.sw_banded_moves(sc, GO, GE)
    score, ie, be = int(score[0]), int(ie[0]), int(be[0])
    assert (score, ie, be) == _oracle(q, w, B)
    if score == 0:
        return
    # walk the moves and re-add the path score
    mv = np.asarray(moves[0])
    scn = np.asarray(sc[0])
    i, b, state, total = ie, be, "H", 0
    for _ in range(4 * (Lq + B)):
        if state == "H":
            c = mv[i, b] & 3
            if c == 0:
                break
            if c == 1:
                total += scn[i, b]
                i -= 1
                if i < 0:
                    break
            elif c == 2:
                state = "E"
            else:
                state = "F"
        elif state == "E":
            opened = (mv[i, b] >> 2) & 1
            total -= GE
            b -= 1
            if opened:
                total -= GO
                state = "H"
        else:
            opened = (mv[i, b] >> 3) & 1
            total -= GE
            i -= 1
            b += 1
            if opened:
                total -= GO
                state = "H"
            if i < 0:
                break
    assert total == score


def test_traceback_device_matches_numpy(rng):
    from ghostm_tpu.report import traceback_stats

    Lq, B = 24, 16
    qs, ws = [], []
    for t in range(16):
        q, w = _random_case(rng, Lq, B, related=(t % 2 == 0))
        qs.append(q)
        ws.append(w)
    sc = _scores(qs, ws, B)
    s, ie, be, moves = sw_xla.sw_banded_moves(sc, GO, GE)
    qcn = np.stack(qs).astype(np.int32)
    wn = np.stack(ws).astype(np.int32)
    want = traceback_stats(np.asarray(moves), np.asarray(ie), np.asarray(be), qcn, wn)
    got = sw_xla.traceback_stats_device(moves, ie, be, jnp.asarray(qcn), jnp.asarray(wn))
    for k in want:
        np.testing.assert_array_equal(np.asarray(got[k]), want[k], err_msg=k)


def test_int8_masked_scores_match_int32(rng):
    """int8 masked score tiles widen to bit-identical DP results."""
    Lq, B = 40, 32
    N = 16
    qs = np.stack([rng.integers(0, 20, Lq).astype(np.int8) for _ in range(N)])
    buf = rng.integers(0, 20, 400).astype(np.int8)
    g0 = rng.integers(0, 200, N).astype(np.int32)
    lo = (g0 + rng.integers(0, 10, N)).astype(np.int32)
    hi = (lo + rng.integers(20, 120, N)).astype(np.int32)
    ws = np.stack([buf[g : g + Lq + B] for g in g0])
    sc32 = np.asarray(
        sw_xla.banded_scores(
            jnp.asarray(qs.astype(np.int32)), jnp.asarray(ws.astype(np.int32)),
            jnp.asarray(MAT), B,
        )
    )
    iota = np.arange(Lq)[:, None] + np.arange(B)[None, :]
    j = g0[:, None, None] + iota[None]
    inb = (j >= lo[:, None, None]) & (j < hi[:, None, None])
    sc32 = np.where(inb, sc32, sw_xla.NEG)
    sc8 = sw_xla.banded_scores_i8(
        jnp.asarray(qs.astype(np.int32)), jnp.asarray(ws.astype(np.int32)),
        jnp.asarray(MAT), B, jnp.asarray(g0), jnp.asarray(lo), jnp.asarray(hi),
    )
    # DP over int8 path == DP over int32 masked path
    want = sw_xla.sw_banded(jnp.asarray(sc32.astype(np.int32)), GO, GE)
    got = sw_xla.sw_banded(sc8, GO, GE)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the pallas interpret path agrees
    gp = sw_pallas.sw_banded_pallas(
        jnp.asarray(np.tile(np.asarray(sc8), (8, 1, 1))), GO, GE,
        row_tile=40, interpret=True,
    )
    for a, b in zip(gp, want):
        np.testing.assert_array_equal(np.asarray(a)[:N], np.asarray(b))


# --- wavefront kernel (kernels/sw_wave.py) --------------------------------

from ghostm_tpu.kernels import sw_wave


@pytest.mark.parametrize("Lq,B,atile", [(40, 32, 0), (24, 16, 0), (300, 32, 64)])
def test_wave_interpret_matches_oracle(rng, Lq, B, atile):
    N = 128
    qs, ws, want = [], [], []
    for t in range(N):
        q, w = _random_case(rng, Lq, B, related=(t % 2 == 0))
        qs.append(q)
        ws.append(w)
        if t < 32:
            want.append(_oracle(q, w, B))
    sc = _scores(qs, ws, B)
    score, ie, be = sw_wave.sw_banded_wave(sc, GO, GE, a_tile=atile,
                                           interpret=True)
    got = list(zip(np.asarray(score[:32]), np.asarray(ie[:32]),
                   np.asarray(be[:32])))
    assert [tuple(int(v) for v in g) for g in got] == want


def test_wave_i8_matches_int32(rng):
    from ghostm_tpu.kernels.sw_xla import MASKED_I8
    N, Lq, B = 128, 40, 32
    sc = rng.integers(-11, 12, (N, Lq, B)).astype(np.int8)
    sc[rng.random(sc.shape) < 0.15] = MASKED_I8
    want = sw_xla.sw_banded(jnp.asarray(sc), GO, GE)
    got = sw_wave.sw_banded_wave(jnp.asarray(sc), GO, GE, interpret=True)
    for a, b in zip(got, want):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_wave_skew_tiles_layout(rng):
    N, Lq, B = 2, 5, 8
    h = B // 2
    sc = rng.integers(-10, 10, (N, Lq, B)).astype(np.int32)
    sk = np.asarray(sw_wave.skew_tiles(jnp.asarray(sc)))
    A = Lq + h - 1
    assert sk.shape == (N, A, B)
    for a in range(A):
        for c in range(B):
            m = c % h
            b = 2 * m + (1 if c >= h else 0)
            i = a - m
            want = sc[0, i, b] if 0 <= i < Lq else sw_wave.NEG
            assert sk[0, a, c] == want
