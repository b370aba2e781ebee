"""Fused-scoring wavefront kernel vs the reference score-fed path.

The fused kernel (kernels/sw_fused.py) must be bit-identical to
sw_xla.sw_banded over banded_scores_i8 tiles — same scores, same endpoint
tie-breaks, same masking semantics — for every band/length/masking regime
the engine can select it for. Runs in interpret mode on the CPU mesh.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ghostm_tpu.kernels import sw_fused, sw_xla
from ghostm_tpu.ops.scoring import padded_matrix


def _ref(qs, ws, mat, band, g0, lo, hi, go, ge):
    sc = sw_xla.banded_scores_i8(qs, ws, mat, band, g0, lo, hi)
    return sw_xla.sw_banded(sc, go, ge)


@pytest.mark.parametrize(
    "seed,n,lq,band",
    [(0, 128, 40, 32), (1, 128, 24, 32), (2, 128, 96, 32),
     (3, 128, 40, 16), (4, 256, 300, 32), (5, 128, 40, 64)],
)
def test_fused_matches_reference(seed, n, lq, band):
    rng = np.random.default_rng(seed)
    mat = padded_matrix()
    words, climit = sw_fused.build_packed_matrix(mat)
    # codes include stop(23)/sentinel(24)/pad(25) to exercise masking
    qs = jnp.asarray(rng.integers(0, 26, (n, lq)).astype(np.int32))
    ws = jnp.asarray(rng.integers(0, 26, (n, lq + band)).astype(np.int32))
    g0 = jnp.zeros(n, jnp.int32)
    lo = jnp.asarray(rng.integers(0, 8, n).astype(np.int32))
    hi = jnp.asarray(rng.integers(lq // 2, lq + band, n).astype(np.int32))
    s0, i0, b0 = _ref(qs, ws, jnp.asarray(mat), band, g0, lo, hi, 11, 1)
    s1, i1, b1 = sw_fused.sw_fused_wave(
        qs, ws, words, lo, hi, 11, 1, band,
        code_limit=climit, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(b0), np.asarray(b1))


@pytest.mark.parametrize("il", [2, 4])
def test_fused_interleave_bit_identity(il):
    """interleave > 1 reshapes the grid into IL independent problem slices
    per kernel instance (sw_fused.kernel_call) — results must be
    bit-identical to il=1 AND to the score-fed reference path."""
    rng = np.random.default_rng(100 + il)
    mat = padded_matrix()
    words, climit = sw_fused.build_packed_matrix(mat)
    n, lq, band = 512, 40, 32
    qs = jnp.asarray(rng.integers(0, 26, (n, lq)).astype(np.int32))
    ws = jnp.asarray(rng.integers(0, 26, (n, lq + band)).astype(np.int32))
    g0 = jnp.zeros(n, jnp.int32)
    lo = jnp.asarray(rng.integers(0, 8, n).astype(np.int32))
    hi = jnp.asarray(rng.integers(lq // 2, lq + band, n).astype(np.int32))
    ref = _ref(qs, ws, jnp.asarray(mat), band, g0, lo, hi, 11, 1)
    base = sw_fused.sw_fused_wave(
        qs, ws, words, lo, hi, 11, 1, band, code_limit=climit,
        lane_width=128, interleave=1, interpret=True,
    )
    out = sw_fused.sw_fused_wave(
        qs, ws, words, lo, hi, 11, 1, band, code_limit=climit,
        lane_width=128, interleave=il, interpret=True,
    )
    for r, a, b in zip(ref, base, out):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(a))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_interleave_ragged_group_fallback():
    """G % il != 0 (here G=3, il=2) must step il down (kernel_call's
    `while il > 1 and G % il` loop) and still be bit-identical."""
    rng = np.random.default_rng(11)
    mat = padded_matrix()
    words, climit = sw_fused.build_packed_matrix(mat)
    n, lq, band = 384, 40, 32   # W=128 -> G=3
    qs = jnp.asarray(rng.integers(0, 26, (n, lq)).astype(np.int32))
    ws = jnp.asarray(rng.integers(0, 26, (n, lq + band)).astype(np.int32))
    lo = jnp.zeros(n, jnp.int32)
    hi = jnp.full(n, lq + band, jnp.int32)
    a = sw_fused.sw_fused_wave(
        qs, ws, words, lo, hi, 11, 1, band, code_limit=climit,
        lane_width=128, interleave=1, interpret=True,
    )
    b = sw_fused.sw_fused_wave(
        qs, ws, words, lo, hi, 11, 1, band, code_limit=climit,
        lane_width=128, interleave=2, interpret=True,
    )
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_fused_degenerate_empty_and_allmasked():
    mat = padded_matrix()
    words, climit = sw_fused.build_packed_matrix(mat)
    n, lq, band = 128, 24, 32
    qs = jnp.full((n, lq), 25, jnp.int32)          # all pad
    ws = jnp.zeros((n, lq + band), jnp.int32)
    lo = jnp.zeros(n, jnp.int32)
    hi = jnp.full(n, lq + band, jnp.int32)
    s, i, b = sw_fused.sw_fused_wave(
        qs, ws, words, lo, hi, 11, 1, band, code_limit=climit, interpret=True
    )
    assert int(jnp.max(s)) == 0
    assert int(jnp.max(i)) == -1 and int(jnp.max(b)) == -1


def test_engine_align_fused_matches_plain():
    """align_shard with the fused kernel (interpret) vs the XLA path —
    exercises the engine wiring (rel_lo/rel_hi, window fetch, chunking)."""
    from ghostm_tpu import engine as eng
    from ghostm_tpu.config import Config
    from ghostm_tpu.index import diskio, seeds, store
    from ghostm_tpu.ops.encode import encode_aa

    rng = np.random.default_rng(7)
    cfg = Config(query_frame_len=24, band_width=32, query_batch=128)
    aas = "ARNDCQEGHILKMFPSTWYV"
    records = [
        (f"s{i}", "".join(rng.choice(list(aas), 50)).encode())
        for i in range(20)
    ]
    keep = seeds.global_bucket_truncation(
        [encode_aa(s) for _, s in records], cfg.seed_len, cfg.hits_per_seed
    )
    st = store.build_store(records, cfg.sentinel_pad,
                           subject_ids=list(range(20)))
    kb = np.zeros(len(st.buffer), dtype=bool)
    for r in range(20):
        kb[st.starts[r]: st.starts[r] + len(keep[r])] = keep[r]
    shard = diskio.IndexShard(
        st, seeds.build_seed_index(st.buffer, cfg.seed_len, kb)
    )
    index = diskio.stack_shards([shard], cfg.seed_len)

    Qf, Lq = 48, cfg.query_frame_len
    qflat = rng.integers(0, 20, (Qf, Lq)).astype(np.int8)
    C = 4
    sel_gsid = rng.integers(0, 20, (Qf, C)).astype(np.int32)
    sel_lbin = rng.integers(
        0, 50 // (cfg.band_width // 2) + 2, (Qf, C)
    ).astype(np.int32) + (Lq // (cfg.band_width // 2))
    buf = jnp.asarray(eng.pad_buffer(index.buffers[0], cfg))
    mat = jnp.asarray(padded_matrix())
    words, climit = sw_fused.build_packed_matrix(padded_matrix())
    common = dict(
        band=cfg.band_width, gap_open=cfg.gap_open,
        gap_extend=cfg.gap_extend, chunk=128, lead=eng.lead_pad(cfg),
    )
    args = (
        jnp.asarray(qflat), buf, jnp.asarray(index.starts[0]),
        jnp.asarray(index.subject_ids[0]), jnp.asarray(index.lengths[0]),
        mat, jnp.asarray(sel_gsid), jnp.asarray(sel_lbin),
    )
    out_plain = eng.align_shard(*args, use_pallas=False, **common)
    out_fused = eng.align_shard(
        *args, use_pallas=False, fused_words=words, code_limit=climit,
        fused_interpret=True, **common,
    )
    for a, b in zip(out_plain, out_fused):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_packed_matrix_out_of_nibble_range_falls_back():
    """Matrices outside the [-4, 11] nibble range (BLOSUM50-class values)
    must return words=None so the engine routes align through the
    score-fed kernels instead of failing at init."""
    mat = padded_matrix().copy()
    mat[:24, :24] = mat[:24, :24] * 2      # doubles W-W to 22 > 11
    words, climit = sw_fused.build_packed_matrix(mat)
    assert words is None
    assert climit == 23                     # column validity still derived
    # the standard matrix still packs
    words2, _ = sw_fused.build_packed_matrix(padded_matrix())
    assert words2 is not None
