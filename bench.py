"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (`value`): SW GCUPS through the ENGINE'S OPERATIVE align
path — kernels/sw_fused.py (in-kernel scoring, no HBM score tensor) at
config-2 shapes (Lq=40, band=32), i.e. the code path SearchEngine selects
for query_frame_len=40 (VERDICT r01 item 2: the headline must be the
kernel the flagship config actually runs). `fused_step_gcups` is the same
quantity kept for cross-round continuity.

Timing protocol: per-execution RPC latency on the axon tunnel is 1-2 ms
(measured: `x + 1` on a 15 MB array "costs" 2.2 ms dispatched,
microseconds of device time), so each measurement queues SCAN_LEN
executions asynchronously per sync at a large N (~13 ms device work per
call), bounding the dispatch tax to ~10%. block_until_ready does not
reliably wait on this backend — sync is a scalar-reduction fetch.
Synthetic probes are untrustworthy here (zero-arg closures constant-fold
the whole pallas_call at compile time; add/max chains strength-reduce —
both produced >100e12 "ops/s" before being caught), so the roofline is
the SPEC ceiling, not a measured proxy:

  roofline_gcups = v5e nominal VPU issue width (8 sublanes x 128 lanes
  x 4 ALUs x 0.94 GHz = 3.85e12 elem-ops/s) / ~36 elem-ops/cell counted
  from the kernels/sw_fused.py step body (2 half-steps x (extract ~9 +
  Gotoh DP ~11) + slab maintenance ~5 + select-tree/loads ~3). Pallas
  compiles to one opaque Mosaic custom call, so compiled-HLO op counting
  stops at the kernel boundary — the source count is the honest basis
  (BASELINE.md protocol, adapted; see docs/DESIGN.md).

vs_baseline is kernel_gcups (the DP kernel proper, pre-prepped inputs)
over that roofline — the BASELINE "within 1.5x of per-chip roofline"
target is defined on the SW kernel; `value` stays the operative path.
"""

import functools
import json
import os
import sys
import time

import numpy as np

OPS_PER_CELL = 36.0     # counted from kernels/sw_fused.py step body
SPEC_VPU_OPS = 8 * 128 * 4 * 0.94e9   # v5e nominal elem-ops/s
SCAN_LEN = 8


def _bench_call(f, reps=5):
    """Best-of wall time of one call, synced by fetching a scalar
    reduction (block_until_ready does not reliably wait on the axon
    tunnel backend — docs/DESIGN.md measurement notes)."""
    import jax
    import jax.numpy as jnp

    red = lambda: np.asarray(
        jnp.sum(jax.tree_util.tree_leaves(f())[0].astype(jnp.int32))
    )
    red()
    best = float("inf")
    for _ in range(reps):
        t = time.time()
        red()
        best = min(best, time.time() - t)
    return best


def bench_kernel_only():
    """The fused DP kernel PROPER (pre-prepped inputs, bare pallas_call) —
    the quantity the BASELINE roofline target ("within 1.5x of per-chip
    roofline") is defined on."""
    import functools as ft

    import jax
    import jax.numpy as jnp

    from ghostm_tpu.kernels import sw_fused
    from ghostm_tpu.ops.scoring import padded_matrix

    N, Lq, B = 65536, 40, 32
    h = B // 2
    A = Lq + h - 1
    atile = -(-A // sw_fused.UNROLL) * sw_fused.UNROLL
    Ap = atile
    SH = int(Ap + 2 * h).bit_length()
    W = sw_fused.DEFAULT_WIDTH
    G = N // W
    words, climit = sw_fused.build_packed_matrix(padded_matrix())
    key = jax.random.PRNGKey
    qrow_t = jax.random.randint(key(0), (G, Ap, W), 0, 20, jnp.int32)
    wins_t = jax.random.randint(key(1), (G, Ap, W), 0, 20, jnp.int32)
    whead_t = jax.random.randint(key(2), (G, h, W), 0, 20, jnp.int32)
    fn = jax.jit(ft.partial(
        sw_fused.kernel_call, packed_words=words, band=B, gap_open=11,
        gap_extend=1, atile=atile, pack_shift=SH, code_limit=climit,
        cells=N * Lq * B,
    ))
    cells = N * Lq * B
    dt = _chained(lambda: fn(qrow_t, wins_t, whead_t))
    return cells / dt / 1e9


def _chained(f, reps=None):
    """Per-call time over SCAN_LEN asynchronously queued executions."""
    import jax
    import jax.numpy as jnp

    reps = reps or SCAN_LEN
    red = lambda: jnp.sum(jax.tree_util.tree_leaves(f())[0].astype(jnp.int32))
    np.asarray(red())
    best = float("inf")
    for _ in range(3):
        t = time.time()
        acc = jnp.int32(0)
        for _ in range(reps):
            acc = acc + red()
        np.asarray(acc)
        best = min(best, (time.time() - t) / reps)
    return best


def bench_fused_kernel():
    """Engine-operative fused SW path at config-2 shapes.

    Timing: SCAN_LEN asynchronously-queued executions per sync (JAX
    dispatch is async; the device runs them back to back) — a large N
    keeps the per-execution tunnel-RPC cost to ~10% of device time.
    (A lax.scan-of-pallas variant amortises dispatch perfectly but its
    remote Mosaic compile exceeds the bench budget on this tunnel.)"""
    import jax
    import jax.numpy as jnp

    from ghostm_tpu.kernels import sw_fused
    from ghostm_tpu.ops.scoring import padded_matrix

    N, Lq, B = 65536, 40, 32   # config-2 align shapes
    words, climit = sw_fused.build_packed_matrix(padded_matrix())
    qs = jax.random.randint(jax.random.PRNGKey(0), (N, Lq), 0, 20,
                            jnp.int32)
    ws = jax.random.randint(jax.random.PRNGKey(1), (N, Lq + B), 0, 20,
                            jnp.int32)
    lo = jnp.zeros(N, jnp.int32)
    hi = jnp.full(N, 1 << 20, jnp.int32)

    def red():
        s, ie, be = sw_fused.sw_fused_wave(
            qs, ws, words, lo, hi, 11, 1, B, code_limit=climit
        )
        return jnp.sum(s)

    np.asarray(red())   # compile (cached across runs)
    best = float("inf")
    for _ in range(3):
        t = time.time()
        acc = jnp.int32(0)
        for _ in range(SCAN_LEN):
            acc = acc + red()
        np.asarray(acc)
        best = min(best, (time.time() - t) / SCAN_LEN)
    return N * Lq * B / best / 1e9


def bench_end_to_end():
    import jax

    from ghostm_tpu.config import Config
    from ghostm_tpu.engine import SearchEngine
    from ghostm_tpu.index import diskio, seeds, store
    from ghostm_tpu.ops.encode import encode_aa, encode_dna
    from tools.simulate import random_proteins, reads_from_proteins

    rng = np.random.default_rng(1)
    cfg = Config(query_batch=4096, seed_len=4, hits_per_seed=64)
    prots = random_proteins(rng, 20000, lo=150, hi=450)
    records = [(f"s{i}", p.encode()) for i, p in enumerate(prots)]
    keep = seeds.global_bucket_truncation(
        [encode_aa(s) for _, s in records], cfg.seed_len, cfg.hits_per_seed
    )
    assign = store.shard_records(records, 1)
    shards = []
    for ids in assign:
        st = store.build_store(
            [records[i] for i in ids], cfg.sentinel_pad, subject_ids=ids
        )
        kb = np.zeros(len(st.buffer), dtype=bool)
        for r, gi in enumerate(ids):
            kb[st.starts[r] : st.starts[r] + len(keep[gi])] = keep[gi]
        shards.append(
            diskio.IndexShard(
                st, seeds.build_seed_index(st.buffer, cfg.seed_len, kb)
            )
        )
    index = diskio.stack_shards(shards, cfg.seed_len)
    eng = SearchEngine(cfg, index)

    R = cfg.query_batch
    names, reads = reads_from_proteins(rng, prots, R, read_len=100)
    dna = np.full((R, 100), 4, np.int8)
    lens = np.zeros(R, np.int32)
    for i, rd in enumerate(reads):
        c = encode_dna(rd)
        dna[i, : len(c)] = c
        lens[i] = len(c)
    # the pipeline's operative path: async dispatch of search+refine with
    # the previous batch's packed fetch overlapping device work
    # (ghostm_tpu.pipeline.run_search's software pipelining)
    qc = eng.translate(dna, lens)
    first = np.asarray(eng.search_refine_async(qc))   # warmup (compile)
    t = time.time()
    reps = 4
    pending = None
    for _ in range(reps):
        qc = eng.translate(dna, lens)
        pay = eng.search_refine_async(qc)
        if pending is not None:
            np.asarray(pending)
        pending = pay
    last = np.asarray(pending)
    dt = (time.time() - t) / reps
    return R / dt, int(last[0].max())


def main():
    from ghostm_tpu.cli import _enable_compile_cache

    _enable_compile_cache()
    t0 = time.time()
    spec_roofline = SPEC_VPU_OPS / OPS_PER_CELL / 1e9
    kernel_gcups = bench_kernel_only()
    print(f"# kernel-only: {kernel_gcups:.1f} GCUPS ({time.time()-t0:.0f}s)",
          file=sys.stderr, flush=True)
    fused_gcups = bench_fused_kernel()
    print(f"# fused: {fused_gcups:.1f} GCUPS ({time.time()-t0:.0f}s)",
          file=sys.stderr, flush=True)
    reads_per_s, max_score = bench_end_to_end()
    out = {
        "metric": "sw_gcups",
        "value": round(fused_gcups, 2),
        "unit": "GCUPS",
        # the BASELINE roofline target is defined on the DP kernel proper;
        # `value` stays the operative end-to-end path (VERDICT r01 item 2)
        "vs_baseline": round(kernel_gcups / spec_roofline, 4),
        "kernel_gcups": round(kernel_gcups, 2),
        "roofline_gcups": round(spec_roofline, 1),
        "fused_step_gcups": round(fused_gcups, 2),
        "reads_per_s": round(reads_per_s, 1),
        "bench_wall_s": round(time.time() - t0, 1),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    sys.exit(main())
