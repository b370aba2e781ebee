"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (`value`): SW GCUPS through the ENGINE'S OPERATIVE align
path — kernels/sw_fused.py (in-kernel scoring, no HBM score tensor) at
config-2 shapes (Lq=40, band=32), i.e. the code path SearchEngine selects
for query_frame_len=40. `kernel_gcups` is the DP kernel proper
(pre-prepped inputs, bare pallas_call) — the quantity the BASELINE
"within 1.5x of per-chip roofline" target is defined on; vs_baseline =
kernel_gcups / roofline_gcups.

Timing protocol (r03, replaces r02's chained dispatch): the kernel runs
inside a lax.fori_loop with a DYNAMIC trip count, so one XLA program
executes it n times on-device; (t(n2) - t(n1)) / (n2 - n1) is pure
device time. This cancels the axon tunnel's per-call floor exactly.
r02's protocol queued SCAN_LEN async calls per sync and read ~4.2 ms per
call for EVERY kernel variant — tools/probe_vpu.py showed a trivial
kernel ALSO reads ~4-5 ms at any op count: the protocol was measuring a
~4 ms/call dispatch floor, not the kernel (hence r02's flat interleave
sweep and the 19.8 GCUPS underestimate; true device time is ~1.0 ms =
~80 GCUPS, TUNE_r03b.json). The kernel input is XORed with the loop
index each iteration (one vector op over the 14 MB slab, ~40 us) so XLA
cannot hoist the pallas_call out of the loop.

Roofline (spec): v5e nominal VPU issue width (8 sublanes x 128 lanes
x 4 ALUs x 0.94 GHz = 3.85e12 elem-ops/s) / ~36 elem-ops/cell counted
from the kernels/sw_fused.py step body. Pallas compiles to one opaque
Mosaic custom call, so compiled-HLO op counting stops at the kernel
boundary — the source count is the honest basis (docs/DESIGN.md). When
VPU_PROBE.json exists (tools/probe_vpu.py, double-slope protocol), its
measured int32 chain rate is reported as a second, measured denominator
(`roofline_measured_gcups`, `vs_measured`).

End-to-end reads/s is config-2-TRUE: 570k synthetic proteins (~200M
residues, SwissProt scale), k=5 seed index, hits_per_seed=128 — the
built index is cached under ~/.cache/ghostm_tpu_bench so only the first
bench run pays the ~2 min host-side build.
"""

import functools
import json
import os
import sys
import time

import numpy as np

OPS_PER_CELL = 36.0     # counted from kernels/sw_fused.py step body
SPEC_VPU_OPS = 8 * 128 * 4 * 0.94e9   # v5e nominal elem-ops/s
CACHE_DIR = os.path.expanduser("~/.cache/ghostm_tpu_bench")


# --------------------------------------------------------------------------
# fori-loop slope timing (cancels the per-call tunnel dispatch floor)
# --------------------------------------------------------------------------

def _slope_time(make_reps, n1=4, n2=36, inner=3):
    """make_reps() -> jitted f(n) running the workload n times in-graph;
    returns best-of device seconds per workload execution."""
    import jax.numpy as jnp

    f = make_reps()

    def timed(n):
        np.asarray(f(jnp.int32(n)))   # warm
        best = float("inf")
        for _ in range(inner):
            t = time.time()
            np.asarray(f(jnp.int32(n)))
            best = min(best, time.time() - t)
        return best

    return (timed(n2) - timed(n1)) / (n2 - n1)


def bench_kernel_only():
    """The fused DP kernel PROPER (pre-prepped inputs, bare pallas_call)."""
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
    call = functools.partial(
        sw_fused.kernel_call, packed_words=words, band=B, gap_open=11,
        gap_extend=1, atile=atile, pack_shift=SH, code_limit=climit,
        cells=N * Lq * B,
    )

    def make_reps():
        @jax.jit
        def reps(n):
            def body(i, acc):
                pe, _ = call(qrow_t ^ (i & 1), wins_t, whead_t)
                return acc + pe[0, 0, 0]

            return jax.lax.fori_loop(0, n, body, jnp.int32(0))

        return reps

    dt = _slope_time(make_reps)
    return N * Lq * B / dt / 1e9


def bench_fused_step():
    """Engine-operative fused align path (prep + kernel: mask folding,
    transposes, finalize) at config-2 shapes, same slope protocol."""
    import jax
    import jax.numpy as jnp

    from ghostm_tpu.kernels import sw_fused
    from ghostm_tpu.ops.scoring import padded_matrix

    N, Lq, B = 65536, 40, 32
    words, climit = sw_fused.build_packed_matrix(padded_matrix())
    qs = jax.random.randint(jax.random.PRNGKey(0), (N, Lq), 0, 20, jnp.int32)
    ws = jax.random.randint(jax.random.PRNGKey(1), (N, Lq + B), 0, 20,
                            jnp.int32)
    lo = jnp.zeros(N, jnp.int32)
    hi = jnp.full(N, 1 << 20, jnp.int32)

    def make_reps():
        @jax.jit
        def reps(n):
            def body(i, acc):
                s, ie, be = sw_fused.sw_fused_wave(
                    qs ^ (i & 1), ws, words, lo, hi, 11, 1, B,
                    code_limit=climit,
                )
                return acc + s[0]

            return jax.lax.fori_loop(0, n, body, jnp.int32(0))

        return reps

    dt = _slope_time(make_reps)
    return N * Lq * B / dt / 1e9


# --------------------------------------------------------------------------
# end-to-end at config-2-true scale (570k seqs, k=5), disk-cached index
# --------------------------------------------------------------------------

def _build_config2_index(cfg):
    """570k-seq / ~200M-residue store + k=5 seed index; cached on disk."""
    from ghostm_tpu.index import diskio, seeds
    from ghostm_tpu.index.store import SubjectStore
    from ghostm_tpu.ops.encode import SENTINEL
    from tools.bench_scale2 import fast_proteins

    n_seqs = 570_000
    cache = os.path.join(CACHE_DIR, f"c2_{n_seqs}_k5.npz")
    if os.path.exists(cache):
        z = np.load(cache)
        st = SubjectStore(
            buffer=z["buffer"], starts=z["starts"], lengths=z["lengths"],
            names=[f"s{i}" for i in range(n_seqs)],
            subject_ids=np.arange(n_seqs, dtype=np.int64),
        )
        sidx = seeds.SeedIndex(cfg.seed_len, z["positions"],
                               z["bucket_starts"])
    else:
        rng = np.random.default_rng(7)
        codes, lens = fast_proteins(rng, n_seqs)
        pad = cfg.sentinel_pad
        starts = np.zeros(n_seqs, np.int64)
        np.cumsum(lens[:-1] + pad, out=starts[1:])
        total = int(starts[-1] + lens[-1] + pad)
        buf = np.full(total, SENTINEL, np.int8)
        pos = np.arange(total, dtype=np.int64)
        row = np.searchsorted(starts, pos, side="right") - 1
        buf[pos - starts[row] < lens[row]] = codes
        st = SubjectStore(
            buffer=buf, starts=starts, lengths=lens.astype(np.int64),
            names=[f"s{i}" for i in range(n_seqs)],
            subject_ids=np.arange(n_seqs, dtype=np.int64),
        )
        sidx = seeds.build_seed_index(buf, cfg.seed_len)
        bs = np.asarray(sidx.bucket_starts, np.int64)
        counts = np.diff(bs)
        keep = (np.arange(len(sidx.positions), dtype=np.int64)
                - np.repeat(bs[:-1], counts)) < cfg.hits_per_seed
        kept = sidx.positions[keep]
        nbs = np.zeros(len(bs), np.int64)
        np.cumsum(np.minimum(counts, cfg.hits_per_seed), out=nbs[1:])
        sidx = seeds.SeedIndex(cfg.seed_len, kept.astype(np.int32),
                               nbs.astype(np.int32))
        os.makedirs(CACHE_DIR, exist_ok=True)
        np.savez(cache, buffer=st.buffer, starts=st.starts,
                 lengths=st.lengths, positions=sidx.positions,
                 bucket_starts=sidx.bucket_starts)
    shard = diskio.IndexShard(st, sidx)
    return diskio.stack_shards([shard], cfg.seed_len), st


def bench_end_to_end():
    """reads/s through the async software-pipelined operative path against
    the config-2-true DB (570k seqs, k=5). Wall-clock protocol: the
    pipeline overlaps host work with device work, so wall time IS the
    operative metric here (per-batch time ~180 ms >> the 4 ms floor)."""
    from ghostm_tpu.config import Config
    from ghostm_tpu.engine import SearchEngine
    from ghostm_tpu.ops.encode import AA_ALPHABET, encode_dna
    from tools.simulate import reads_from_proteins

    rng = np.random.default_rng(1)
    R = 4096
    cfg = Config(query_batch=R, seed_len=5, hits_per_seed=128)
    index, st = _build_config2_index(cfg)
    eng = SearchEngine(cfg, index)

    pick = rng.integers(0, len(st.starts), 64)
    prots = []
    for p in pick:
        s0, ln = int(st.starts[p]), int(st.lengths[p])
        prots.append("".join(AA_ALPHABET[c] for c in st.buffer[s0:s0 + ln]))
    names, reads = reads_from_proteins(rng, prots, R, read_len=100)
    dna = np.full((R, 100), 4, np.int8)
    lens = np.zeros(R, np.int32)
    for i, rd in enumerate(reads):
        c = encode_dna(rd)
        dna[i, : len(c)] = c
        lens[i] = len(c)
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
    fused_gcups = bench_fused_step()
    print(f"# fused step: {fused_gcups:.1f} GCUPS ({time.time()-t0:.0f}s)",
          file=sys.stderr, flush=True)
    reads_per_s, max_score = bench_end_to_end()
    print(f"# e2e: {reads_per_s:.0f} reads/s ({time.time()-t0:.0f}s)",
          file=sys.stderr, flush=True)
    out = {
        "metric": "sw_gcups",
        "value": round(fused_gcups, 2),
        "unit": "GCUPS",
        # BASELINE roofline target is defined on the DP kernel proper;
        # `value` stays the operative end-to-end align path
        "vs_baseline": round(kernel_gcups / spec_roofline, 4),
        "kernel_gcups": round(kernel_gcups, 2),
        "roofline_gcups": round(spec_roofline, 1),
        "fused_step_gcups": round(fused_gcups, 2),
        "reads_per_s": round(reads_per_s, 1),
        "e2e_db": "570k seqs / ~200M residues, k=5 (config-2-true)",
        "bench_wall_s": round(time.time() - t0, 1),
    }
    probe = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "VPU_PROBE.json")
    if os.path.exists(probe):
        # Caveat: the chain probe's run-to-run variance on this shared
        # tunnel host is large (int32 read 0.75 then 3.35 Tops/s in two
        # runs); the SW kernel slope timings are stable (+-2%), so the
        # spec roofline stays the binding denominator and this is a
        # recorded cross-check, not a ceiling.
        with open(probe) as f:
            vp = json.load(f)
        i32 = vp.get("dtypes", {}).get("int32", {}).get("tops_per_s")
        if i32:
            out["measured_vpu_tops"] = i32
            out["roofline_measured_gcups"] = round(i32 * 1e12 / OPS_PER_CELL
                                                   / 1e9, 1)
            out["vs_measured"] = round(
                kernel_gcups / out["roofline_measured_gcups"], 4)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    sys.exit(main())
