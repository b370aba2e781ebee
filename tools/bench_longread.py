"""Config-5 long-read artifact (BASELINE.json:11, VERDICT r02 missing #4):

1. COMPILED on-chip runs of the fused SW kernel at long-read shapes —
   Lq=1728/band=64 and Lq=3456/band=128 (the shapes the engine's frame
   splitter produces for 5/10 kbp reads) — asserting bit-equality with
   the XLA CPU path on realistic mutated pairs, and recording GCUPS via
   the fori-loop slope protocol (see bench.py).
2. A band-vs-indel-drift breaking-point sweep (CPU, XLA path): banded
   score at the operative band vs a generous band-512 reference on the
   same pairs — documents where a single chained band center stops
   covering indel drift (VERDICT r02 weak #4).

Usage: python tools/bench_longread.py [--skip-tpu] [-o LONGREAD_r03.json]
"""

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def mutate(rng, subj, sub_rate, indel_rate):
    """Query = subject copy with substitutions and (balanced) indels."""
    out = []
    i = 0
    while i < len(subj):
        r = rng.random()
        if r < indel_rate / 2:                  # deletion: skip subject res
            i += 1
            continue
        if r < indel_rate:                      # insertion: emit random res
            out.append(int(rng.integers(0, 20)))
            continue
        c = int(subj[i])
        if rng.random() < sub_rate:
            c = int(rng.integers(0, 20))
        out.append(c)
        i += 1
    return np.asarray(out, np.int8)


def make_pairs(rng, n, lq, band, sub_rate, indel_rate):
    """(qs, ws) int32: query rows + windows with the query's source region
    starting at window offset band//2 (centered band)."""
    h = band // 2
    wlen = lq + band
    qs = np.zeros((n, lq), np.int32)
    ws = np.zeros((n, wlen), np.int32)
    for k in range(n):
        subj = rng.integers(0, 20, wlen).astype(np.int8)
        q = mutate(rng, subj[h : h + lq + 64], sub_rate, indel_rate)[:lq]
        if len(q) < lq:
            q = np.concatenate(
                [q, rng.integers(0, 20, lq - len(q)).astype(np.int8)]
            )
        qs[k] = q
        ws[k] = subj
    return qs, ws


def cpu_banded(qs, ws, band):
    """XLA CPU reference path (sw_xla) on the host CPU backend."""
    import jax
    import jax.numpy as jnp

    from ghostm_tpu.kernels import sw_xla
    from ghostm_tpu.ops.scoring import padded_matrix

    n = qs.shape[0]
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        mat = jnp.asarray(padded_matrix())
        g0 = jnp.zeros(n, jnp.int32)
        lo = jnp.zeros(n, jnp.int32)
        hi = jnp.full(n, 1 << 20, jnp.int32)
        sc = sw_xla.banded_scores_i8(
            jnp.asarray(qs), jnp.asarray(ws), mat, band, g0, lo, hi
        )
        s, ie, be = sw_xla.sw_banded(sc, 11, 1)
        return np.asarray(s), np.asarray(ie), np.asarray(be)


def tpu_fused(qs, ws, band, interpret=False):
    import jax.numpy as jnp

    from ghostm_tpu.kernels import sw_fused
    from ghostm_tpu.ops.scoring import padded_matrix

    words, climit = sw_fused.build_packed_matrix(padded_matrix())
    n = qs.shape[0]
    lo = jnp.zeros(n, jnp.int32)
    hi = jnp.full(n, 1 << 20, jnp.int32)
    s, ie, be = sw_fused.sw_fused_wave(
        jnp.asarray(qs), jnp.asarray(ws), words, lo, hi, 11, 1, band,
        code_limit=climit, interpret=interpret,
    )
    return np.asarray(s), np.asarray(ie), np.asarray(be)


def tpu_gcups(qs, ws, band):
    """fori-loop slope timing of the full fused path at this shape."""
    import jax
    import jax.numpy as jnp

    from ghostm_tpu.kernels import sw_fused
    from ghostm_tpu.ops.scoring import padded_matrix

    words, climit = sw_fused.build_packed_matrix(padded_matrix())
    n, lq = qs.shape
    qj, wj = jnp.asarray(qs), jnp.asarray(ws)
    lo = jnp.zeros(n, jnp.int32)
    hi = jnp.full(n, 1 << 20, jnp.int32)

    @jax.jit
    def reps(m):
        def body(i, acc):
            s, _, _ = sw_fused.sw_fused_wave(
                qj ^ (i & 1), wj, words, lo, hi, 11, 1, band,
                code_limit=climit,
            )
            return acc + s[0]

        return jax.lax.fori_loop(0, m, body, jnp.int32(0))

    def timed(m):
        np.asarray(reps(jnp.int32(m)))
        best = float("inf")
        for _ in range(3):
            t = time.time()
            np.asarray(reps(jnp.int32(m)))
            best = min(best, time.time() - t)
        return best

    n1, n2 = 2, 10
    per = (timed(n2) - timed(n1)) / (n2 - n1)
    return n * lq * band / per / 1e9, per * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-tpu", action="store_true",
                    help="breaking-point sweep only (CPU)")
    ap.add_argument("--n-eq", type=int, default=256)
    ap.add_argument("--n-perf", type=int, default=2048)
    ap.add_argument("--n-sweep", type=int, default=48)
    ap.add_argument("-o", "--output", default="LONGREAD_r03.json")
    args = ap.parse_args()
    if args.skip_tpu:
        # don't claim the single-client axon tunnel for a CPU-only sweep
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
        import jax

        jax.config.update("jax_platforms", "cpu")
    from ghostm_tpu.cli import _enable_compile_cache

    _enable_compile_cache()
    rng = np.random.default_rng(5)
    art = {"shapes": [], "breaking_point": []}

    if not args.skip_tpu:
        for lq, band in ((1728, 64), (3456, 128)):
            qs, ws = make_pairs(rng, args.n_eq, lq, band, 0.05, 0.02)
            want = cpu_banded(qs, ws, band)
            got = tpu_fused(qs, ws, band)
            eq = all(bool(np.array_equal(a, b)) for a, b in zip(want, got))
            qs2, ws2 = make_pairs(rng, 128, lq, band, 0.05, 0.02)
            qs2 = np.resize(qs2, (args.n_perf, lq))
            ws2 = np.resize(ws2, (args.n_perf, lq + band))
            gc, ms = tpu_gcups(qs2, ws2, band)
            row = {"lq": lq, "band": band, "n_eq": args.n_eq,
                   "tpu_equals_cpu": eq, "n_perf": args.n_perf,
                   "gcups": round(gc, 2), "ms_per_call": round(ms, 3)}
            art["shapes"].append(row)
            print(json.dumps(row), flush=True)

    # breaking point: banded score vs generous band-512 reference (CPU).
    # band 32 + high indel rates are included to make the knee visible:
    # drift is a +-1 random walk over ~indel*Lq steps (sigma ~ 10-19 at
    # 3-5% on 3.5k frames), so bands >= 64 cover realistic rates and the
    # failure regime only appears at half-band ~ sigma.
    for lq in (1728, 3456):
        for band in (32, 64, 128):
            for indel in (0.01, 0.03, 0.05, 0.08):
                qs, ws = make_pairs(rng, args.n_sweep, lq, 512, 0.05, indel)
                ref_s, _, _ = cpu_banded(qs, ws, 512)
                got_s, _, _ = cpu_banded(qs[:, :lq],
                                         ws[:, 256 - band // 2:
                                            256 - band // 2 + lq + band],
                                         band)
                ratio = float(np.mean(got_s / np.maximum(ref_s, 1)))
                full = float(np.mean(got_s == ref_s))
                row = {"lq": lq, "band": band, "indel": indel,
                       "score_ratio_vs_band512": round(ratio, 4),
                       "frac_exact": round(full, 3)}
                art["breaking_point"].append(row)
                print(json.dumps(row), flush=True)

    art["protocol"] = (
        "shapes: fused Pallas kernel COMPILED on the chip, bit-compared to "
        "the XLA CPU path on mutated pairs (5% subs, 2% indels); GCUPS via "
        "fori-loop slope (dispatch-cancelled). breaking_point: banded score "
        "at the operative band vs band-512 reference on identical pairs, "
        "XLA CPU path; score_ratio < 1 quantifies indel drift escaping a "
        "single chained band center."
    )
    with open(args.output, "w") as f:
        json.dump(art, f, indent=1)
    print(f"wrote {args.output}", flush=True)


if __name__ == "__main__":
    main()
