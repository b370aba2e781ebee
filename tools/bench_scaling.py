"""Scaling-efficiency harness (BASELINE.json: ">= 85% reads/s scaling
efficiency", measured at 1 chip / 1 host / N hosts; BASELINE.md protocol:
efficiency(N) = reads_per_s(N) / (N * reads_per_s(1)) at the SAME
per-device query workload — weak scaling over the "data" mesh axis).

Without pod hardware this runs on the virtual CPU mesh
(--xla_force_host_platform_device_count), which proves the METHODOLOGY and
the collective structure but not real ICI scaling — virtual devices share
the same host cores, so CPU efficiencies are a lower bound and are labeled
as such in the artifact. On a real pod slice run with --tpu.

Usage:
  python tools/bench_scaling.py [--axes 1,2,4,8] [--db-axis 1]
      [--per-device 512] [--reps 3] [--tpu] [-o SCALING.json]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_workload(cfg, n_proteins=2000, n_reads=4096, seed=1, n_shards=1):
    from ghostm_tpu.index import diskio, seeds, store
    from ghostm_tpu.ops.encode import encode_aa, encode_dna
    from tools.simulate import random_proteins, reads_from_proteins

    rng = np.random.default_rng(seed)
    prots = random_proteins(rng, n_proteins, lo=150, hi=450)
    records = [(f"s{i}", p.encode()) for i, p in enumerate(prots)]
    keep = seeds.global_bucket_truncation(
        [encode_aa(s) for _, s in records], cfg.seed_len, cfg.hits_per_seed
    )
    assign = store.shard_records(records, n_shards)
    shards = []
    for ids in assign:
        st = store.build_store(
            [records[i] for i in ids], cfg.sentinel_pad, subject_ids=ids
        )
        kb = np.zeros(len(st.buffer), dtype=bool)
        for r, gi in enumerate(ids):
            kb[st.starts[r]: st.starts[r] + len(keep[gi])] = keep[gi]
        shards.append(diskio.IndexShard(
            st, seeds.build_seed_index(st.buffer, cfg.seed_len, kb)
        ))
    index = diskio.stack_shards(shards, cfg.seed_len)
    names, reads = reads_from_proteins(rng, prots, n_reads, read_len=100)
    dna = np.full((n_reads, 100), 4, np.int8)
    lens = np.zeros(n_reads, np.int32)
    for i, rd in enumerate(reads):
        c = encode_dna(rd)
        dna[i, : len(c)] = c
        lens[i] = len(c)
    return index, dna, lens


def _make_runner(index, dna, lens, cfg, data_axis, db_axis, use_pallas):
    """Build an engine for (data_axis, db_axis) and return a zero-arg
    timed-step callable (inputs prebuilt, warmup/compile done)."""
    from ghostm_tpu.engine import SearchEngine
    from ghostm_tpu.parallel.mesh import make_mesh

    mesh = (
        make_mesh(data_axis, db_axis)
        if data_axis * db_axis > 1 else None
    )
    eng = SearchEngine(cfg, index, use_pallas=use_pallas, mesh=mesh)
    idx = np.resize(np.arange(len(dna)), cfg.query_batch)
    qc = eng.translate(dna[idx], lens[idx])
    eng.search_batch(qc)                       # warmup/compile
    return lambda: eng.search_batch(qc)


def measure_pair(index, dna, lens, cfg, data_axis, db_axis, use_pallas,
                 reps):
    """Best-of-reps step time for the MESH program and the SOLO program
    (same TOTAL batch, one device, no mesh/collectives), with reps
    INTERLEAVED mesh/solo/mesh/solo so slow machine drift hits both
    equally (ADVICE r02: sequential runs showed a ~20% drift floor).

    projected_efficiency = t_solo / t_mesh isolates the cost the sharded
    program ADDS (partitioning + collectives + merge) — on a virtual CPU
    mesh where N devices share the host's cores, ideal weak scaling is
    flat total throughput, so this ratio is the honest single-host proxy
    for pod scaling efficiency. At data_axis*db_axis == 1 both programs
    are configuration-identical and the ratio is the measured NOISE FLOOR
    of the protocol, reported as such."""
    run_mesh = _make_runner(index, dna, lens, cfg, data_axis, db_axis,
                            use_pallas)
    run_solo = _make_runner(index, dna, lens, cfg, 1, 1, use_pallas)
    best_m = best_s = float("inf")
    for _ in range(reps):
        t = time.time()
        run_mesh()
        best_m = min(best_m, time.time() - t)
        t = time.time()
        run_solo()
        best_s = min(best_s, time.time() - t)
    batch = cfg.query_batch
    return batch / best_m, batch / best_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--axes", default="1,2,4,8")
    ap.add_argument("--db-axis", type=int, default=1)
    ap.add_argument("--per-device", type=int, default=512)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--tpu", action="store_true",
                    help="use the real TPU backend (default: virtual CPU mesh)")
    ap.add_argument("-o", "--output", default="SCALING.json")
    args = ap.parse_args()
    axes = [int(a) for a in args.axes.split(",")]

    if not args.tpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
        need = max(axes) * args.db_axis
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={need}"
            ).strip()
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax

    from ghostm_tpu.cli import _enable_compile_cache
    from ghostm_tpu.config import Config

    _enable_compile_cache()
    ndev = len(jax.devices())
    base = Config(seed_len=4, hits_per_seed=32)
    index, dna, lens = build_workload(base, n_shards=args.db_axis)
    rows = []
    r1 = None
    for ax in axes:
        if ax * args.db_axis > ndev:
            print(f"skip axis {ax}: needs {ax*args.db_axis} devices, "
                  f"have {ndev}", file=sys.stderr)
            continue
        cfg = base.replace(
            query_batch=args.per_device * ax,
            data_axis=ax, db_axis=args.db_axis,
        )
        rps, solo = measure_pair(index, dna, lens, cfg, ax, args.db_axis,
                                 use_pallas=args.tpu, reps=args.reps)
        if r1 is None:
            r1 = rps / ax   # per-"host" baseline at the first axis
        row = {
            "data_axis": ax,
            "db_axis": args.db_axis,
            "reads_per_s": round(rps, 1),
            "efficiency": round(rps / (ax * r1), 4),
        }
        if not args.tpu:
            # virtual devices share one host's cores, so rps(N)/(N*rps(1))
            # is ~1/N even with zero collective cost; the honest metric is
            # what sharding ADDS vs the same total work unsharded.
            row["solo_reads_per_s"] = round(solo, 1)
            if ax * args.db_axis == 1:
                # mesh and solo programs are identical here: the ratio is
                # the protocol's measured noise floor, not an efficiency.
                row["noise_floor_ratio"] = round(rps / solo, 4)
            else:
                row["projected_efficiency"] = round(min(rps / solo, 1.0), 4)
        rows.append(row)
        print(json.dumps(rows[-1]), flush=True)
    artifact = {
        "protocol": "weak scaling: per-device batch fixed at "
                    f"{args.per_device}; efficiency = rps(N)/(N*rps(1))"
                    + ("" if args.tpu else
                       "; projected_efficiency = rps_mesh(N devices, total "
                       "batch) / rps_solo(1 device, same total batch) — on "
                       "a core-shared virtual mesh this isolates the "
                       "partitioning+collective overhead the sharded "
                       "program adds, the honest single-host proxy for pod "
                       "scaling efficiency; mesh/solo reps are INTERLEAVED "
                       "so machine drift cancels, and the data_axis=1 row's "
                       "noise_floor_ratio (identical programs) calibrates "
                       "the protocol's residual noise band"),
        "backend": "tpu" if args.tpu else
                   f"virtual CPU mesh ({ndev} devices share one host's "
                   "cores; raw efficiencies are a methodology check / lower "
                   "bound, not ICI scaling — see projected_efficiency)",
        "rows": rows,
    }
    with open(args.output, "w") as f:
        json.dump(artifact, f, indent=2)
    print(f"wrote {args.output}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
