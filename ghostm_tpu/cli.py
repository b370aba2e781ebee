"""CLI — `ghostm_tpu db` / `ghostm_tpu aln` (SURVEY.md §2 "CLI & modes").

Flag vocabulary follows the GHOSTM family convention (`db -i in.fa -o prefix`,
`aln -d prefix -i reads.fa -o out.tsv`; SURVEY.md §5.6 — mount empty, flags
are family convention, to be re-verified when the reference appears).
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import time

import numpy as np

from ghostm_tpu.config import Config
from ghostm_tpu.utils.logging import setup_logging

log = logging.getLogger("ghostm_tpu")


def _add_common(p):
    p.add_argument("-k", "--seed-len", type=int, default=None)
    p.add_argument("--config", type=str, default=None, help="JSON config file")
    p.add_argument("--log-json", action="store_true")
    p.add_argument("-v", "--verbose", action="store_true")
    p.add_argument("--debug-nans", action="store_true",
                   help="enable jax_debug_nans (SURVEY.md §5.2 sanitizers)")
    p.add_argument("--cpu", type=int, nargs="?", const=8, default=None,
                   metavar="N",
                   help="force the CPU backend with N virtual devices "
                        "(default 8) — for mesh testing without a pod; "
                        "overrides the site-forced TPU platform")


def _config_from_args(args, **overrides) -> Config:
    base = {}
    if args.config:
        with open(args.config) as f:
            base = json.load(f)
    if args.seed_len is not None:
        base["seed_len"] = args.seed_len
    base.update({k: v for k, v in overrides.items() if v is not None})
    return Config(**base)


def cmd_db(args) -> int:
    from ghostm_tpu.index import diskio, seeds, store
    from ghostm_tpu.io.fasta import iter_fasta

    import numpy as np

    from ghostm_tpu.ops.encode import encode_aa

    cfg = _config_from_args(args, shards=args.shards)
    t0 = time.time()
    records = list(iter_fasta(args.input))
    log.info("read %d subjects (%.1fs)", len(records), time.time() - t0)
    # Global per-k-mer bucket truncation BEFORE sharding, so the surviving
    # seed set (and all downstream votes) is shard-layout invariant
    # (SURVEY.md §7.2; index/seeds.py global_bucket_truncation).
    keep = seeds.global_bucket_truncation(
        [encode_aa(seq) for _, seq in records], cfg.seed_len, cfg.hits_per_seed
    )
    assign = store.shard_records(records, cfg.shards)
    shards = []
    for ids in assign:
        st = store.build_store(
            [records[i] for i in ids], cfg.sentinel_pad, subject_ids=ids
        )
        keep_buf = np.zeros(len(st.buffer), dtype=bool)
        for r, gi in enumerate(ids):
            kp = keep[gi]
            keep_buf[st.starts[r] : st.starts[r] + len(kp)] = kp
        shards.append(
            diskio.IndexShard(
                st, seeds.build_seed_index(st.buffer, cfg.seed_len, keep_buf)
            )
        )
    diskio.save_index(args.output, shards, cfg.seed_len)
    log.info(
        "index written: %d shards, %d residues, %.1fs",
        len(shards),
        sum(s.store.total_residues for s in shards),
        time.time() - t0,
    )
    return 0


def cmd_aln(args) -> int:
    from ghostm_tpu.engine import SearchEngine
    from ghostm_tpu.index.diskio import load_index
    from ghostm_tpu.io.fasta import read_batches
    from ghostm_tpu.pipeline import run_search

    cfg = _config_from_args(
        args,
        band_width=args.band,
        candidates_per_frame=args.candidates,
        max_hits=args.max_hits,
        evalue_cutoff=args.evalue,
        query_batch=args.batch,
        matrix=args.matrix,
        gap_open=args.gap_open,
        gap_extend=args.gap_extend,
        profile_dir=args.profile,
        checkpoint_batches=args.checkpoint_batches,
        chain_gamma=args.chain_gamma,
        check=args.check or None,
        data_axis=args.data_axis,
        db_axis=args.db_axis,
    )
    mesh = None
    if cfg.data_axis * cfg.db_axis > 1 or args.num_processes:
        from ghostm_tpu.parallel.mesh import make_mesh

        # jax.distributed.initialize already ran in main() (it must precede
        # any backend-initialising JAX call)
        mesh = make_mesh(cfg.data_axis, cfg.db_axis)
    index = load_index(args.db)
    if cfg.seed_len != index.seed_len:
        cfg = cfg.replace(seed_len=index.seed_len)
    engine = SearchEngine(cfg, index, use_pallas=args.pallas, mesh=mesh)
    n = run_search(
        engine,
        read_batches(args.input, cfg.query_batch, args.max_read_len),
        args.output,
        resume=args.resume,
    )
    log.info("wrote %d hit rows -> %s", n, args.output)
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="ghostm_tpu",
        description="TPU-native metagenomic homology search (GHOSTM-class)",
    )
    sub = ap.add_subparsers(dest="mode", required=True)

    pd = sub.add_parser("db", help="build a database index")
    pd.add_argument("-i", "--input", required=True, help="protein FASTA")
    pd.add_argument("-o", "--output", required=True, help="index prefix")
    pd.add_argument("--shards", type=int, default=None)
    _add_common(pd)
    pd.set_defaults(fn=cmd_db)

    pa = sub.add_parser("aln", help="search reads against an index")
    pa.add_argument("-d", "--db", required=True, help="index prefix")
    pa.add_argument("-i", "--input", required=True, help="DNA reads FASTA/FASTQ")
    pa.add_argument("-o", "--output", required=True, help="output TSV")
    pa.add_argument("-b", "--band", type=int, default=None)
    pa.add_argument("-n", "--candidates", type=int, default=None)
    pa.add_argument("--max-hits", type=int, default=None)
    pa.add_argument("-e", "--evalue", type=float, default=None)
    pa.add_argument("--matrix", type=str, default=None,
                    help="substitution matrix (BLOSUM45/50/62/80/90, "
                         "PAM30/70/250); pair with gap penalties that have "
                         "published Karlin-Altschul fits")
    pa.add_argument("--gap-open", type=int, default=None)
    pa.add_argument("--gap-extend", type=int, default=None)
    pa.add_argument("--batch", type=int, default=None)
    pa.add_argument("--max-read-len", type=int, default=120)
    pa.add_argument("--chain-gamma", type=int, default=None,
                    help="> 0: collinear seed chaining with this drift "
                         "penalty (long-read mode, SURVEY.md §5.7)")
    pa.add_argument("--pallas", action=argparse.BooleanOptionalAction, default=None)
    pa.add_argument("--profile", type=str, default=None, help="profiler trace dir")
    pa.add_argument("--check", action="store_true",
                    help="checkify debug mode: re-run each batch's search "
                         "math with OOB-index/NaN checks (SURVEY.md §5.2)")
    pa.add_argument("--resume", action="store_true",
                    help="resume from per-batch checkpoint parts")
    pa.add_argument("--checkpoint-batches", type=int, default=None,
                    help=">0: write results in per-batch parts with a cursor")
    # distribution (SURVEY.md §2.1): mesh axes + multi-host bootstrap
    pa.add_argument("--data-axis", type=int, default=None,
                    help="mesh size along 'data' (query data-parallel)")
    pa.add_argument("--db-axis", type=int, default=None,
                    help="mesh size along 'db' (index shards across devices)")
    pa.add_argument("--coordinator", type=str, default=None,
                    help="host:port for jax.distributed (multi-host)")
    pa.add_argument("--num-processes", type=int, default=None)
    pa.add_argument("--process-id", type=int, default=None)
    _add_common(pa)
    pa.set_defaults(fn=cmd_aln)

    args = ap.parse_args(argv)
    setup_logging(json_lines=args.log_json, verbose=args.verbose)
    if args.cpu:
        # env vars alone cannot force CPU here: the site config re-selects
        # the TPU tunnel in every interpreter (see tests/conftest.py)
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={args.cpu}"
            ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
    if getattr(args, "num_processes", None):
        # must run before ANY backend-initialising JAX call
        import jax

        if args.cpu:
            try:  # CPU multi-process collectives run over gloo
                jax.config.update(
                    "jax_cpu_collectives_implementation", "gloo"
                )
            except Exception:
                pass
        from ghostm_tpu.parallel.mesh import init_distributed

        init_distributed(args.coordinator, args.num_processes,
                         args.process_id)
    _enable_compile_cache()
    if args.debug_nans:
        import jax

        jax.config.update("jax_debug_nans", True)
    return args.fn(args)


def _enable_compile_cache():
    """Persistent XLA compilation cache: first-compile of the search step
    costs minutes on remote-compile TPU setups; cached re-runs are instant."""
    try:
        import jax

        cache = os.environ.get(
            "GHOSTM_TPU_COMPILE_CACHE",
            os.path.expanduser("~/.cache/ghostm_tpu_jax"),
        )
        if cache:
            os.makedirs(cache, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


if __name__ == "__main__":
    sys.exit(main())
