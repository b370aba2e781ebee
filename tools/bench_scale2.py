"""Config-2-scale shakeout (BASELINE.json:8 / VERDICT r01 missing #3):
~570k synthetic proteins / ~200M residues, k=5 index with hits_per_seed
128, one real search batch on the chip. Reports index-build stats, table
sizes (the k=5 memory plan), and measured reads/s.

Usage: python tools/bench_scale2.py [--seqs 570000] [--batches 2]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fast_proteins(rng, n, lo=250, hi=450):
    """n random protein sequences as one concatenated codes buffer +
    lengths (vectorised; the per-sequence python loop would take minutes
    at 570k sequences)."""
    lens = rng.integers(lo, hi, n).astype(np.int64)
    total = int(lens.sum())
    codes = rng.integers(0, 20, total).astype(np.int8)
    return codes, lens


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seqs", type=int, default=570000)
    ap.add_argument("--batches", type=int, default=2)
    ap.add_argument("--reads", type=int, default=4096)
    args = ap.parse_args()

    from ghostm_tpu.cli import _enable_compile_cache
    from ghostm_tpu.config import Config
    from ghostm_tpu.engine import SearchEngine
    from ghostm_tpu.index import diskio, seeds
    from ghostm_tpu.index.store import SubjectStore
    from ghostm_tpu.ops.encode import SENTINEL

    _enable_compile_cache()
    rng = np.random.default_rng(7)
    cfg = Config(seed_len=5, hits_per_seed=128, query_batch=args.reads)

    t0 = time.time()
    codes, lens = fast_proteins(rng, args.seqs)
    print(f"proteins: {args.seqs} seqs, {len(codes)/1e6:.0f}M residues "
          f"({time.time()-t0:.1f}s)", flush=True)

    # build the store directly from codes (store.build_store's per-record
    # python loop is too slow at this scale)
    t0 = time.time()
    pad = cfg.sentinel_pad
    n = args.seqs
    starts = np.zeros(n, np.int64)
    np.cumsum(lens[:-1] + pad, out=starts[1:])
    total = int(starts[-1] + lens[-1] + pad)
    buf = np.full(total, SENTINEL, np.int8)
    pos_iota = np.arange(total, dtype=np.int64)
    row = np.searchsorted(starts, pos_iota, side="right") - 1
    off = pos_iota - starts[row]
    inside = off < lens[row]
    buf[inside] = codes
    st = SubjectStore(
        buffer=buf,
        starts=starts.astype(np.int64),
        lengths=lens.astype(np.int64),
        names=[f"s{i}" for i in range(n)],
        subject_ids=np.arange(n, dtype=np.int64),
    )
    print(f"store built ({time.time()-t0:.1f}s)", flush=True)

    t0 = time.time()
    # single shard: global bucket truncation == capping each CSR bucket at
    # hits_per_seed in position order
    sidx = seeds.build_seed_index(buf, cfg.seed_len)
    bs = np.asarray(sidx.bucket_starts, np.int64)
    counts = np.diff(bs)
    keepmask = (np.arange(len(sidx.positions), dtype=np.int64)
                - np.repeat(bs[:-1], counts)) < cfg.hits_per_seed
    kept = sidx.positions[keepmask]
    nbs = np.zeros(len(bs), np.int64)
    np.cumsum(np.minimum(counts, cfg.hits_per_seed), out=nbs[1:])
    sidx = seeds.SeedIndex(cfg.seed_len, kept.astype(np.int32),
                           nbs.astype(np.int32))
    print(f"seed index: {len(sidx.positions)/1e6:.0f}M positions, "
          f"max bucket {int(np.diff(sidx.bucket_starts).max())} "
          f"({time.time()-t0:.1f}s)", flush=True)

    shard = diskio.IndexShard(st, sidx)
    index = diskio.stack_shards([shard], cfg.seed_len)

    t0 = time.time()
    eng = SearchEngine(cfg, index)
    tab_bytes = sum(
        (0 if d["tab_main"] is None else d["tab_main"].size * 4)
        + d["tab_aux"].size * 4
        for d in eng.shard_dev
    )
    print(f"engine up: table_width={eng._table_width}, fused_tables="
          f"{eng._propose_static['fuse_tables']}, tables {tab_bytes/1e9:.2f} GB, "
          f"expand={eng.expand} ({time.time()-t0:.1f}s)", flush=True)

    # reads sampled from the protein buffer (reverse-translation-free:
    # generate DNA from sampled peptides via simulate's codon table is
    # slow at this volume; random reads exercise the full pipeline cost,
    # real ones only change hit density)
    from tools.simulate import reads_from_proteins
    from ghostm_tpu.ops.encode import AA_ALPHABET, encode_dna
    pick = rng.integers(0, n, 64)
    prots = []
    for p in pick:
        s0, ln = int(starts[p]), int(lens[p])
        prots.append("".join(AA_ALPHABET[c] for c in buf[s0:s0+ln]))
    names, reads = reads_from_proteins(rng, prots, args.reads, read_len=100)
    dna = np.full((args.reads, 100), 4, np.int8)
    rl = np.zeros(args.reads, np.int32)
    for i, rd in enumerate(reads):
        c = encode_dna(rd)
        dna[i, :len(c)] = c
        rl[i] = len(c)

    qc = eng.translate(dna, rl)
    t0 = time.time()
    hits = eng.search_batch(qc)      # compile + first batch
    print(f"first batch (compile): {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    for _ in range(args.batches):
        hits = eng.search_batch(qc)
    dt = (time.time() - t0) / args.batches
    top = hits.gsid[:, 0]
    want = np.array([int(pick[int(names[i].split("_from_subj")[1])])
                     for i in range(args.reads)])
    acc = float((top == want).mean())
    out = {
        "seqs": n, "residues": int(len(codes)), "k": cfg.seed_len,
        "hits_per_seed": cfg.hits_per_seed,
        "table_width": eng._table_width,
        "table_gb": round(tab_bytes / 1e9, 2),
        "reads_per_s": round(args.reads / dt, 1),
        "top1_acc": round(acc, 4),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
