"""Ad-hoc stage profiler: times propose / select / align / merge on the
bench_end_to_end workload (config-2-style). Not part of the test suite."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from ghostm_tpu.config import Config
from ghostm_tpu.engine import (
    SearchEngine, propose_shard_jit, align_shard_jit, _select_jit,
    _merge_rank_jit, NFRAMES,
)
from ghostm_tpu.index import diskio, seeds, store
from ghostm_tpu.ops.encode import encode_aa, encode_dna
from tools.simulate import random_proteins, reads_from_proteins


def timed(f, reps=5):
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


def main():
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
            kb[st.starts[r]: st.starts[r] + len(keep[gi])] = keep[gi]
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
    qc = eng.translate(dna, lens)
    qflat = jnp.asarray(qc.reshape(R * NFRAMES, cfg.query_frame_len))
    d = eng.shard_dev[0]
    C = cfg.candidates_per_frame

    M = (cfg.query_frame_len - cfg.seed_len + 1) * eng.expand
    print(f"expand={eng.expand} M={M} rows={R*NFRAMES}", flush=True)

    # inside propose: sort alone
    from ghostm_tpu.kernels.sort import sort_rows
    keys = jnp.asarray(
        rng.integers(0, 1 << 28, (R * NFRAMES, M)).astype(np.int32))
    t_sort = timed(lambda: sort_rows(keys))
    print(f"sort   : {t_sort*1e3:8.1f} ms", flush=True)
    del keys

    t_prop = timed(lambda: propose_shard_jit(
        qflat, d["bucket_starts"], d["tab_main"], d["tab_aux"],
        d["subject_ids"], **eng._propose_static))
    print(f"propose: {t_prop*1e3:8.1f} ms", flush=True)
    pg, pb, pv = propose_shard_jit(
        qflat, d["bucket_starts"], d["tab_main"], d["tab_aux"],
        d["subject_ids"], **eng._propose_static)
    t_sel = timed(lambda: _select_jit(pg, pb, pv, C))
    print(f"select : {t_sel*1e3:8.1f} ms", flush=True)
    sel_g, sel_b = _select_jit(pg, pb, pv, C)
    t_align = timed(lambda: align_shard_jit(
        qflat, d["buffer"], d["starts"], d["subject_ids"], d["lengths"],
        eng.matrix, sel_g, sel_b, **eng._align_static))
    print(f"align  : {t_align*1e3:8.1f} ms", flush=True)
    outs = align_shard_jit(
        qflat, d["buffer"], d["starts"], d["subject_ids"], d["lengths"],
        eng.matrix, sel_g, sel_b, **eng._align_static)
    stacked = [jnp.stack([x]) for x in outs]
    t_merge = timed(lambda: _merge_rank_jit(stacked, sel_g, R, cfg.max_hits))
    print(f"merge  : {t_merge*1e3:8.1f} ms", flush=True)

    total = t_prop + t_sel + t_align + t_merge
    print(f"total  : {total*1e3:8.1f} ms -> {R/total:.0f} reads/s (device only)")


if __name__ == "__main__":
    main()
