"""Micro-profiler for the propose phase internals. Not part of the suite."""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from ghostm_tpu.config import Config
from ghostm_tpu.engine import SearchEngine, NFRAMES, _round_up
from ghostm_tpu.index import diskio, seeds, store
from ghostm_tpu.kernels import seed_lookup
from ghostm_tpu.kernels import candidates as cand_mod
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
    qflat = jnp.asarray(
        qc.reshape(R * NFRAMES, cfg.query_frame_len).astype(np.int32))
    d = eng.shard_dev[0]
    ps = eng._propose_static
    seed_len, expand, band = ps["seed_len"], ps["expand"], ps["band"]
    ncand, min_votes, nbins = ps["ncand"], ps["min_votes"], ps["nbins"]
    Qf, Lq = qflat.shape
    half = band // 2
    rowbase, localoff = d["rowbase"], d["localoff"]
    bucket_starts = d["bucket_starts"]
    subject_ids = d["subject_ids"]

    WIDTH = 64
    nrows = -(-expand // WIDTH) + 1
    ptab = rowbase * half + localoff + Lq
    pad = (-ptab.shape[0]) % WIDTH + nrows * WIDTH
    ptab2 = jnp.concatenate([ptab, jnp.zeros(pad, jnp.int32)]).reshape(-1, WIDTH)
    qpos = jnp.arange(Lq, dtype=jnp.int32)[None, :, None]

    @jax.jit
    def build_keys(qc_):
        kmers = seed_lookup.query_kmer_keys(qc_, seed_len)
        start = bucket_starts[kmers]
        count = bucket_starts[kmers + 1] - start
        offs = jnp.arange(expand, dtype=jnp.int32)
        valid = offs < count[..., None]
        gl = start.reshape(-1)
        r = gl // WIDTH
        o = gl - r * WIDTH
        w2 = jnp.concatenate([ptab2[r + i] for i in range(nrows)], axis=1)
        dd = WIDTH // 2
        while dd >= 1:
            w2 = jnp.where((o[:, None] & dd) != 0, jnp.roll(w2, -dd, axis=1), w2)
            dd //= 2
        tg = w2[:, :expand].reshape(qc_.shape[0], Lq, expand)
        keys = jnp.where(valid, (tg - qpos) // half, cand_mod.BIG)
        return keys.reshape(qc_.shape[0], Lq * expand)

    @jax.jit
    def gather_only(qc_):
        kmers = seed_lookup.query_kmer_keys(qc_, seed_len)
        start = bucket_starts[kmers]
        gl = start.reshape(-1)
        r = gl // WIDTH
        w2 = jnp.concatenate([ptab2[r + i] for i in range(nrows)], axis=1)
        return w2

    per_frame = Lq * expand * 4
    qchunk = max(128, min(Qf, (64 << 20) // per_frame // 128 * 128))
    print(f"Qf={Qf} Lq={Lq} expand={expand} qchunk={qchunk}", flush=True)
    qcs = qflat[:qchunk]

    t_keys = timed(lambda: build_keys(qcs))
    print(f"build_keys/chunk : {t_keys*1e3:8.2f} ms "
          f"(x{-(-Qf // qchunk)} chunks = {t_keys*1e3 * (Qf/qchunk):.1f})",
          flush=True)
    t_g = timed(lambda: gather_only(qcs))
    print(f"  gather only    : {t_g*1e3:8.2f} ms", flush=True)

    keys = build_keys(qcs)

    from ghostm_tpu.kernels.sort import sort_rows
    t_sort = timed(lambda: sort_rows(keys))
    print(f"sort/chunk       : {t_sort*1e3:8.2f} ms "
          f"(= {t_sort*1e3 * (Qf/qchunk):.1f} total)", flush=True)

    sorted_keys = sort_rows(keys)

    @jax.jit
    def rank_only(sk):
        fn = functools.partial(
            cand_mod._per_query, nbins=nbins, ncand=ncand,
            min_votes=max(min_votes, 1), smooth=False,
        )
        return jax.vmap(fn)(sk)

    t_rank = timed(lambda: rank_only(sorted_keys))
    print(f"rank/chunk       : {t_rank*1e3:8.2f} ms "
          f"(= {t_rank*1e3 * (Qf/qchunk):.1f} total)", flush=True)

    @jax.jit
    def full(qc_):
        return cand_mod.vote_and_rank.__wrapped__(
            build_keys(qc_), subject_ids, ncand, max(min_votes, 1),
            False, nbins, True,
        )

    t_full = timed(lambda: full(qcs))
    print(f"fused full/chunk : {t_full*1e3:8.2f} ms "
          f"(= {t_full*1e3 * (Qf/qchunk):.1f} total)", flush=True)


if __name__ == "__main__":
    main()
