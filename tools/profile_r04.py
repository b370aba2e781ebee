"""Per-stage profile of the full batch step at config-2-true scale.

VERDICT r03 missing #4 / next #1: >95% of the ~180-650 ms batch step is
propose/select/refine, unprofiled at the operative scale (570k seqs,
~200M residues, k=5, hits_per_seed=128, 4096-read batches). This tool
times each stage as its own jitted program at full batch shapes and
writes PROFILE_r04.json so the optimization work can be aimed.

Timing protocol: plain wall timing (warmup + reps, min) — every stage
measured here costs >> the ~4 ms axon dispatch floor, except where noted
(floor-bounded stages are marked "floor_bounded": true). The fori-loop
slope protocol is NOT used for propose internals because gathers inside
a device loop body run ~12x slower than at top level (engine.py propose
chunk-loop note) — a loop-slope time would not represent the operative
program.
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

import bench
from ghostm_tpu.config import Config
from ghostm_tpu.engine import (
    NFRAMES, SearchEngine, _merge_rank_jit, _round_up, _select_jit,
    propose_shard_jit, align_shard_jit,
)
from ghostm_tpu.kernels import candidates as cand_mod
from ghostm_tpu.kernels import seed_lookup
from ghostm_tpu.kernels.sort import sort_rows
from ghostm_tpu.ops.encode import AA_ALPHABET, encode_dna
from tools.simulate import reads_from_proteins

FLOOR_S = 0.004


def timed(f, reps=3, warm=1, retries=2):
    """Min-of-reps wall time; one retry after a transient remote-compile
    transport failure (the tunnel's compile proxy drops connections
    occasionally — observed: Broken pipe after a ~17 min compile)."""
    for attempt in range(retries + 1):
        try:
            for _ in range(warm):
                jax.block_until_ready(f())
            best = float("inf")
            for _ in range(reps):
                t = time.time()
                jax.block_until_ready(f())
                best = min(best, time.time() - t)
            return best
        except Exception as e:
            if attempt == retries:
                raise
            print(f"# retrying after {type(e).__name__}: {str(e)[:120]}",
                  file=sys.stderr, flush=True)
            time.sleep(20)


def main():
    from ghostm_tpu.cli import _enable_compile_cache

    _enable_compile_cache()
    rng = np.random.default_rng(1)
    R = 4096
    cfg = Config(query_batch=R, seed_len=5, hits_per_seed=128)
    t0 = time.time()
    index, st = bench._build_config2_index(cfg)
    print(f"# index loaded {time.time()-t0:.0f}s", file=sys.stderr, flush=True)
    eng = SearchEngine(cfg, index)
    print(f"# engine init {time.time()-t0:.0f}s", file=sys.stderr, flush=True)

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
    qflat = jnp.asarray(
        qc.reshape(R * NFRAMES, cfg.query_frame_len).astype(np.int32)
    )
    d = eng.shard_dev[0]
    ps = eng._propose_static
    als = eng._align_static
    C = cfg.candidates_per_frame
    Qf, Lq = qflat.shape
    out = {
        "config": {
            "R": R, "Qf": Qf, "Lq": Lq, "seed_len": cfg.seed_len,
            "expand": eng.expand, "table_width": ps["table_width"],
            "table_mode": getattr(eng, "table_mode", "aligned"),
            "presorted_run": ps["presorted_run"],
            "band": cfg.band_width, "ncand": C, "max_hits": cfg.max_hits,
            "db_seqs": int(len(st.starts)),
            "db_residues": int(index.total_residues),
        },
        "stages_ms": {},
        "protocol": "wall min-of-3 per jitted stage; floor ~4 ms/dispatch",
    }

    # ---- full step (the operative program), for the 100% reference ----
    t_full = timed(lambda: eng.search_refine_async(qc), reps=3)
    out["stages_ms"]["full_step"] = round(t_full * 1e3, 2)
    print(f"# full step {t_full*1e3:.1f} ms", file=sys.stderr, flush=True)

    # ---- phase granularity ----
    t_prop = timed(lambda: propose_shard_jit(
        qflat, d["bucket_starts"], d["tab_main"], d["tab_aux"],
        d["subject_ids"], **ps))
    out["stages_ms"]["propose"] = round(t_prop * 1e3, 2)
    print(f"# propose {t_prop*1e3:.1f} ms", file=sys.stderr, flush=True)

    pg, pb, pv = propose_shard_jit(
        qflat, d["bucket_starts"], d["tab_main"], d["tab_aux"],
        d["subject_ids"], **ps)
    uk = als.get("use_pallas", False)
    t_sel = timed(lambda: _select_jit(pg, pb, pv, C, uk))
    out["stages_ms"]["select"] = round(t_sel * 1e3, 2)
    out.setdefault("floor_bounded", []).append("select")

    sel_g, sel_b = _select_jit(pg, pb, pv, C, uk)
    t_align = timed(lambda: align_shard_jit(
        qflat, d["buffer"], d["starts"], d["subject_ids"], d["lengths"],
        eng.matrix, sel_g, sel_b, **als))
    out["stages_ms"]["align"] = round(t_align * 1e3, 2)
    print(f"# align {t_align*1e3:.1f} ms", file=sys.stderr, flush=True)

    # align sub-stages: the one-row overlap-view window fetch at the full
    # candidate count, on its own program
    from ghostm_tpu.engine import fetch_windows

    Cc = sel_g.shape[1]
    Ntot = Qf * Cc
    g0_syn = jnp.asarray(
        (np.random.default_rng(3).integers(
            0, max(int(index.total_residues) - 4096, 1), Ntot)
         ).astype(np.int32))
    fw = jax.jit(functools.partial(
        fetch_windows, lead=eng.lead, wlen=Lq + cfg.band_width))
    t_fw = timed(lambda: fw(d["buffer"], g0_syn))
    out["stages_ms"]["align.fetch_windows"] = round(t_fw * 1e3, 2)
    print(f"# align fetch_windows {t_fw*1e3:.1f} ms",
          file=sys.stderr, flush=True)

    aligned = align_shard_jit(
        qflat, d["buffer"], d["starts"], d["subject_ids"], d["lengths"],
        eng.matrix, sel_g, sel_b, **als)
    stacked = [jnp.stack([x]) for x in aligned]
    t_merge = timed(
        lambda: _merge_rank_jit(stacked, sel_g, R, cfg.max_hits, uk))
    out["stages_ms"]["merge_rank"] = round(t_merge * 1e3, 2)
    out["floor_bounded"].append("merge_rank")

    packed = _merge_rank_jit(stacked, sel_g, R, cfg.max_hits, uk)
    refine_args = []
    for dd in eng.shard_dev:
        refine_args += [dd["buffer"], dd["starts"], dd["lengths"]]
    qc3 = jnp.asarray(qc)
    t_ref = timed(lambda: eng._refine_packed_jit(
        qc3, packed, eng.matrix, *refine_args))
    out["stages_ms"]["refine"] = round(t_ref * 1e3, 2)
    print(f"# refine {t_ref*1e3:.1f} ms", file=sys.stderr, flush=True)

    # ---- propose internals, at one-chunk granularity ----
    expand = eng.expand
    width = ps["table_width"]
    nbins = ps["nbins"]
    half = cfg.band_width // 2
    exp_eff = width if ps.get("direct_tables") else expand
    per_frame = Lq * exp_eff * 4
    qchunk = max(128, min(Qf, (128 << 20) // per_frame // 128 * 128))
    nchunks = -(-Qf // qchunk)
    out["config"]["qchunk"] = qchunk
    out["config"]["nchunks"] = nchunks
    qcs = qflat[:qchunk]
    nrows = -(-expand // width)
    cbits = int(width).bit_length()
    qpos = jnp.arange(Lq, dtype=jnp.int32)[None, :, None]

    direct = ps.get("direct_tables", False)
    from ghostm_tpu.engine import DIRECT_SENT

    # NOTE: the tables MUST be jit ARGUMENTS, not closure captures — a
    # closed-over 1.9 GB device array becomes a baked-in constant that the
    # remote-compile service cannot serialize (observed: 17 min hang then
    # Broken pipe). engine._fullstep_for documents the same rule.
    @jax.jit
    def build_keys(qc_, tab_main, tab_aux):
        kmers = seed_lookup.query_kmer_keys(qc_, cfg.seed_len)
        if direct:
            W = ps["table_width"]
            tg = tab_main[kmers.reshape(-1)].reshape(qc_.shape[0], Lq, W)
            keys = jnp.where(
                tg < DIRECT_SENT, (tg - qpos) // half, cand_mod.BIG)
            odd = (jnp.arange(Lq, dtype=jnp.int32) & 1)[None, :, None]
            keys = jnp.where(odd == 1, jnp.flip(keys, axis=2), keys)
            return keys.reshape(qc_.shape[0], Lq * W)
        offs = jnp.arange(expand, dtype=jnp.int32)
        aux = tab_aux[kmers]
        count = aux & ((1 << cbits) - 1)
        valid = offs < count[..., None]
        r = (aux >> cbits).reshape(-1)
        if nrows == 1:
            w2 = tab_main[r]
        else:
            w2 = jnp.concatenate(
                [tab_main[r + i] for i in range(nrows)], axis=1
            )
        tg = w2[:, :expand].reshape(qc_.shape[0], Lq, expand)
        keys = jnp.where(valid, (tg - qpos) // half, cand_mod.BIG)
        odd = (jnp.arange(Lq, dtype=jnp.int32) & 1)[None, :, None]
        keys = jnp.where(odd == 1, jnp.flip(keys, axis=2), keys)
        return keys.reshape(qc_.shape[0], Lq * expand)

    @jax.jit
    def gather_rows_only(qc_, tab_main, tab_aux):
        kmers = seed_lookup.query_kmer_keys(qc_, cfg.seed_len)
        if direct:
            return tab_main[kmers.reshape(-1)]
        aux = tab_aux[kmers]
        r = (aux >> cbits).reshape(-1)
        if nrows == 1:
            w2 = tab_main[r]
        else:
            w2 = jnp.concatenate(
                [tab_main[r + i] for i in range(nrows)], axis=1
            )
        return w2

    t_keys = timed(lambda: build_keys(qcs, d["tab_main"], d["tab_aux"]))
    t_gather = timed(
        lambda: gather_rows_only(qcs, d["tab_main"], d["tab_aux"]))
    out["stages_ms"]["propose.build_keys_per_chunk"] = round(t_keys * 1e3, 2)
    out["stages_ms"]["propose.table_gather_per_chunk"] = round(t_gather * 1e3, 2)
    out["stages_ms"]["propose.build_keys_total"] = round(
        t_keys * 1e3 * nchunks, 1)
    print(f"# build_keys/chunk {t_keys*1e3:.1f} ms (gather "
          f"{t_gather*1e3:.1f}) x{nchunks}", file=sys.stderr, flush=True)

    keys = build_keys(qcs, d["tab_main"], d["tab_aux"])
    run = ps["presorted_run"]
    t_sort = timed(lambda: sort_rows(keys, presorted_run=run))
    out["stages_ms"]["propose.sort_per_chunk"] = round(t_sort * 1e3, 2)
    out["stages_ms"]["propose.sort_total"] = round(t_sort * 1e3 * nchunks, 1)
    print(f"# sort/chunk {t_sort*1e3:.1f} ms x{nchunks}",
          file=sys.stderr, flush=True)

    sk = sort_rows(keys, presorted_run=run)

    @jax.jit
    def rank_only(s):
        fn = functools.partial(
            cand_mod._per_query, nbins=nbins, ncand=C,
            min_votes=max(cfg.min_votes, 1), smooth=ps["smooth"],
            chain_gamma=ps["chain_gamma"],
        )
        return jax.vmap(fn)(s)

    t_rank = timed(lambda: rank_only(sk))
    out["stages_ms"]["propose.rank_per_chunk"] = round(t_rank * 1e3, 2)
    out["stages_ms"]["propose.rank_total"] = round(t_rank * 1e3 * nchunks, 1)
    print(f"# rank/chunk {t_rank*1e3:.1f} ms x{nchunks}",
          file=sys.stderr, flush=True)

    # accounted propose vs measured
    acc = (t_keys + t_sort + t_rank) * nchunks
    out["stages_ms"]["propose.accounted_total"] = round(acc * 1e3, 1)

    known = (t_prop + t_sel + t_align + t_merge + t_ref)
    out["stages_ms"]["phases_sum"] = round(known * 1e3, 2)
    out["reads_per_s_full_step"] = round(R / t_full, 1)
    with open("/root/repo/PROFILE_r04.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
