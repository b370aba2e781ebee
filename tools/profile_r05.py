"""Ablation profile of the ONE compiled batch step (VERDICT r04 next #1).

PROFILE_r04's standalone-stage timings carried 10-25 ms/call tunnel
marshaling cost and over-counted 2x (its own caveat). This tool instead
times VARIANTS of the one full-step program with stages elided
CUMULATIVELY back-to-front:

  v0 full
  v1 - refine DP + traceback walk   (refine_stats_packed -> dummy)
  v2 - align DP kernel              (sw_fused.sw_fused_wave -> dummy)
  v3 - window fetch (align+refine)  (engine.fetch_windows -> dummy)
  v4 - merge + per-read rank        (engine._merge_rank_jit -> dummy)
  v5 - global select                (engine._select_jit -> dummy)
  v6 - sort + vote + rank           (candidates.vote_and_rank -> dummy)
  v7 - key build + table gather     (engine.propose_shard -> dummy)
  v8 - align prep (qrep/mask/map)   (engine.align_shard -> dummy)
        = residual floor (plumbing, reshapes, final concat)

Each delta v_{i-1} - v_i is that stage's true share of the compiled
program; the deltas + the v8 floor sum to v0 EXACTLY by construction
(up to timing noise) — the property PROFILE_r04 lacked. Every variant is
slope-timed with the fori-loop protocol (bench.py), which cancels the
per-call tunnel cost, and every dummy REDUCE-CONSUMES its inputs
(jnp.sum(...) & 0 folded into the output) so XLA cannot dead-code the
upstream stages it still has to run.

Writes PROFILE_r05.json. Run on the TPU chip (one process at a time on
the tunnel).
"""

from __future__ import annotations

import json
import os
import sys
import time
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench.py: index builder + slope timer)


def _consume(*arrays):
    """int32 0 that data-depends on every input in a way XLA cannot
    constant-fold away: `sum(a) & 0` simplifies to 0 and severs the
    dependency (the first run's v4+ variants were fully DCE'd into
    0.01 ms programs); `max(a) == INT32_MAX` is 0 at runtime for every
    value our pipeline produces (keys top out at BIG = 2^30) but is not
    provably 0 at compile time, so the reduction — and everything
    feeding it — must execute."""
    import jax.numpy as jnp

    acc = jnp.int32(0)
    for a in arrays:
        acc = acc + (
            jnp.max(a.astype(jnp.int32)) == jnp.int32(0x7FFFFFFF)
        ).astype(jnp.int32)
    return acc


def build_patches():
    """ablation name -> (module, attr, replacement factory). Factories are
    called lazily so each variant's dummies close over nothing big."""
    import jax.numpy as jnp

    from ghostm_tpu import engine as eng_mod
    from ghostm_tpu.kernels import candidates as cand_mod
    from ghostm_tpu.kernels import sw_fused

    def dummy_refine(qcodes3, packed, matrix, w, lo, hi, *, band, gap_open,
                     gap_extend):
        R, K = packed.shape[1], packed.shape[2]
        z = _consume(w, lo, hi) + _consume(packed[6])
        return jnp.zeros((9, R, K), jnp.int32) + z

    def dummy_align_dp(qc, w, words, rel_lo, rel_hi, go, ge, band, **kw):
        n = qc.shape[0]
        z = _consume(qc, w, rel_lo, rel_hi)
        zv = jnp.zeros(n, jnp.int32) + z
        return zv, zv, zv

    def dummy_fetch(buf, g0, lead, wlen):
        return jnp.zeros((g0.shape[0], wlen), jnp.int8) + (
            _consume(g0)
        ).astype(jnp.int8)

    def dummy_merge(stacked, sel_g, R, K, use_kernel=False):
        z = _consume(stacked[0]) + _consume(sel_g)
        return jnp.zeros((9, R, K), jnp.int32) + z

    def dummy_select(pg, pb, pv, ncand, use_kernel=False):
        z = _consume(pg, pb, pv)
        o = jnp.zeros((pg.shape[0], ncand), jnp.int32) + z
        return o, o

    def dummy_vote(keys, subject_ids, ncand, min_votes, smooth=False,
                   nbins=1 << 20, use_sort_kernel=False, presorted_run=0,
                   chain_gamma=0):
        z = _consume(keys)
        o = jnp.zeros((keys.shape[0], ncand), jnp.int32) + z
        return o, o, o

    def dummy_propose(qflat, bucket_starts, tab_main, tab_aux, subject_ids,
                      *, ncand, **kw):
        z = _consume(qflat[:, :1])
        o = jnp.zeros((qflat.shape[0], ncand), jnp.int32) + z
        return o, o, o

    def dummy_align(qflat, buffer, starts, subject_ids, lengths, matrix,
                    sel_gsid, sel_lbin, **kw):
        Qf, C = sel_gsid.shape
        z = _consume(sel_gsid[:, :1], qflat[:, :1])
        o = jnp.zeros((Qf, C), jnp.int32) + z
        return o, o, o, o, o, o, (o > 0)

    wrap = lambda f: types.SimpleNamespace(__wrapped__=f)
    return [
        ("refine_dp_walk", eng_mod, "refine_stats_packed", dummy_refine),
        ("align_dp_kernel", sw_fused, "sw_fused_wave", dummy_align_dp),
        ("window_fetch", eng_mod, "fetch_windows", dummy_fetch),
        ("merge_rank", eng_mod, "_merge_rank_jit", wrap(dummy_merge)),
        ("select", eng_mod, "_select_jit", wrap(dummy_select)),
        ("sort_vote_rank", cand_mod, "vote_and_rank", wrap(dummy_vote)),
        ("keys_and_gather", eng_mod, "propose_shard", dummy_propose),
        ("align_prep", eng_mod, "align_shard", dummy_align),
    ]


def make_step(eng, R):
    """Fresh (untraced) full-step fn mirroring engine._fullstep_for, but
    resolving every stage through module globals at TRACE time so the
    active monkeypatches take effect."""
    from ghostm_tpu import engine as eng_mod

    cfg = eng.cfg
    n_shards = eng.n_shards
    nkeys = len(eng._SHARD_KEYS)
    import jax.numpy as jnp

    def step(qcodes3, matrix, *flat):
        shard_dev = [
            dict(zip(eng._SHARD_KEYS, flat[i * nkeys:(i + 1) * nkeys]))
            for i in range(n_shards)
        ]
        qflat = qcodes3.reshape(R * eng_mod.NFRAMES, cfg.query_frame_len)
        packed = eng._search_phases(
            qflat, R, jitted="inline", shard_dev=shard_dev, matrix=matrix,
        )
        # refine: inline version of _make_refine_packed's fn (module
        # globals resolved now, so fetch/refine dummies apply)
        K = packed.shape[2]
        n = R * K
        g0 = packed[6].reshape(-1)
        srow = packed[7].reshape(-1)
        shard = packed[8].reshape(-1)
        wlen = cfg.query_frame_len + cfg.band_width
        w = jnp.zeros((n, wlen), jnp.int32)
        lo = jnp.zeros(n, jnp.int32)
        hi = jnp.zeros(n, jnp.int32)
        for si in range(n_shards):
            d = shard_dev[si]
            w2 = eng_mod.fetch_windows(d["buffer"], g0, eng.lead, wlen)
            m = shard == si
            w = jnp.where(m[:, None], w2.astype(jnp.int32), w)
            S = d["starts"].shape[0]
            sr = jnp.clip(srow, 0, S - 1)
            lo = jnp.where(m, d["starts"][sr], lo)
            hi = jnp.where(m, d["starts"][sr] + d["lengths"][sr], hi)
        stats = eng_mod.refine_stats_packed(
            qcodes3, packed, matrix, w, lo, hi,
            band=cfg.band_width, gap_open=cfg.gap_open,
            gap_extend=cfg.gap_extend,
        )
        return jnp.concatenate([packed, stats], axis=0)

    return step


def time_variant(eng, R, qcodes3, n1, n2, repeats):
    """Slope-time the CURRENTLY-PATCHED step; returns (ms, spread)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    step = make_step(eng, R)

    @jax.jit
    def reps(n, qc, matrix, *flat):
        def body(i, acc):
            q = qc ^ (i & 1).astype(qc.dtype)
            out = step(q, matrix, *flat)
            return acc + out[0, 0, 0]

        return lax.fori_loop(0, n, body, jnp.int32(0))

    flat = [eng.shard_dev[0][k] for k in eng._SHARD_KEYS]
    qdev = jnp.asarray(qcodes3)

    def timed(n):
        np.asarray(reps(jnp.int32(n), qdev, eng.matrix, *flat))  # warm
        best = float("inf")
        for _ in range(3):
            t = time.time()
            np.asarray(reps(jnp.int32(n), qdev, eng.matrix, *flat))
            best = min(best, time.time() - t)
        return best

    slopes = []
    attempts = 0
    while len(slopes) < repeats and attempts < 3 * repeats:
        attempts += 1
        t1, t2 = timed(n1), timed(n2)
        if t2 <= t1:
            continue
        slopes.append((t2 - t1) / (n2 - n1))
    if not slopes:
        raise RuntimeError("slope timing failed for variant")
    slopes.sort()
    med = slopes[len(slopes) // 2]
    return med * 1e3, (slopes[-1] - slopes[0]) / med


def run_one_variant(vi: int):
    """Measure variant vi (0 = full, i > 0 = first i ablations applied)
    in THIS process and write PROFILE_r05.parts/v{vi}.json. One variant
    per process: the axon runtime sporadically poisons the session with
    INVALID_ARGUMENT after switching between large compiled programs
    (the same failure mode engine._fullstep_for documents for async
    chains) — process isolation sidesteps it, and the persistent compile
    cache keeps re-runs cheap."""
    from ghostm_tpu.cli import _enable_compile_cache

    _enable_compile_cache()
    from ghostm_tpu.config import Config
    from ghostm_tpu.engine import SearchEngine
    from ghostm_tpu.ops.encode import AA_ALPHABET, encode_dna
    from tools.simulate import reads_from_proteins

    R = int(os.environ.get("GHOSTM_TPU_PROFILE_BATCH", 8192))
    cfg = Config(query_batch=R, seed_len=5, hits_per_seed=128)
    index, st = bench._build_config2_index(cfg)
    eng = SearchEngine(cfg, index)

    rng = np.random.default_rng(1)
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
    qcodes3 = eng.translate(dna, lens)

    patches = build_patches()
    name = "full" if vi == 0 else "-" + patches[vi - 1][0]
    for pname, mod, attr, repl in patches[:vi]:
        setattr(mod, attr, repl)
    n1, n2, repeats = 2, 10, 3
    ms, spread = time_variant(eng, R, qcodes3, n1, n2, repeats)
    parts = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PROFILE_r05.parts")
    os.makedirs(parts, exist_ok=True)
    with open(os.path.join(parts, f"v{vi}.json"), "w") as f:
        json.dump({"variant": name, "ms": round(ms, 2),
                   "spread": round(spread, 3)}, f)
    print(f"# v{vi} {name}: {ms:.1f} ms +-{spread*100:.0f}%",
          file=sys.stderr, flush=True)
    return 0


def main():
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    parts = os.path.join(repo, "PROFILE_r05.parts")
    patches_n = len(build_patches())
    t0 = time.time()
    walls = []
    for vi in range(patches_n + 1):
        part = os.path.join(parts, f"v{vi}.json")
        if not os.path.exists(part):
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--variant", str(vi)],
                cwd=repo, timeout=3000,
            )
            if r.returncode:
                raise RuntimeError(f"variant {vi} failed rc={r.returncode}")
        with open(part) as f:
            d = json.load(f)
        walls.append((d["variant"], d["ms"], d["spread"]))
        print(f"# {d['variant']}: {d['ms']} ms ({time.time()-t0:.0f}s)",
              file=sys.stderr, flush=True)

    stages = {}
    for i in range(1, len(walls)):
        name = walls[i][0][1:]
        stages[name] = round(walls[i - 1][1] - walls[i][1], 2)
    floor = walls[-1][1]
    full = walls[0][1]
    ssum = sum(stages.values()) + floor
    R = int(os.environ.get("GHOSTM_TPU_PROFILE_BATCH", 8192))
    out = {
        "config": {
            "R": R, "Qf": R * 6, "Lq": 40, "seed_len": 5, "band": 32,
            "ncand": 8, "max_hits": 10, "table_mode": "direct",
            "db_seqs": 570000, "db_residues": 199274503,
            "note": "config-2-true (bench._build_config2_index defaults)",
        },
        "protocol": (
            "cumulative back-to-front stage elision of the ONE compiled "
            "full-step program, ONE PROCESS PER VARIANT (axon cross-"
            "program INVALID_ARGUMENT workaround); each variant slope-"
            "timed (fori-loop, n=2->10, median of 3) so per-call tunnel "
            "cost cancels; dummies reduce-consume inputs so XLA cannot "
            "DCE upstream stages. stage values are consecutive-variant "
            "deltas; they sum to full_step minus the residual floor BY "
            "CONSTRUCTION (check_sum_ms vs full_step_ms)"
        ),
        "variants_ms": {w[0]: {"ms": round(w[1], 2),
                               "spread": round(w[2], 3)} for w in walls},
        "stages_ms": stages,
        "residual_floor_ms": round(floor, 2),
        "full_step_ms": round(full, 2),
        "check_sum_ms": round(ssum, 2),
        "sum_error_pct": round(100 * (ssum - full) / full, 2),
        "reads_per_s_full_step": round(R / (full / 1e3), 1),
        "wall_s": round(time.time() - t0, 1),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PROFILE_r05.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["stages_ms"]))
    print(f"# wrote {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--variant":
        sys.exit(run_one_variant(int(sys.argv[2])))
    sys.exit(main())
