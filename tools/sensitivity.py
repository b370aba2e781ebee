"""Sensitivity frontier vs the full-SW oracle (VERDICT r04 missing #4).

GHOSTM's defining trade (SURVEY.md §1.1) is a little sensitivity for a
lot of throughput; every prior artifact reported recall 1.0 on 2%-sub
planted reads — a floor, not a measurement. This tool measures the
frontier at config-2-true scale (570k seqs / ~200M residues):

  * mutation grid: substitution 2/5/10/15% x codon-indel 0/2/5% on
    100 bp reads planted from DB subjects;
  * engine settings: the default (k=5, hits_per_seed=128, ncand=8,
    band=32) plus cheaper/richer variants (ncand=4; ncand=24+band=64;
    k=4 index) — the knobs SURVEY.md §5.6 exposes;
  * ground truth: EXACT full (unbanded) Smith-Waterman of each read
    (all 6 frames) against EVERY DB subject, computed ON DEVICE — a
    column-scan over length-bucketed subject arrays, bit-equivalent to
    ghostm_tpu.oracle.sw_full (tests/test_sensitivity_oracle.py), fast
    enough (~24 B/cell of HBM carry traffic) to oracle a 16-read
    subsample per grid point against the full 570k-subject DB;
  * recall@k: an engine run RECALLS a read at k if any of its first k
    DISTINCT reported subjects achieves the oracle's global best score
    (handles oracle ties exactly — finding any co-optimal subject
    counts). Reported at k=1 and k=5.

Writes SENSITIVITY.json. TPU recommended (CPU works, slowly).
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

NFRAMES = 6
NEG = -(1 << 20)


# --------------------------------------------------------------------------
# device full-SW oracle: batched query-frames vs length-bucketed subjects
# --------------------------------------------------------------------------

def _sw_column_scan(qrows, codesT, go1: int, ge: int, pairwise: bool):
    """Exact full-SW best scores by scanning subject columns.

    qrows:  (F, Lq, 32) int32 — padded-matrix row per query position
            (PAD/stop rows are LOW in the padded matrix, so pad query
            positions mask themselves — same as oracle.sw_full fed the
            padded frame).
    codesT: (Lb, S) int8 — subject codes, column-major; codes >= 24
            (sentinel / pad) are masked to NEG scores.
    pairwise=False: all (f, s) pairs -> (F, S) scores (needs F == S or
    broadcast across every pair). pairwise=True: F == S and pair i is
    (qrows[i], codes[i]) -> (F,) scores.

    Recurrence identical to ghostm_tpu.oracle.sw_full (same cell
    semantics; integer arithmetic throughout; per-column one-hot is
    built in-scan, ~32 compares per cell).
    """
    import jax.numpy as jnp
    from jax import lax

    F, Lq, _ = qrows.shape
    S = codesT.shape[1]

    def step(carry, col):
        Hc, Ec, best = carry
        oh = (
            col[:, None] == jnp.arange(32, dtype=jnp.int32)[None, :]
        ).astype(jnp.int32)                       # (S, 32)
        if pairwise:
            s = jnp.einsum("piw,pw->ip", qrows, oh)      # (Lq, P)
        else:
            s = jnp.einsum("fiw,sw->ifs", qrows, oh)     # (Lq, F, S)
        s = jnp.where((col < 24)[None, :] if pairwise
                      else (col < 24)[None, None, :], s, NEG)
        En = jnp.maximum(Hc - go1, Ec - ge)
        zrow = jnp.zeros_like(Hc[:1])
        Hdiag = jnp.concatenate([zrow, Hc[:-1]])
        rows = []
        Fv = jnp.full_like(Hc[0], NEG)
        for i in range(Lq):
            above = rows[i - 1] if i else zrow[0]
            Fv = jnp.maximum(above - go1, Fv - ge)
            h = jnp.maximum(
                jnp.maximum(Hdiag[i] + s[i], 0), jnp.maximum(En[i], Fv)
            )
            rows.append(h)
        Hn = jnp.stack(rows)
        best = jnp.maximum(best, jnp.max(Hn, axis=0))
        return (Hn, En, best), 0

    shape = (Lq, F) if pairwise else (Lq, F, S)
    init = (
        jnp.zeros(shape, jnp.int32),
        jnp.full(shape, NEG, jnp.int32),
        jnp.zeros(shape[1:], jnp.int32),
    )
    (_, _, best), _ = lax.scan(step, init, codesT.astype(jnp.int32))
    return best


_bucket_scan = functools.partial(
    __import__("jax").jit, static_argnames=("go1", "ge", "pairwise")
)(_sw_column_scan)


def oracle_global_best(qframes, store, matrix, go1, ge, frame_chunk=12,
                       log=lambda *a: None):
    """(R,) int32: exact full-SW best score of each read (max over its 6
    frames) against EVERY subject in the store. Subjects are length-
    bucketed (pad waste < 2x); query frames stream in chunks."""
    import jax.numpy as jnp

    R = qframes.shape[0] // NFRAMES
    Lq = qframes.shape[1]
    # padded-matrix rows: PAD/stop/sentinel rows are LOW already, exactly
    # what oracle.sw_full sees when fed the padded frame
    qrows = np.asarray(matrix, np.int32)[np.asarray(qframes, np.int32)]
    lens = np.asarray(store.lengths, np.int64)
    edges = [0, 192, 320, 512, 768, 1024, 1536, int(lens.max())]
    best = np.zeros((qframes.shape[0],), np.int64)
    for lo, hi in zip(edges[:-1], edges[1:]):
        rows = np.nonzero((lens > lo) & (lens <= hi))[0]
        if not len(rows):
            continue
        Lb = max(int(hi), 8)
        codes = np.full((len(rows), Lb), 31, np.int8)
        for i, r in enumerate(rows):
            s0, ln = int(store.starts[r]), int(lens[r])
            codes[i, :ln] = store.buffer[s0 : s0 + ln]
        ctd = jnp.asarray(np.ascontiguousarray(codes.T))
        t0 = time.time()
        for f0 in range(0, qframes.shape[0], frame_chunk):
            qc = qrows[f0 : f0 + frame_chunk]
            pad = frame_chunk - qc.shape[0]
            if pad:
                qc = np.concatenate(
                    [qc, np.full((pad, Lq, 32), NEG, np.int32)]
                )
            out = np.asarray(_bucket_scan(
                jnp.asarray(qc), ctd, go1, ge, False
            ))
            got = out[: frame_chunk - pad]
            np.maximum(
                best[f0 : f0 + got.shape[0]],
                got.max(axis=1), out=best[f0 : f0 + got.shape[0]],
            )
        log(f"bucket <= {hi}: {len(rows)} subjects ({time.time()-t0:.0f}s)")
    return best.reshape(R, NFRAMES).max(axis=1)


def pair_scores(qframes_sel, codes_sel, matrix, go1, ge, chunk=2048):
    """(N,) exact full-SW score for N (query-frame, subject) pairs —
    the pairwise variant of the same column scan."""
    import jax.numpy as jnp

    N, Lb = codes_sel.shape
    Lq = qframes_sel.shape[1]
    qrows = np.asarray(matrix, np.int32)[np.asarray(qframes_sel, np.int32)]
    out = np.zeros(N, np.int64)
    for i0 in range(0, N, chunk):
        qs = qrows[i0 : i0 + chunk]
        cs = codes_sel[i0 : i0 + chunk]
        n = qs.shape[0]
        if n < chunk:   # pad to one compile shape
            qs = np.concatenate(
                [qs, np.full((chunk - n, Lq, 32), NEG, np.int32)]
            )
            cs = np.concatenate(
                [cs, np.full((chunk - n, Lb), 31, np.int8)]
            )
        sc = np.asarray(_bucket_scan(
            jnp.asarray(qs),
            jnp.asarray(np.ascontiguousarray(cs.T)), go1, ge, True,
        ))
        out[i0 : i0 + n] = sc[:n]
    return out


# --------------------------------------------------------------------------
# harness
# --------------------------------------------------------------------------

def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--reads-per-point", type=int, default=64)
    ap.add_argument("--oracle-per-point", type=int, default=16)
    ap.add_argument("-o", "--output", default="SENSITIVITY.json")
    args = ap.parse_args()
    from ghostm_tpu.cli import _enable_compile_cache

    _enable_compile_cache()
    import bench
    from ghostm_tpu.config import Config
    from ghostm_tpu.engine import SearchEngine
    from ghostm_tpu.ops.encode import AA_ALPHABET, encode_dna
    from ghostm_tpu.ops.scoring import padded_matrix
    from tools.simulate import reads_from_proteins

    t_all = time.time()
    cfg0 = Config(query_batch=4096, seed_len=5, hits_per_seed=128)
    index, st = bench._build_config2_index(cfg0)
    matrix = padded_matrix("BLOSUM62", hard_stop=True)
    go1 = cfg0.gap_open + cfg0.gap_extend
    ge = cfg0.gap_extend

    grid = [(s, d) for s in (0.02, 0.05, 0.10, 0.15) for d in (0.0, 0.02, 0.05)]
    rng = np.random.default_rng(23)
    RPP = args.reads_per_point
    pick = rng.integers(0, st.num_subjects, 400)
    prots = []
    for p in pick:
        s0, ln = int(st.starts[p]), int(st.lengths[p])
        prots.append("".join(AA_ALPHABET[c] for c in st.buffer[s0:s0 + ln]))
    all_dna, all_lens, point_of = [], [], []
    for pi, (sub, ind) in enumerate(grid):
        names, reads = reads_from_proteins(
            rng, prots, RPP, read_len=100, sub_rate=sub, indel_rate=ind
        )
        for rd in reads:
            c = encode_dna(rd)
            row = np.full(112, 4, np.int8)
            row[: len(c)] = c
            all_dna.append(row)
            all_lens.append(len(c))
            point_of.append(pi)
    dna = np.stack(all_dna)
    lens = np.array(all_lens, np.int32)
    point_of = np.array(point_of)
    R = len(dna)

    # engine settings (one aln pass each over ALL grid reads)
    settings = [
        ("default_k5", dict(seed_len=5, hits_per_seed=128,
                            candidates_per_frame=8, band_width=32)),
        ("cheap_ncand4", dict(seed_len=5, hits_per_seed=128,
                              candidates_per_frame=4, band_width=32)),
        ("rich_ncand24_band64", dict(seed_len=5, hits_per_seed=128,
                                     candidates_per_frame=24,
                                     band_width=64)),
    ]
    Rb = 1 << (R - 1).bit_length()
    results = {}
    eng0 = None
    for tag, kw in settings:
        cfg = Config(query_batch=min(Rb, 4096), max_hits=10, **kw)
        eng = SearchEngine(cfg, index)
        if tag == "default_k5":
            eng0 = eng
        subs = []
        for r0 in range(0, R, cfg.query_batch):
            out = np.asarray(eng.search_refine_async_dna(
                dna[r0 : r0 + cfg.query_batch],
                lens[r0 : r0 + cfg.query_batch],
            ))
            # out may be the (6, R, K) packed transport or the full
            # (18, R, K) payload — unpack_results handles both
            bh, _ = eng.unpack_results(out)
            subs.append(np.where(bh.score > 0, bh.gsid, -1))  # (r, K)
        results[tag] = np.concatenate(subs, axis=0)
        print(f"# engine pass {tag} done ({time.time()-t_all:.0f}s)",
              file=sys.stderr, flush=True)

    # oracle on a subsample per point
    OPP = args.oracle_per_point
    sel = np.concatenate(
        [np.nonzero(point_of == pi)[0][:OPP] for pi in range(len(grid))]
    )
    from ghostm_tpu.ops.translate import six_frame_translate

    qf = six_frame_translate(dna[sel], lens[sel], cfg0.query_frame_len)
    qflat = qf.reshape(-1, cfg0.query_frame_len)
    log = lambda m: print("# " + m, file=sys.stderr, flush=True)
    best = oracle_global_best(qflat, st, matrix, go1, ge, log=log)

    # per engine setting: scores of the reported subjects for sel reads
    maxlen = int(st.lengths.max())
    rows_out = []
    for tag, _ in settings:
        gs = results[tag][sel]                      # (n_sel, K)
        # distinct subjects in rank order, padded with -1
        rec1 = np.zeros(len(sel), bool)
        rec5 = np.zeros(len(sel), bool)
        pairs_q, pairs_c, pairs_read, pairs_rank = [], [], [], []
        for i in range(len(sel)):
            seen = []
            for g in gs[i]:
                if g >= 0 and g not in seen:
                    seen.append(int(g))
                if len(seen) == 5:
                    break
            for rank, g in enumerate(seen):
                s0, ln = int(st.starts[g]), int(st.lengths[g])
                row = np.full(maxlen, 31, np.int8)
                row[:ln] = st.buffer[s0 : s0 + ln]
                for f in range(NFRAMES):
                    pairs_q.append(qf[i, f])
                    pairs_c.append(row)
                    pairs_read.append(i)
                    pairs_rank.append(rank)
        if pairs_q:
            sc = pair_scores(
                np.stack(pairs_q), np.stack(pairs_c), matrix, go1, ge
            )
            pr = np.array(pairs_read)
            pk = np.array(pairs_rank)
            for i in range(len(sel)):
                m = pr == i
                if not m.any():
                    continue
                s_best = best[i]
                ach1 = sc[m & (pk == 0)].max(initial=0)
                ach5 = sc[m].max(initial=0)
                rec1[i] = ach1 >= s_best
                rec5[i] = ach5 >= s_best
        for pi, (sub, ind) in enumerate(grid):
            m = point_of[sel] == pi
            rows_out.append({
                "setting": tag, "sub_rate": sub, "indel_rate": ind,
                "n": int(m.sum()),
                "recall_at_1": round(float(rec1[m].mean()), 3),
                "recall_at_5": round(float(rec5[m].mean()), 3),
            })
        print(f"# recall {tag} done ({time.time()-t_all:.0f}s)",
              file=sys.stderr, flush=True)

    out = {
        "db": "570k seqs / ~200M residues (config-2-true), BLOSUM62 11/1",
        "reads_per_point_engine": RPP,
        "reads_per_point_oracle": OPP,
        "grid": [{"sub": s, "indel": d} for s, d in grid],
        "settings": {t: k for t, k in settings},
        "oracle": (
            "exact full (unbanded) SW of each read x 6 frames vs EVERY "
            "DB subject on device (tools/sensitivity._bucket_scan, "
            "validated bit-exact vs oracle.sw_full); recall@k = some "
            "engine top-k DISTINCT subject achieves the oracle's global "
            "best score (ties count)"
        ),
        "rows": rows_out,
        "wall_s": round(time.time() - t_all, 1),
    }
    with open(os.path.join(REPO, args.output), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(rows_out[-1]))
    print(f"# wrote {args.output}", file=sys.stderr)


if __name__ == "__main__":
    main()
