"""Long-read PERFORMANCE artifact (VERDICT r04 missing #3 / next #3).

LONGREAD_r04.json chip-proved 5/10 kbp correctness at 5-8 reads (wall
dominated by compile — perf-free). This tool runs non-toy batches through
the real CLI on the chip and records steady-state throughput:

  5 kbp row:  256 reads x 300 proteins (~1800 aa), frame 1728, band 64
  10 kbp row: 128 reads x 100 proteins (~3450 aa), frame 3456, band 128

both with collinear chaining on (chain_gamma=2), batch = half the reads
so every run has >= 2 batches (batch 0 carries compile/cache-load; the
LAST batch's wall is the steady-state step — min-of-batches would read
the tail batch where the pipeline drains). Records reads/s (steady),
pipeline GCUPS (align cells, same accounting as utils/metrics.py), peak
device residency (GHOSTM_TPU_HBM_LOG live-array sum), and a correctness
spot-check: the CPU path on a 16-read subset must produce EXACTLY the
TPU table's rows for those reads (full-batch CPU legs at this scale cost
~40 min each; full byte-identity at toy scale is LONGREAD_r04 +
tools/verify_golden.sh).

Writes LONGREAD_r05.json. One TPU process at a time (axon tunnel).
"""

import argparse
import json
import os
import re
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.simulate import make_dataset

NFRAMES = 6


def run_cli(args_list, timeout=3600, hbm_log=None):
    env = dict(os.environ)
    if hbm_log:
        env["GHOSTM_TPU_HBM_LOG"] = hbm_log
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, "-m", "ghostm_tpu"] + args_list,
        cwd=REPO, capture_output=True, text=True, timeout=timeout, env=env,
    )
    if r.returncode != 0:
        print(r.stderr[-3000:], file=sys.stderr)
        raise RuntimeError(f"CLI failed: {' '.join(args_list[:6])}")
    return time.time() - t0, r.stderr


def batch_walls(stderr):
    return [float(m.group(1)) for m in
            re.finditer(r"batch \d+: \d+ reads, \d+ rows, ([\d.]+)s",
                        stderr)]


def subset_rows(tsv, names):
    with open(tsv) as f:
        return [ln for ln in f if ln.split("\t", 1)[0] in names]


def one_config(tag, read_len, frame_len, band, n_proteins, n_reads,
               protein_len, candidates=4, subset=16):
    """subset=0 skips the CPU spot-check leg (cross-backend byte-identity
    at these shapes is already LONGREAD_r04.json + verify_golden.sh; on a
    2-core host the XLA-CPU compile+run at kbp frames costs ~1 h)."""
    work = tempfile.mkdtemp(prefix=f"lrp_{tag}_")
    db_fa, reads_fa = make_dataset(
        os.path.join(work, "lr"), n_proteins=n_proteins, n_reads=n_reads,
        read_len=read_len, sub_rate=0.01, indel_rate=0.02, seed=5,
        protein_len=protein_len,
    )
    batch = n_reads // 2
    cfgf = os.path.join(work, "cfg.json")
    with open(cfgf, "w") as f:
        json.dump({
            "query_frame_len": frame_len, "band_width": band,
            "query_batch": batch, "seed_len": 4, "chain_gamma": 2,
            "candidates_per_frame": candidates,
        }, f)
    idx = os.path.join(work, "idx")
    run_cli(["db", "-i", db_fa, "-o", idx, "--config", cfgf])
    mrl = str(read_len + 300)
    out_tpu = os.path.join(work, "hits_tpu.tsv")
    hbm_log = os.path.join(work, "hbm.json")
    t_tpu, err = run_cli(
        ["aln", "-d", idx, "-i", reads_fa, "-o", out_tpu, "--pallas",
         "--config", cfgf, "--max-read-len", mrl, "-v"],
        hbm_log=hbm_log)
    walls = batch_walls(err)
    # batch 0 = compile + warmup; the async pipeline overlaps later
    # batches, so steady state = min over batches 1.. of the logged wall
    steady = min(walls[1:]) if len(walls) > 1 else walls[0]
    n_aln = batch * NFRAMES * candidates
    cells = n_aln * frame_len * band
    hbm = {}
    if os.path.exists(hbm_log):
        with open(hbm_log) as f:
            hbm = json.load(f)
    # correctness spot-check: CPU on a small read subset vs the TPU table
    # (its own config with query_batch == subset — compiling the CPU leg
    # at the full TPU batch is pure waste)
    same = None
    if subset:
        sub_fa = os.path.join(work, "reads_sub.fa")
        sub_names = set()
        with open(reads_fa) as f, open(sub_fa, "w") as g:
            for i in range(2 * subset):
                ln = f.readline()
                if i % 2 == 0:
                    sub_names.add(ln[1:].strip())
                g.write(ln)
        sub_cfgf = os.path.join(work, "cfg_sub.json")
        with open(sub_cfgf, "w") as f:
            json.dump({
                "query_frame_len": frame_len, "band_width": band,
                "query_batch": subset, "seed_len": 4, "chain_gamma": 2,
                "candidates_per_frame": candidates,
            }, f)
        out_cpu = os.path.join(work, "hits_cpu_sub.tsv")
        t_cpu, _ = run_cli(
            ["aln", "-d", idx, "-i", sub_fa, "-o", out_cpu, "--no-pallas",
             "--cpu", "1", "--config", sub_cfgf, "--max-read-len", mrl,
             "-v"])
        same = subset_rows(out_cpu, sub_names) == subset_rows(
            out_tpu, sub_names)
    row = {
        "config": tag, "read_len": read_len, "frame_len": frame_len,
        "band": band, "reads": n_reads, "proteins": n_proteins,
        "batch": batch, "tpu_wall_s": round(t_tpu, 1),
        "batch_walls_s": [round(w, 3) for w in walls],
        "steady_batch_s": round(steady, 3),
        "steady_reads_per_s": round(batch / steady, 1),
        "pipeline_gcups": round(cells / steady / 1e9, 2),
        "device_live_gb": round(
            hbm.get("live_array_bytes", 0) / 1e9, 3) or None,
        "cpu_subset_rows_identical": bool(same),
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-o", "--output", default="LONGREAD_r05.json")
    ap.add_argument("--cpu-subset", type=int, default=16,
                    help="reads in the CPU spot-check leg (0 = skip)")
    args = ap.parse_args()
    rows = [
        one_config("5kbp", 5000, 1728, 64, 300, 256, (1750, 1850),
                   subset=args.cpu_subset),
        one_config("10kbp", 9999, 3456, 128, 100, 128, (3400, 3500),
                   subset=args.cpu_subset),
    ]
    out = {
        "protocol": (
            "non-toy long-read batches through the real CLI on the chip "
            "(chain_gamma=2, 2% codon indels / 1% subs): >= 2 batches "
            "per run, steady state = min logged batch wall after batch "
            "0 (compile); pipeline GCUPS = align cells "
            "(batch x 6 x candidates x frame x band) / steady wall; "
            "device residency = live-array sum (axon exposes no "
            "allocator stats). Correctness: CPU path on a 16-read "
            "subset must emit exactly the TPU table's rows for those "
            "reads (full-scale byte-identity at toy size: "
            "LONGREAD_r04.json, tools/verify_golden.sh). Kernel-level "
            "GCUPS at these shapes: LONGREAD_r03.json (83-112)."),
        "rows": rows,
        "all_identical": all(
            r["cpu_subset_rows_identical"] for r in rows
        ) if args.cpu_subset else None,
    }
    with open(os.path.join(REPO, args.output), "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.output}", flush=True)


if __name__ == "__main__":
    main()
