"""Long-read FULL-PIPELINE chip runs (VERDICT r03 missing #3 / next #3).

r03 chip-proved the fused kernel at Lq=1728/3456 (LONGREAD_r03.json) but
the 5/10 kbp CLI tests still ran --no-pallas on CPU. This tool runs the
SAME two configs as tests/test_longread.py — 5 kbp reads / frame 1728 /
band 64 and 10 kbp reads / frame 3456 / band 128, collinear chaining on
— through the REAL CLI twice:

  leg A: --no-pallas --cpu 1   (the CPU reference path)
  leg B: --pallas              (compiled on the TPU chip: propose with
                                chaining + select + fused align + refine
                                as ONE compiled program at kbp shapes)

and byte-diffs the hit tables. Records wall time, per-batch step time
and analytic pipeline GCUPS for the chip leg. Writes LONGREAD_r04.json
pipeline rows (kernel-level rows live in LONGREAD_r03.json).

Usage: python tools/bench_longread_pipeline.py [-o LONGREAD_r04.json]
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


def run_cli(args_list, timeout=3600):
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, "-m", "ghostm_tpu"] + args_list,
        cwd=REPO, capture_output=True, text=True, timeout=timeout,
    )
    if r.returncode != 0:
        print(r.stderr[-3000:], file=sys.stderr)
        raise RuntimeError(f"CLI failed: {' '.join(args_list[:6])}")
    return time.time() - t0, r.stderr


def batch_times(stderr):
    """Per-batch wall seconds from the pipeline's log lines."""
    return [float(m.group(1)) for m in
            re.finditer(r"batch \d+: \d+ reads, \d+ rows, ([\d.]+)s",
                        stderr)]


def one_config(tag, read_len, frame_len, band, n_proteins, n_reads,
               protein_len, candidates=4):
    work = tempfile.mkdtemp(prefix=f"lr_{tag}_")
    db_fa, reads_fa = make_dataset(
        os.path.join(work, "lr"), n_proteins=n_proteins, n_reads=n_reads,
        read_len=read_len, sub_rate=0.01, indel_rate=0.02, seed=5,
        protein_len=protein_len,
    )
    cfgf = os.path.join(work, "cfg.json")
    with open(cfgf, "w") as f:
        json.dump({
            "query_frame_len": frame_len, "band_width": band,
            # half-size batches -> >= 2 batches per run: batch 0 carries
            # the per-process compile/cache-load cost (~70 s via the
            # remote-compile tunnel even warm), so min-of-batches is the
            # honest steady-state step time
            "query_batch": max(1, n_reads // 2),
            "seed_len": 4, "chain_gamma": 2,
            "candidates_per_frame": candidates,
        }, f)
    idx = os.path.join(work, "idx")
    run_cli(["db", "-i", db_fa, "-o", idx, "--config", cfgf])
    mrl = str(read_len + 300)
    out_cpu = os.path.join(work, "hits_cpu.tsv")
    out_tpu = os.path.join(work, "hits_tpu.tsv")
    t_cpu, _ = run_cli(
        ["aln", "-d", idx, "-i", reads_fa, "-o", out_cpu, "--no-pallas",
         "--cpu", "1", "--config", cfgf, "--max-read-len", mrl, "-v"])
    t_tpu, err = run_cli(
        ["aln", "-d", idx, "-i", reads_fa, "-o", out_tpu, "--pallas",
         "--config", cfgf, "--max-read-len", mrl, "-v"])
    same = open(out_cpu, "rb").read() == open(out_tpu, "rb").read()
    bt = batch_times(err)
    # analytic pipeline cells PER BATCH: alignments x frame x band (align
    # phase cells only — same accounting as utils/metrics.py)
    n_aln = max(1, n_reads // 2) * NFRAMES * candidates
    cells = n_aln * frame_len * band
    step_s = min(bt) if bt else None
    row = {
        "config": tag, "read_len": read_len, "frame_len": frame_len,
        "band": band, "reads": n_reads, "proteins": n_proteins,
        "tpu_wall_s": round(t_tpu, 1), "cpu_wall_s": round(t_cpu, 1),
        "tpu_batch_s": round(step_s, 3) if step_s else None,
        "pipeline_gcups": round(cells / step_s / 1e9, 2) if step_s else None,
        "byte_identical_cpu_vs_tpu": bool(same),
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-o", "--output", default="LONGREAD_r04.json")
    args = ap.parse_args()
    rows = [
        one_config("5kbp", 5000, 1728, 64, 12, 8, (1750, 1850)),
        one_config("10kbp", 9999, 3456, 128, 6, 5, (3400, 3500)),
    ]
    out = {
        "protocol": (
            "tests/test_longread.py's exact 5/10 kbp configs (2% codon "
            "indels, 1% subs, chain_gamma=2) through the real CLI: "
            "--no-pallas --cpu 1 reference vs --pallas compiled on the "
            "chip (propose+chain+select+fused-align+refine, ONE program "
            "at kbp shapes), hit tables byte-compared; per-batch step "
            "time from pipeline logs, GCUPS analytic align cells "
            "(alignments x frame x band). Kernel-level chip rows: "
            "LONGREAD_r03.json."),
        "rows": rows,
        "all_identical": all(r["byte_identical_cpu_vs_tpu"] for r in rows),
    }
    with open(os.path.join(REPO, args.output), "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.output}", flush=True)


if __name__ == "__main__":
    main()
