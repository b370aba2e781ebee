"""Multi-process rehearsal at scale (VERDICT r04 missing #5 / next #6).

tests/test_multihost.py proves 2-process equivalence at toy size; this
exercises the row-addressed-parts + per-process-cursor + barrier
machinery (pipeline.py) at real volume: 2 jax.distributed CPU (gloo)
processes x >= 100k reads against the config-2-true 570k-seq/200M-residue
2-shard disk index, with a mid-run SIGKILL of one process and a
--resume of both.

Phases:
  1. REF: single-process CPU run -> hits_ref.tsv (the loop path — which
     now exercises the colocated-shard MERGE at full scale);
  2. MP:  2 processes (--cpu 2 each -> 4 devices, mesh data=2 x db=2),
     --checkpoint-batches 1; process 1 SIGKILLed at ~kill_frac of the
     expected wall, then process 0 torn down (its next collective can
     never complete), both restarted with --resume;
  3. assert the concatenated MP table is byte-identical to REF.

Writes SCALE4_MP.json. CPU-only — safe to run alongside TPU work.
"""

import argparse
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.bench_scale3 import CACHE, top1_accuracy  # noqa: E402

import numpy as np  # noqa: E402


def spawn(pid, port, idx, rfa, out, batch, resume=False):
    cmd = [
        sys.executable, "-m", "ghostm_tpu", "aln", "-d", idx, "-i", rfa,
        "-o", out, "--cpu", "2", "--batch", str(batch),
        "--checkpoint-batches", "1", "--data-axis", "2", "--db-axis", "2",
        "--coordinator", f"localhost:{port}", "--num-processes", "2",
        "--process-id", str(pid),
    ] + (["--resume"] if resume else [])
    logf = open(f"/tmp/mp_worker_p{pid}{'_r' if resume else ''}.log", "w")
    env = dict(os.environ, PYTHONUNBUFFERED="1")
    return subprocess.Popen(cmd, cwd=REPO, stdout=logf, stderr=logf, env=env)


def run_pair(port, idx, rfa, out, batch, resume=False, kill_after=None,
             timeout=14400):
    """kill_after counts from the FIRST completed part, not from launch:
    the 2-process pair's distributed+engine init is much slower than the
    single-process reference's (whose wall sizes the kill fraction), so a
    launch-anchored timer can fire before any part exists — killing a run
    that has made no progress rehearses nothing."""
    t0 = time.time()
    p0 = spawn(0, port, idx, rfa, out, batch, resume)
    p1 = spawn(1, port, idx, rfa, out, batch, resume)
    killed = False
    parts_dir = out + ".parts"
    t_progress = None
    while True:
        r0, r1 = p0.poll(), p1.poll()
        if kill_after and not killed and t_progress is None:
            try:
                if any(p.endswith(".tsv")
                       for p in os.listdir(parts_dir)):
                    t_progress = time.time()
            except FileNotFoundError:
                pass
        if (kill_after and not killed and t_progress is not None
                and time.time() - t_progress > kill_after):
            p1.send_signal(signal.SIGKILL)      # hard kill, no cleanup
            killed = True
            # p0 blocks on the dead peer's next collective forever;
            # give its in-flight batch a moment, then tear it down too
            # (a real orchestrator would do the same on peer loss)
            time.sleep(20)
            p0.send_signal(signal.SIGKILL)
        if r0 is not None and r1 is not None:
            if not killed and (r0 or r1):
                raise RuntimeError(f"mp run failed: rc0={r0} rc1={r1}")
            return time.time() - t0, killed
        if time.time() - t0 > timeout:
            p0.kill()
            p1.kill()
            raise RuntimeError("mp run timed out")
        time.sleep(2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=100_000)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--kill-frac", type=float, default=0.4)
    ap.add_argument("--port", type=int, default=29877)
    ap.add_argument("-o", "--output", default="SCALE4_MP.json")
    args = ap.parse_args()
    idx = os.path.join(CACHE, "idx2")
    src = os.path.join(CACHE, "reads_1000000.fa")
    assert os.path.exists(idx + ".manifest.json"), "run bench_scale3 first"
    rfa = os.path.join(CACHE, f"reads_mp_{args.reads}.fa")
    if not os.path.exists(rfa):
        with open(src, "rb") as f, open(rfa, "wb") as g:
            for _ in range(2 * args.reads):
                g.write(f.readline())
    subj = np.load(os.path.join(CACHE, "reads_1000000_src.npz"))["subj"]
    art = {"reads": args.reads, "batch": args.batch, "processes": 2,
           "mesh": "data=2 x db=2 (2 CPU devices/process, gloo)",
           "db": "570k seqs / ~200M residues, k=5, 2-shard index"}

    # 1. single-process reference (loop path: colocated shards MERGED)
    ref = os.path.join(CACHE, "hits_mp_ref.tsv")
    ref_meta = ref + ".meta.json"
    cached = None
    if os.path.exists(ref) and os.path.exists(ref_meta):
        with open(ref_meta) as f:
            cached = json.load(f)
        if cached.get("reads") != args.reads or \
                cached.get("batch") != args.batch:
            cached = None
    if cached is None:
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, "-m", "ghostm_tpu", "aln", "-d", idx, "-i",
             rfa, "-o", ref, "--cpu", "1", "--batch", str(args.batch)],
            cwd=REPO, timeout=14400,
        )
        assert r.returncode == 0
        cached = {"reads": args.reads, "batch": args.batch,
                  "wall_s": round(time.time() - t0, 1)}
        with open(ref_meta, "w") as f:
            json.dump(cached, f)
    art["ref_wall_s"] = cached["wall_s"]
    print(f"ref done {art['ref_wall_s']}s", flush=True)

    # 2. mp run with mid-run SIGKILL + resume
    out = os.path.join(CACHE, "hits_mp.tsv")
    parts = out + ".parts"
    if os.path.exists(parts):
        import shutil

        shutil.rmtree(parts)
    kill_after = args.kill_frac * art["ref_wall_s"]
    wall_a, killed = run_pair(args.port, idx, rfa, out, args.batch,
                              kill_after=kill_after)
    art["killed_at_s"] = round(kill_after, 1)
    art["sigkill_delivered"] = bool(killed)
    done_parts = len([p for p in os.listdir(parts) if p.endswith(".tsv")])
    art["parts_at_kill"] = done_parts
    print(f"killed at {kill_after:.0f}s with {done_parts} parts", flush=True)
    t0 = time.time()
    wall_b, _ = run_pair(args.port + 1, idx, rfa, out, args.batch,
                         resume=True)
    art["resume_wall_s"] = round(wall_b, 1)
    art["total_parts"] = len(
        [p for p in os.listdir(parts) if p.endswith(".tsv")]
    )

    # 3. byte-compare (modulo the header line both carry)
    with open(ref, "rb") as f:
        want = f.read()
    with open(out, "rb") as f:
        got = f.read()
    art["mp_equals_single_process"] = bool(want == got)
    acc, hitrate = top1_accuracy(out, subj[: args.reads], args.reads)
    art["top1_acc"] = round(acc, 4)
    art["hit_rate"] = round(hitrate, 4)
    art["protocol"] = (
        "2 jax.distributed CPU/gloo processes, 2 devices each (mesh "
        "data=2 x db=2), row-addressed per-batch parts + per-process "
        "cursors; process 1 SIGKILLed mid-run (process 0 torn down 20 s "
        "later — it cannot outlive a dead collective peer), both "
        "restarted with --resume; final concatenated table byte-compared "
        "against the single-process loop-path run (which exercises the "
        "r05 colocated-shard merge at full scale)"
    )
    with open(os.path.join(REPO, args.output), "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps(art), flush=True)
    if not art["mp_equals_single_process"]:
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
