"""Fault injection (SURVEY.md §5.3) and checkify debug mode (§5.2).

Fault injection: run the CLI over a 2-device ("db"=2) mesh with per-batch
checkpointing as a subprocess, SIGKILL it mid-run (after at least one part
file lands, before the last), restart with --resume, and require the final
TSV to be byte-identical to an uninterrupted run.
"""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

from ghostm_tpu.cli import main as cli_main
from tools.simulate import make_dataset

HERE = os.path.dirname(__file__)
REPO = os.path.dirname(HERE)


def _write_cfg(tmp_path, n_batches_hint):
    cfg = {"query_batch": 16, "checkpoint_batches": 1, "max_hits": 5}
    p = str(tmp_path / "cfg.json")
    with open(p, "w") as f:
        json.dump(cfg, f)
    return p


def test_kill_worker_mid_run_then_resume(tmp_path):
    db_fa, reads_fa = make_dataset(
        str(tmp_path / "fi"), n_proteins=40, n_reads=96, read_len=100,
        seed=3,
    )
    prefix = str(tmp_path / "idx")
    cfgf = _write_cfg(tmp_path, 6)
    assert cli_main(
        ["db", "-i", db_fa, "-o", prefix, "--shards", "2", "--config", cfgf]
    ) == 0

    args = [
        "aln", "-d", prefix, "-i", reads_fa, "--config", cfgf,
        "--no-pallas", "--cpu", "2", "--data-axis", "1", "--db-axis", "2",
    ]
    # reference: uninterrupted run (subprocess: --cpu must re-init jax)
    ref_out = str(tmp_path / "ref.tsv")
    env = dict(os.environ)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    r = subprocess.run(
        [sys.executable, "-m", "ghostm_tpu"] + args + ["-o", ref_out],
        cwd=REPO, env=env, capture_output=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr.decode()[-800:]

    # victim run: SIGKILL once >= 1 part exists and < all parts exist
    out = str(tmp_path / "hits.tsv")
    parts = out + ".parts"
    n_parts_total = len(
        [p for p in os.listdir(ref_out + ".parts") if p.startswith("part-")]
    )
    assert n_parts_total >= 3
    proc = subprocess.Popen(
        [sys.executable, "-m", "ghostm_tpu"] + args + ["-o", out],
        cwd=REPO, env=env,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    killed = False
    deadline = time.time() + 240
    while time.time() < deadline:
        if proc.poll() is not None:
            break
        if os.path.isdir(parts):
            done = [p for p in os.listdir(parts)
                    if p.startswith("part-") and p.endswith(".tsv")]
            if 1 <= len(done) < n_parts_total:
                os.kill(proc.pid, signal.SIGKILL)
                proc.wait()
                killed = True
                break
        time.sleep(0.05)
    if not killed:
        proc.kill()
        proc.wait()
        if proc.returncode == 0 and not killed:
            pytest.skip("run finished before the kill window (too fast)")
    assert killed, "never reached the kill window"
    survivors = [p for p in os.listdir(parts) if p.startswith("part-")]
    assert 0 < len(survivors) < n_parts_total

    # restart with --resume: must complete and match byte-for-byte
    r = subprocess.run(
        [sys.executable, "-m", "ghostm_tpu"] + args + ["-o", out, "--resume"],
        cwd=REPO, env=env, capture_output=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr.decode()[-800:]
    assert open(out).read() == open(ref_out).read()


def test_checkify_mode(tmp_path):
    """--check runs every batch's search math under checkify (OOB/NaN);
    a clean dataset must pass and produce the identical table."""
    db_fa, reads_fa = make_dataset(
        str(tmp_path / "ck"), n_proteins=20, n_reads=24, read_len=100,
        seed=4,
    )
    prefix = str(tmp_path / "idx")
    out1 = str(tmp_path / "a.tsv")
    out2 = str(tmp_path / "b.tsv")
    assert cli_main(["db", "-i", db_fa, "-o", prefix]) == 0
    base = ["aln", "-d", prefix, "-i", reads_fa, "--no-pallas",
            "--batch", "24"]
    assert cli_main(base + ["-o", out1]) == 0
    assert cli_main(base + ["-o", out2, "--check"]) == 0
    assert open(out1).read() == open(out2).read()
