"""Two jax.distributed CPU processes == single process, bit-identical
(SURVEY.md §4.2 "Multi-host"; fault-injection resume equivalence lives in
test_pipeline.py's checkpoint tests)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from ghostm_tpu.config import Config
from ghostm_tpu.index import diskio, seeds, store
from ghostm_tpu.ops.encode import encode_aa, encode_dna
from tools.simulate import random_proteins, reads_from_proteins


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_two_process_equivalence(tmp_path):
    rng = np.random.default_rng(5)
    cfg = Config(query_batch=8, max_hits=5)
    prots = random_proteins(rng, 24, lo=60, hi=120)
    records = [(f"s{i}", p.encode()) for i, p in enumerate(prots)]
    keep = seeds.global_bucket_truncation(
        [encode_aa(s) for _, s in records], cfg.seed_len, cfg.hits_per_seed
    )
    assign = store.shard_records(records, 2)
    shards = []
    for ids in assign:
        st = store.build_store(
            [records[i] for i in ids], cfg.sentinel_pad, subject_ids=ids
        )
        kb = np.zeros(len(st.buffer), dtype=bool)
        for r, gi in enumerate(ids):
            kb[st.starts[r] : st.starts[r] + len(keep[gi])] = keep[gi]
        shards.append(
            diskio.IndexShard(
                st, seeds.build_seed_index(st.buffer, cfg.seed_len, kb)
            )
        )
    diskio.save_index(str(tmp_path / "idx"), shards, cfg.seed_len)
    import dataclasses

    np.savez(tmp_path / "cfg.npz", cfg=dataclasses.asdict(cfg))

    from ghostm_tpu.ops.translate import six_frame_translate

    names, reads = reads_from_proteins(rng, prots, 8, read_len=90)
    dna = np.full((8, 90), 4, np.int8)
    lens = np.zeros(8, np.int32)
    for i, r in enumerate(reads):
        c = encode_dna(r)
        dna[i, : len(c)] = c
        lens[i] = len(c)
    qcodes = six_frame_translate(dna, lens, cfg.query_frame_len)
    np.save(tmp_path / "qcodes.npy", qcodes)

    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, str(pid), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out.decode())
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("multi-process jax.distributed timed out in this env")
    for p, out in zip(procs, outs):
        if p.returncode != 0:
            # skip ONLY on environment-level init failures, not real bugs
            if ("jax.distributed.initialize" in out and "Error" in out) or \
               "UNIMPLEMENTED" in out or "gloo unavailable" in out.lower():
                pytest.skip(f"jax.distributed CPU unsupported here: {out[-400:]}")
            raise AssertionError(f"worker failed:\n{out}")
    assert all("ok" in o for o in outs)


def test_two_process_cli_run(tmp_path):
    """Config-4 shape end-to-end through the CLI: two jax.distributed CPU
    processes, data axis across processes, row-addressed result parts ->
    final TSV identical to a single-process mesh run."""
    from tools.simulate import make_dataset
    import json as _json

    db_fa, reads_fa = make_dataset(
        str(tmp_path / "mp"), n_proteins=30, n_reads=32, read_len=100,
        seed=9,
    )
    prefix = str(tmp_path / "idx")
    cfgf = str(tmp_path / "cfg.json")
    with open(cfgf, "w") as f:
        _json.dump({"query_batch": 16, "checkpoint_batches": 1,
                    "max_hits": 5}, f)
    env = dict(os.environ)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    r = subprocess.run(
        [sys.executable, "-m", "ghostm_tpu", "db", "-i", db_fa, "-o",
         prefix, "--config", cfgf],
        capture_output=True, env=env, timeout=120,
    )
    assert r.returncode == 0, r.stderr.decode()[-500:]

    # single-process mesh reference (2 virtual devices)
    ref = str(tmp_path / "ref.tsv")
    base = ["-m", "ghostm_tpu", "aln", "-d", prefix, "-i", reads_fa,
            "--config", cfgf, "--no-pallas", "--data-axis", "2",
            "--db-axis", "1"]
    r = subprocess.run(
        [sys.executable] + base + ["-o", ref, "--cpu", "2"],
        capture_output=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr.decode()[-500:]

    out = str(tmp_path / "mp.tsv")
    coord = f"127.0.0.1:{_free_port()}"
    procs = [
        subprocess.Popen(
            [sys.executable] + base + [
                "-o", out, "--cpu", "1", "--coordinator", coord,
                "--num-processes", "2", "--process-id", str(pid),
            ],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            o, _ = p.communicate(timeout=240)
            outs.append(o.decode())
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("multi-process jax.distributed timed out in this env")
    for p, o in zip(procs, outs):
        if p.returncode != 0:
            if "UNIMPLEMENTED" in o or "gloo" in o.lower():
                pytest.skip(f"jax.distributed CPU unsupported: {o[-300:]}")
            raise AssertionError(f"CLI worker failed:\n{o[-1500:]}")
    assert open(out).read() == open(ref).read()
