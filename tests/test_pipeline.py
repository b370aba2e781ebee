"""End-to-end pipeline tests via the public CLI (SURVEY.md §4.2 "Pipeline
golden" and "Distributed" shard-invariance), CPU-runnable (config 1)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from ghostm_tpu.cli import main as cli_main
from tools.simulate import make_dataset


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("data")
    return make_dataset(
        str(d / "cfg1"), n_proteins=60, n_reads=60, read_len=100,
        sub_rate=0.02, seed=7,
    )


def _run(db_fa, reads_fa, tmp, shards=1, tag="a", extra=()):
    prefix = str(tmp / f"idx_{tag}")
    out = str(tmp / f"hits_{tag}.tsv")
    assert cli_main(["db", "-i", db_fa, "-o", prefix, "--shards", str(shards)]) == 0
    assert (
        cli_main(
            ["aln", "-d", prefix, "-i", reads_fa, "-o", out, "--no-pallas",
             *(() if "--batch" in extra else ("--batch", "64")), *extra]
        )
        == 0
    )
    with open(out) as f:
        return f.read()


def test_end_to_end_sensitivity(dataset, tmp_path):
    db_fa, reads_fa = dataset
    text = _run(db_fa, reads_fa, tmp_path, shards=1, tag="s1")
    lines = [l for l in text.splitlines()[1:] if l]
    assert len(lines) > 0
    # top hit per read
    top = {}
    for l in lines:
        f = l.split("\t")
        if f[0] not in top:
            top[f[0]] = f[1]
    # >=90% of reads must report their true source subject as the top hit
    correct = sum(1 for q, s in top.items() if q.split("_from_")[1] == s)
    nreads = 60
    assert len(top) >= 0.9 * nreads, f"only {len(top)}/{nreads} reads got hits"
    assert correct >= 0.9 * len(top), f"{correct}/{len(top)} top hits correct"
    # m8 shape: 12 columns, sane values
    for l in lines[:20]:
        f = l.split("\t")
        assert len(f) == 12
        assert 0 < float(f[2]) <= 100.0
        assert int(f[3]) > 0
        qs, qe, ss, se = map(int, f[6:10])
        assert ss >= 1 and se >= ss
        assert qs != qe


def test_shard_invariance(dataset, tmp_path):
    """Identical TSV for 1, 2, 3 shards (SURVEY.md §7.2 determinism)."""
    db_fa, reads_fa = dataset
    ref = _run(db_fa, reads_fa, tmp_path, shards=1, tag="inv1")
    for s in (2, 3):
        got = _run(db_fa, reads_fa, tmp_path, shards=s, tag=f"inv{s}")
        assert got == ref, f"shard count {s} changed results"


def test_checkpoint_resume(dataset, tmp_path):
    """Batch-checkpointed run produces identical output, and resume skips
    completed parts (SURVEY.md §5.3/§5.4)."""
    db_fa, reads_fa = dataset
    ref = _run(db_fa, reads_fa, tmp_path, tag="ck_ref")
    got = _run(
        db_fa, reads_fa, tmp_path, tag="ck",
        extra=["--checkpoint-batches", "1", "--batch", "32"],
    )
    # row sets must match (batching changes nothing but grouping)
    assert sorted(got.splitlines()) == sorted(ref.splitlines())
    # resume with everything done: no recompute, same output
    out = str(tmp_path / "hits_ck.tsv")
    assert cli_main(
        ["aln", "-d", str(tmp_path / "idx_ck"), "-i", reads_fa, "-o", out,
         "--no-pallas", "--checkpoint-batches", "1", "--batch", "32", "--resume"]
    ) == 0
    with open(out) as f:
        assert sorted(f.read().splitlines()) == sorted(ref.splitlines())


def test_async_path_equals_sync(dataset, tmp_path):
    """search_refine_async must be bit-identical to search_batch + refine
    (the pipeline's software-pipelined fast path vs the reference path)."""
    from ghostm_tpu.config import Config
    from ghostm_tpu.engine import SearchEngine
    from ghostm_tpu.index.diskio import load_index
    from ghostm_tpu.io.fasta import read_batches

    db_fa, reads_fa = dataset
    prefix = str(tmp_path / "idx_async")
    assert cli_main(["db", "-i", db_fa, "-o", prefix, "--shards", "2"]) == 0
    cfg = Config(query_batch=64)
    eng = SearchEngine(cfg, load_index(prefix), use_pallas=False)
    names, dna, lens = next(iter(read_batches(reads_fa, 64, 100)))
    qc = eng.translate(dna, lens)
    hits = eng.search_batch(qc)
    stats = eng.refine(qc, hits)
    arr = np.asarray(eng.search_refine_async(qc))
    hits2, stats2 = eng.unpack_results(arr)
    for f in hits.__dataclass_fields__:
        np.testing.assert_array_equal(
            getattr(hits, f), getattr(hits2, f), err_msg=f"hit field {f}"
        )
    for k in stats:
        np.testing.assert_array_equal(stats[k], stats2[k], err_msg=k)
    # the dna-input program (in-graph device translation + 6-word packed
    # transport, the pipeline's operative path) must reproduce every
    # writer-visible field of the full payload, incl. a padded tail batch
    def check_packed(arr_full, arr_packed, msg):
        h1, s1 = eng.unpack_results(np.asarray(arr_full))
        h2, s2 = eng.unpack_results(np.asarray(arr_packed))
        for f in ("score", "gsid", "frame", "s_end"):
            np.testing.assert_array_equal(
                getattr(h1, f), getattr(h2, f), err_msg=f"{msg}: {f}"
            )
        for k in ("qstart", "qend", "sstart", "send", "length", "matches",
                  "mismatch", "gapopen"):
            np.testing.assert_array_equal(s1[k], s2[k], err_msg=f"{msg}:{k}")

    assert eng._pack_ok
    arr3 = eng.search_refine_async_dna(dna, lens)
    assert arr3.shape[0] == 6
    check_packed(arr, arr3, "dna full-step")
    tail = eng.search_refine_async_dna(dna[:17], lens[:17])
    qc_t = eng.translate(dna[:17], lens[:17])
    check_packed(eng.search_refine_async(qc_t), tail, "dna tail batch")
