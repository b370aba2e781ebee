"""Long-read mode (BASELINE.json config 5): 1-10 kbp queries through the
row-tiled SW kernel, with collinear seed chaining picking band centers
(kernels/candidates.py chain DP; the 900 bp case keeps the older
neighbour-bin smoothing covered)."""

import json
import os

import numpy as np
import pytest

from ghostm_tpu.cli import main as cli_main
from tools.simulate import make_dataset


def test_long_reads_end_to_end(tmp_path):
    db_fa, reads_fa = make_dataset(
        str(tmp_path / "lr"), n_proteins=30, n_reads=16, read_len=900,
        sub_rate=0.01, indel_rate=0.02, seed=11, protein_len=(350, 500),
    )
    prefix = str(tmp_path / "idx")
    out = str(tmp_path / "hits.tsv")
    cfg = {
        "query_frame_len": 384,
        "band_width": 32,
        "smooth_bins": True,
        "query_batch": 16,
    }
    cfgf = str(tmp_path / "cfg.json")
    with open(cfgf, "w") as f:
        json.dump(cfg, f)
    assert cli_main(["db", "-i", db_fa, "-o", prefix, "--config", cfgf]) == 0
    assert cli_main(
        ["aln", "-d", prefix, "-i", reads_fa, "-o", out, "--no-pallas",
         "--config", cfgf, "--max-read-len", "1200"]
    ) == 0
    lines = [l for l in open(out).read().splitlines()[1:] if l]
    top = {}
    for l in lines:
        f = l.split("\t")
        top.setdefault(f[0], f[1])
    correct = sum(1 for q, s in top.items() if q.split("_from_")[1] == s)
    assert len(top) >= 14, f"only {len(top)}/16 long reads got hits"
    assert correct >= 0.85 * len(top)
    # long alignments should actually be long (hundreds of columns)
    maxlen = max(int(l.split("\t")[3]) for l in lines)
    assert maxlen > 150, f"longest alignment only {maxlen} columns"


def _run_longread(tmp_path, read_len, frame_len, band, n_proteins, n_reads,
                  protein_len, min_top=0.85, candidates=4):
    """Config-5 end-to-end: long reads with 2% codon indels + 1% subs,
    collinear chaining ON, through the CLI. Asserts >= min_top of reads
    rank their true source protein first."""
    db_fa, reads_fa = make_dataset(
        str(tmp_path / "lr"), n_proteins=n_proteins, n_reads=n_reads,
        read_len=read_len, sub_rate=0.01, indel_rate=0.02, seed=5,
        protein_len=protein_len,
    )
    prefix = str(tmp_path / "idx")
    out = str(tmp_path / "hits.tsv")
    cfg = {
        "query_frame_len": frame_len,
        "band_width": band,
        "seed_len": 4,          # k=4: noise votes/bin << chain_gamma
        "chain_gamma": 2,
        "query_batch": n_reads,
        "candidates_per_frame": candidates,
    }
    cfgf = str(tmp_path / "cfg.json")
    with open(cfgf, "w") as f:
        json.dump(cfg, f)
    assert cli_main(["db", "-i", db_fa, "-o", prefix, "--config", cfgf]) == 0
    assert cli_main(
        ["aln", "-d", prefix, "-i", reads_fa, "-o", out, "--no-pallas",
         "--config", cfgf, "--max-read-len", str(read_len + 300)]
    ) == 0
    lines = [l for l in open(out).read().splitlines()[1:] if l]
    top = {}
    for l in lines:
        f = l.split("\t")
        top.setdefault(f[0], f[1])
    correct = sum(1 for q, s in top.items() if q.split("_from_")[1] == s)
    assert len(top) >= n_reads - 1, f"only {len(top)}/{n_reads} reads got hits"
    assert correct >= min_top * len(top), (correct, len(top))
    maxlen = max(int(l.split("\t")[3]) for l in lines)
    return maxlen


def test_long_reads_5kbp(tmp_path):
    maxlen = _run_longread(
        tmp_path, read_len=5000, frame_len=1728, band=64,
        n_proteins=12, n_reads=8, protein_len=(1750, 1850),
    )
    # a 5 kbp read's alignment should span ~1.6k columns
    assert maxlen > 1000, f"longest alignment only {maxlen} columns"


def test_long_reads_10kbp(tmp_path):
    maxlen = _run_longread(
        tmp_path, read_len=9999, frame_len=3456, band=128,
        n_proteins=6, n_reads=5, protein_len=(3400, 3500),
    )
    assert maxlen > 2000, f"longest alignment only {maxlen} columns"


def test_row_tiling_invariance(rng):
    """Same scores through rtile=Lq vs rtile splitting must agree (the
    Pallas grid-carry path, interpret mode)."""
    import jax.numpy as jnp

    from ghostm_tpu.kernels import sw_pallas, sw_xla
    from ghostm_tpu.ops.scoring import padded_matrix

    MAT = padded_matrix()
    N, Lq, B = 128, 64, 16
    qs = rng.integers(0, 20, (N, Lq)).astype(np.int32)
    ws = rng.integers(0, 20, (N, Lq + B)).astype(np.int32)
    sc = sw_xla.banded_scores(jnp.asarray(qs), jnp.asarray(ws), jnp.asarray(MAT), B)
    outs = []
    for rt in (64, 32, 16):
        outs.append(
            tuple(
                np.asarray(x)
                for x in sw_pallas.sw_banded_pallas(
                    sc, 11, 1, row_tile=rt, interpret=True
                )
            )
        )
    for o in outs[1:]:
        for a, b in zip(outs[0], o):
            np.testing.assert_array_equal(a, b)
