"""Pipeline golden test (SURVEY.md §4.2 "Pipeline golden", config 1):
committed dataset + committed expected TSV; ANY diff fails. Doubles as the
bit-identical agreement harness once reference outputs exist (compare with
tools/compare_hits.py)."""

import os

from ghostm_tpu.cli import main as cli_main

HERE = os.path.dirname(__file__)
GOLD = os.path.join(HERE, "golden")


def test_config1_golden(tmp_path):
    prefix = str(tmp_path / "idx")
    out = str(tmp_path / "hits.tsv")
    assert cli_main(
        ["db", "-i", os.path.join(GOLD, "config1_db.fa"), "-o", prefix]
    ) == 0
    assert cli_main(
        ["aln", "-d", prefix, "-i", os.path.join(GOLD, "config1_reads.fa"),
         "-o", out, "--no-pallas", "--batch", "128"]
    ) == 0
    with open(out) as f:
        got = f.read()
    with open(os.path.join(GOLD, "config1_hits.tsv")) as f:
        want = f.read()
    assert got == want, "golden config-1 hit table changed"


def test_config1_blosum50_golden(tmp_path):
    """Same config-1 dataset scored with BLOSUM50 / gap 13,2 — a matrix
    whose [-5, 15] range overflows the fused kernel's nibble packing, so
    this pins the score-fed fallback path end-to-end (engine routes it
    automatically; tools/verify_golden.sh runs the same check --pallas on
    the chip). 460 rows vs BLOSUM62's 550 — genuinely different table."""
    prefix = str(tmp_path / "idx")
    out = str(tmp_path / "hits.tsv")
    assert cli_main(
        ["db", "-i", os.path.join(GOLD, "config1_db.fa"), "-o", prefix]
    ) == 0
    assert cli_main(
        ["aln", "-d", prefix, "-i", os.path.join(GOLD, "config1_reads.fa"),
         "-o", out, "--no-pallas", "--batch", "128",
         "--matrix", "BLOSUM50", "--gap-open", "13", "--gap-extend", "2"]
    ) == 0
    with open(out) as f:
        got = f.read()
    with open(os.path.join(GOLD, "config1_b50_hits.tsv")) as f:
        want = f.read()
    assert got == want, "golden BLOSUM50 hit table changed"


def test_longread_golden(tmp_path):
    """Committed 5 kbp chained-long-read dataset (config 5): byte-stable
    hit table through the CPU path. The TPU --pallas leg diffs against the
    same file in tools/verify_golden.sh."""
    prefix = str(tmp_path / "idx")
    out = str(tmp_path / "hits.tsv")
    cfgf = os.path.join(GOLD, "longread_cfg.json")
    assert cli_main(
        ["db", "-i", os.path.join(GOLD, "longread_db.fa"), "-o", prefix,
         "--config", cfgf]
    ) == 0
    assert cli_main(
        ["aln", "-d", prefix, "-i", os.path.join(GOLD, "longread_reads.fa"),
         "-o", out, "--no-pallas", "--config", cfgf,
         "--max-read-len", "5300"]
    ) == 0
    with open(out) as f:
        got = f.read()
    with open(os.path.join(GOLD, "longread_hits.tsv")) as f:
        want = f.read()
    assert got == want, "golden long-read hit table changed"
