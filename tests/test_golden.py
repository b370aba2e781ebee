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
