#!/bin/bash
# Golden end-to-end verify (see .claude/skills/verify): db + aln + byte diff.
# Usage: tools/verify_golden.sh [workdir]
# Exits NONZERO on ANY failure: index build, aln run, or output mismatch
# (r03 verdict weak #3: the old version could exit 0 after a total failure).
set -euo pipefail
T=${1:-$(mktemp -d)}
cd /root/repo
echo "workdir: $T"
fail=0
check() {  # check <label> <produced> <golden>
  if diff -q "$2" "$3"; then
    echo "MATCH-$1"
  else
    echo "FAIL-$1" >&2
    fail=1
  fi
}
[ -f "$T/idx.manifest.json" ] || python -m ghostm_tpu db -i tests/golden/config1_db.fa -o "$T/idx"
[ -f "$T/idx2.manifest.json" ] || python -m ghostm_tpu db -i tests/golden/config1_db.fa -o "$T/idx2" --shards 2
echo "--- TPU pallas 1 shard"
timeout 560 python -m ghostm_tpu aln -d "$T/idx" -i tests/golden/config1_reads.fa -o "$T/h1.tsv" --pallas --batch 128
check TPU-1SHARD "$T/h1.tsv" tests/golden/config1_hits.tsv
echo "--- TPU pallas 2 shards"
timeout 560 python -m ghostm_tpu aln -d "$T/idx2" -i tests/golden/config1_reads.fa -o "$T/h2.tsv" --pallas --batch 128
check TPU-2SHARD "$T/h2.tsv" tests/golden/config1_hits.tsv
echo "--- CPU mesh 2x2"
timeout 560 python -m ghostm_tpu aln -d "$T/idx2" -i tests/golden/config1_reads.fa -o "$T/h3.tsv" --no-pallas --batch 128 --data-axis 2 --db-axis 2 --cpu 8
check CPU-MESH "$T/h3.tsv" tests/golden/config1_hits.tsv
if [ -f tests/golden/config1_b50_hits.tsv ]; then
  echo "--- TPU pallas BLOSUM50 (nibble-overflow matrix -> score-fed kernel)"
  timeout 560 python -m ghostm_tpu aln -d "$T/idx" -i tests/golden/config1_reads.fa -o "$T/h5.tsv" --pallas --batch 128 --matrix BLOSUM50 --gap-open 13 --gap-extend 2
  check TPU-B50 "$T/h5.tsv" tests/golden/config1_b50_hits.tsv
fi
if [ -f tests/golden/longread_hits.tsv ]; then
  echo "--- TPU pallas long-read (5kbp chained)"
  [ -f "$T/lidx.manifest.json" ] || python -m ghostm_tpu db -i tests/golden/longread_db.fa -o "$T/lidx" --config tests/golden/longread_cfg.json
  timeout 560 python -m ghostm_tpu aln -d "$T/lidx" -i tests/golden/longread_reads.fa -o "$T/h4.tsv" --pallas --config tests/golden/longread_cfg.json --max-read-len 5300
  check TPU-LONGREAD "$T/h4.tsv" tests/golden/longread_hits.tsv
fi
exit $fail
