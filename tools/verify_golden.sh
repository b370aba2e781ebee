#!/bin/bash
# Golden end-to-end verify (see .claude/skills/verify): db + aln + byte diff.
# Usage: tools/verify_golden.sh [workdir]
set -u
T=${1:-$(mktemp -d)}
cd /root/repo
echo "workdir: $T"
[ -f $T/idx.manifest.json ] || python -m ghostm_tpu db -i tests/golden/config1_db.fa -o $T/idx
[ -f $T/idx2.manifest.json ] || python -m ghostm_tpu db -i tests/golden/config1_db.fa -o $T/idx2 --shards 2
echo "--- TPU pallas 1 shard"
timeout 560 python -m ghostm_tpu aln -d $T/idx -i tests/golden/config1_reads.fa -o $T/h1.tsv --pallas --batch 128
diff -q $T/h1.tsv tests/golden/config1_hits.tsv && echo MATCH-TPU-1SHARD
echo "--- TPU pallas 2 shards"
timeout 560 python -m ghostm_tpu aln -d $T/idx2 -i tests/golden/config1_reads.fa -o $T/h2.tsv --pallas --batch 128
diff -q $T/h2.tsv tests/golden/config1_hits.tsv && echo MATCH-TPU-2SHARD
echo "--- CPU mesh 2x2"
timeout 560 python -m ghostm_tpu aln -d $T/idx2 -i tests/golden/config1_reads.fa -o $T/h3.tsv --no-pallas --batch 128 --data-axis 2 --db-axis 2 --cpu 8
diff -q $T/h3.tsv tests/golden/config1_hits.tsv && echo MATCH-CPU-MESH
