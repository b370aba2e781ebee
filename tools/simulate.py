"""Synthetic benchmark data (BASELINE.json config 1): random proteins and
metagenomic-style DNA reads sampled from them (reverse-translated, mutated,
random strand). Deterministic given a seed; ground-truth source subject is
encoded in the read name (`read{i}_from_{subject}`)."""

from __future__ import annotations

import argparse
from typing import List, Tuple

import numpy as np

from ghostm_tpu.ops.translate import _CODON_TABLE

AA20 = "ARNDCQEGHILKMFPSTWYV"
_REV: dict = {}
for _codon, _aa in _CODON_TABLE.items():
    _REV.setdefault(_aa, []).append(_codon)

_COMP = str.maketrans("ACGT", "TGCA")


def random_proteins(rng, n: int, lo: int = 120, hi: int = 400) -> List[str]:
    return [
        "".join(rng.choice(list(AA20), size=int(rng.integers(lo, hi))))
        for _ in range(n)
    ]


def reads_from_proteins(
    rng,
    proteins: List[str],
    n_reads: int,
    read_len: int = 100,
    sub_rate: float = 0.02,
    indel_rate: float = 0.0,
) -> Tuple[List[str], List[str]]:
    """Returns (names, dna_reads). `indel_rate` inserts/deletes single
    CODONS (keeps frames intact) — exercises the long-read banded/chained
    path (BASELINE.json config 5)."""
    names, seqs = [], []
    n_aa = read_len // 3
    for i in range(n_reads):
        pi = int(rng.integers(0, len(proteins)))
        prot = proteins[pi]
        start = int(rng.integers(0, max(1, len(prot) - n_aa)))
        pep = prot[start : start + n_aa]
        if indel_rate > 0:
            pl = list(pep)
            out = []
            for aa in pl:
                r = rng.random()
                if r < indel_rate / 2:
                    continue  # deletion
                out.append(aa)
                if r > 1 - indel_rate / 2:
                    out.append(AA20[int(rng.integers(0, 20))])  # insertion
            pep = "".join(out)
        dna = "".join(_REV[aa][int(rng.integers(0, len(_REV[aa])))] for aa in pep)
        # pad with random bases to the requested read length
        extra = read_len - len(dna)
        if extra > 0:
            dna += "".join(rng.choice(list("ACGT"), size=extra))
        dna = dna[:read_len] if extra < 0 else dna
        # substitutions
        d = list(dna)
        for j in range(len(d)):
            if rng.random() < sub_rate:
                d[j] = "ACGT"[int(rng.integers(0, 4))]
        dna = "".join(d)
        if rng.random() < 0.5:
            dna = dna[::-1].translate(_COMP)
        names.append(f"read{i}_from_subj{pi}")
        seqs.append(dna)
    return names, seqs


def write_fasta(path: str, names: List[str], seqs: List[str]) -> None:
    with open(path, "w") as f:
        for n, s in zip(names, seqs):
            f.write(f">{n}\n{s}\n")


def make_dataset(
    out_prefix: str,
    n_proteins: int = 1000,
    n_reads: int = 1000,
    read_len: int = 100,
    sub_rate: float = 0.02,
    seed: int = 0,
    indel_rate: float = 0.0,
    protein_len=(120, 400),
):
    rng = np.random.default_rng(seed)
    prots = random_proteins(rng, n_proteins, *protein_len)
    write_fasta(
        f"{out_prefix}_db.fa", [f"subj{i}" for i in range(len(prots))], prots
    )
    names, reads = reads_from_proteins(
        rng, prots, n_reads, read_len, sub_rate, indel_rate
    )
    write_fasta(f"{out_prefix}_reads.fa", names, reads)
    return f"{out_prefix}_db.fa", f"{out_prefix}_reads.fa"


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("-o", "--out-prefix", required=True)
    ap.add_argument("--proteins", type=int, default=1000)
    ap.add_argument("--reads", type=int, default=1000)
    ap.add_argument("--read-len", type=int, default=100)
    ap.add_argument("--sub-rate", type=float, default=0.02)
    ap.add_argument("--seed", type=int, default=0)
    a = ap.parse_args()
    make_dataset(a.out_prefix, a.proteins, a.reads, a.read_len, a.sub_rate, a.seed)
