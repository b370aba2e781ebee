"""Field-wise agreement between two hit TSVs (SURVEY.md §4.2 "Agreement").

Built now so that when the reference checkout (and its outputs) appear, the
bit-identical-table check (BASELINE.json target) is a one-command diff:

  python tools/compare_hits.py ours.tsv reference.tsv

Agreement is measured on the ranking-relevant fields (query, subject, score
proxy = bitscore, coordinates); exact-row match is reported separately.
"""

from __future__ import annotations

import argparse
import sys
from typing import Dict, List, Tuple


def load_hits(path: str) -> Dict[str, List[Tuple]]:
    """query -> ordered list of (subject, qstart, qend, sstart, send, bitscore)."""
    out: Dict[str, List[Tuple]] = {}
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or line.startswith(("#", "qseqid\t")):
                continue
            fld = line.split("\t")
            if len(fld) < 12:
                continue
            out.setdefault(fld[0], []).append(
                (fld[1], fld[6], fld[7], fld[8], fld[9], fld[11])
            )
    return out


def compare(a_path: str, b_path: str) -> dict:
    a, b = load_hits(a_path), load_hits(b_path)
    queries = set(a) | set(b)
    top_match = row_match = n_rows_a = n_rows_b = common_q = 0
    for q in queries:
        ra, rb = a.get(q, []), b.get(q, [])
        n_rows_a += len(ra)
        n_rows_b += len(rb)
        if ra and rb:
            common_q += 1
            if ra[0][0] == rb[0][0]:  # same top subject
                top_match += 1
            row_match += sum(1 for x, y in zip(ra, rb) if x == y)
    return {
        "queries_a": len(a),
        "queries_b": len(b),
        "common_queries": common_q,
        "rows_a": n_rows_a,
        "rows_b": n_rows_b,
        "top_subject_agreement": round(top_match / max(common_q, 1), 4),
        "exact_row_agreement": round(
            row_match / max(min(n_rows_a, n_rows_b), 1), 4
        ),
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("a")
    ap.add_argument("b")
    args = ap.parse_args(argv)
    import json

    res = compare(args.a, args.b)
    print(json.dumps(res, indent=2))
    return 0 if res["exact_row_agreement"] == 1.0 else 1


if __name__ == "__main__":
    sys.exit(main())
