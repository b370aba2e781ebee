"""Analytic collective-cost model for the distributed search step
(VERDICT r02 weak #2 / next-round #3): the virtual CPU mesh shares two
host cores across N devices, so its measured "efficiency" mixes real
sharded-program overhead with scheduler contention. This model computes
what the collectives actually MOVE, from the program structure
(parallel/search.py) and the config — the honest basis for a pod-scaling
prediction on real ICI/DCN.

Per batch (R reads, Qf = 6R frames, C candidates/frame, K hits, band B,
Lq frame residues), along the "db" axis of size S:

  phase 2  all_gather of (pg, pb, pv):  3 * Qf * C * 4 bytes, gathered
           from S shards -> each link carries (S-1)/S of it;
  phase 3  psum of 7 disjoint-masked hit fields: 7 * Qf * C * 4 bytes;
  phase 4  psum of refine windows + lo/hi: (R*K*(Lq+B) + 2*R*K) * 4.

Along "data" there is NO collective — query batches are independent.

Cost model: ring all_gather/all_reduce on ICI, time =
bytes * 2(S-1)/S / link_bw (all_reduce = reduce_scatter + all_gather).
v5e ICI: ~186 GB/s usable per direction per chip (scaling-book class
numbers; the conclusion is insensitive to 2x either way).

Usage: python tools/model_collectives.py [-o COLLECTIVE_MODEL.json]
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ICI_BW = 186e9          # bytes/s usable per direction, v5e class
DCN_BW = 25e9           # bytes/s per host, conservative


def model(R=4096, C=8, K=10, Lq=40, B=32, S=2, step_ms=180.0, bw=ICI_BW):
    Qf = 6 * R
    gather_b = 3 * Qf * C * 4
    psum_hits_b = 7 * Qf * C * 4
    psum_refine_b = (R * K * (Lq + B) + 2 * R * K) * 4
    # ring costs: all_gather moves (S-1)/S of the payload per link;
    # all_reduce (psum) moves 2(S-1)/S
    t_gather = gather_b * (S - 1) / S / bw
    t_psum = (psum_hits_b + psum_refine_b) * 2 * (S - 1) / S / bw
    t_coll = t_gather + t_psum
    eff = step_ms / 1e3 / (step_ms / 1e3 + t_coll)
    return {
        "R": R, "db_shards": S,
        "all_gather_mb": round(gather_b / 1e6, 2),
        "psum_mb": round((psum_hits_b + psum_refine_b) / 1e6, 2),
        "collective_ms": round(t_coll * 1e3, 3),
        "step_ms": step_ms,
        "predicted_efficiency": round(eff, 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-o", "--output", default="")
    args = ap.parse_args()
    rows = []
    for S, bw, label in ((2, ICI_BW, "ici"), (4, ICI_BW, "ici"),
                         (8, ICI_BW, "ici"), (2, DCN_BW, "dcn_2host")):
        r = model(S=S, bw=bw)
        r["fabric"] = label
        rows.append(r)
        print(json.dumps(r), flush=True)
    out = {
        "protocol": "bytes from parallel/search.py program structure at "
                    "config-2 batch shapes (R=4096, C=8, K=10, Lq=40, "
                    "B=32, step 180 ms measured single-chip); ring "
                    "all_gather (S-1)/S and all_reduce 2(S-1)/S per link; "
                    "ICI 186 GB/s/dir, DCN 25 GB/s/host",
        "rows": rows,
        "conclusion": "collectives move ~7-18 MB/batch vs a 180 ms "
                      "compute step: <0.1% on ICI and <1% on DCN — the "
                      "distributed step is compute-bound at any realistic "
                      "shard count; virtual-CPU-mesh efficiency losses are "
                      "host-core contention artifacts, not program cost",
    }
    path = args.output or os.path.join(REPO, "COLLECTIVE_MODEL.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
