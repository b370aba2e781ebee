"""Dev probe: on-chip sweep of the fused SW kernel's tuning knobs
(lane_width x interleave) at config-2 shapes (a_tile is moot there: Lq=40
gives a single 56-row a-tile), chained-dispatch timing (bench.py
protocol). Writes TUNE_r03.json. Usage: python tools/probe_tune.py"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp

from ghostm_tpu.kernels import sw_fused
from ghostm_tpu.ops.scoring import padded_matrix

SCAN_LEN = 8


def timed(f):
    red = lambda: jnp.sum(jax.tree_util.tree_leaves(f())[0].astype(jnp.int32))
    np.asarray(red())
    best = float("inf")
    for _ in range(3):
        t = time.time()
        acc = jnp.int32(0)
        for _ in range(SCAN_LEN):
            acc = acc + red()
        np.asarray(acc)
        best = min(best, (time.time() - t) / SCAN_LEN)
    return best


def main():
    from ghostm_tpu.cli import _enable_compile_cache

    _enable_compile_cache()
    rng = np.random.default_rng(0)
    N, Lq, B = 65536, 40, 32
    words, climit = sw_fused.build_packed_matrix(padded_matrix())
    qs = jnp.asarray(rng.integers(0, 20, (N, Lq)).astype(np.int32))
    ws = jnp.asarray(rng.integers(0, 20, (N, Lq + B)).astype(np.int32))
    lo = jnp.zeros(N, jnp.int32)
    hi = jnp.full(N, 1 << 20, jnp.int32)
    cells = N * Lq * B
    rows = []
    for W in (128, 256, 512):
        for il in (1, 2, 4, 8):
            try:
                fn = functools.partial(
                    sw_fused.sw_fused_wave, qs, ws, words, lo, hi, 11, 1, B,
                    code_limit=climit, lane_width=W, interleave=il,
                )
                dt = timed(fn)
                gc = cells / dt / 1e9
                rows.append({"lane_width": W, "interleave": il,
                             "gcups": round(gc, 2), "ms": round(dt * 1e3, 3)})
                print(f"W={W} il={il}: {gc:7.2f} GCUPS "
                      f"({dt*1e3:.2f} ms)", flush=True)
            except Exception as e:
                rows.append({"lane_width": W, "interleave": il,
                             "error": f"{type(e).__name__}: {str(e)[:160]}"})
                print(f"W={W} il={il}: FAIL {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)
    best = max((r for r in rows if "gcups" in r), key=lambda r: r["gcups"],
               default=None)
    out = {
        "protocol": "chained dispatch (SCAN_LEN=8), best of 3, config-2 "
                    "shapes N=65536 Lq=40 B=32, cells=N*Lq*B",
        "device": str(jax.devices()[0]),
        "rows": rows,
        "best": best,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "TUNE_r03.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}; best={best}", flush=True)


if __name__ == "__main__":
    main()
