"""Dev probe: TRUE device time of the fused SW kernel via in-graph
repetition — a lax.fori_loop with a DYNAMIC trip count runs the kernel n
times inside ONE XLA program (one dispatch, one compile), so
(t(n2) - t(n1)) / (n2 - n1) is pure device time with every per-call
tunnel/dispatch cost cancelled.

Motivation: the r02 chained-dispatch protocol reads ~4.2 ms/call for the
config-2 fused kernel, but a trivial probe kernel ALSO reads ~4-5 ms
regardless of its op count — the per-call floor on the axon tunnel is
~4 ms even when calls are queued asynchronously, so chained-dispatch
numbers are a LOWER bound on throughput, not an estimate of it.

The kernel input is XORed with the loop index each iteration (one cheap
vector op over the 14 MB query slab) so XLA cannot hoist the pallas_call
out of the loop as loop-invariant.

Usage: python tools/probe_devtime.py [--width W] [--interleave IL]
"""

import argparse
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


def build(N, Lq, B, W, il):
    h = B // 2
    A = Lq + h - 1
    atile = -(-A // sw_fused.UNROLL) * sw_fused.UNROLL
    Ap = atile
    SH = int(Ap + 2 * h).bit_length()
    G = N // W
    words, climit = sw_fused.build_packed_matrix(padded_matrix())
    key = jax.random.PRNGKey
    qrow_t = jax.random.randint(key(0), (G, Ap, W), 0, 20, jnp.int32)
    wins_t = jax.random.randint(key(1), (G, Ap, W), 0, 20, jnp.int32)
    whead_t = jax.random.randint(key(2), (G, h, W), 0, 20, jnp.int32)
    call = functools.partial(
        sw_fused.kernel_call, packed_words=words, band=B, gap_open=11,
        gap_extend=1, atile=atile, pack_shift=SH, code_limit=climit,
        cells=N * Lq * B, interleave=il,
    )

    @jax.jit
    def reps(n):
        def body(i, acc):
            q = qrow_t ^ (i & 1)          # defeat loop-invariant hoisting
            pe, po = call(q, wins_t, whead_t)
            return acc + pe[0, 0, 0]

        return jax.lax.fori_loop(0, n, body, jnp.int32(0))

    return reps


def timeit(f, n, inner=3):
    np.asarray(f(jnp.int32(n)))      # warm this trip count's path
    best = float("inf")
    for _ in range(inner):
        t = time.time()
        np.asarray(f(jnp.int32(n)))
        best = min(best, time.time() - t)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=0)
    ap.add_argument("--interleave", type=int, default=0)
    ap.add_argument("--n1", type=int, default=4)
    ap.add_argument("--n2", type=int, default=36)
    ap.add_argument("-o", "--output", default="")
    args = ap.parse_args()
    from ghostm_tpu.cli import _enable_compile_cache

    _enable_compile_cache()
    N, Lq, B = 65536, 40, 32
    W = args.width or sw_fused.DEFAULT_WIDTH
    il = args.interleave or sw_fused.DEFAULT_INTERLEAVE
    cells = N * Lq * B
    f = build(N, Lq, B, W, il)
    t1 = timeit(f, args.n1)
    t2 = timeit(f, args.n2)
    per = (t2 - t1) / (args.n2 - args.n1)
    out = {
        "protocol": "fori_loop(n) slope: (t(n2)-t(n1))/(n2-n1), "
                    f"n1={args.n1} n2={args.n2}, one compiled program, "
                    "per-call dispatch cancelled",
        "lane_width": W, "interleave": il,
        "t_n1_s": round(t1, 4), "t_n2_s": round(t2, 4),
        "device_ms_per_call": round(per * 1e3, 4),
        "kernel_gcups": round(cells / per / 1e9, 2),
    }
    print(json.dumps(out), flush=True)
    if args.output:
        with open(args.output, "w") as fo:
            json.dump(out, fo, indent=1)


if __name__ == "__main__":
    main()
