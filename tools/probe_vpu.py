"""Dev probe: achievable VPU elem-op rate by dtype, measured as the SLOPE
of device time vs dependent-chain length K — and with the kernel repeated
inside a dynamic-trip-count lax.fori_loop so per-call tunnel dispatch
(~4 ms floor on axon, see tools/probe_devtime.py) cancels exactly.

Two slope cancellations compose here:
  * fori_loop(n) slope removes per-call dispatch;
  * K2 - K1 slope removes the kernel's fixed load/store cost, leaving
    pure ALU chain throughput.

Ops alternate max(x - 1, ref) / x + 1 so neither op is provably
redundant (ADVICE r02: a monotone x made `max(x, ref)` elidable).
Unsupported dtype/op combos (e.g. int16 max does not legalize in this
Mosaic toolchain) are caught and reported, not fatal.

Usage: python tools/probe_vpu.py
"""

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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, WIDTH, GRID = 256, 256, 512


def make_chain(dtype, K, regonly=False):
    """fori_loop(n)-wrapped kernel: per element, K dependent ops.

    regonly=True removes the per-op VMEM re-load (the load-bearing form
    is throttled to ~1 load per 2 ops): two accumulators feed each other
    — x = max(x - 1, y); y = max(y + 1, x) — mutually dependent, no
    closed form a peephole pass can fold, no memory traffic in the chain.
    """

    def kernel(x_ref, o_ref):
        x = x_ref[:]
        one = jnp.ones((), dtype)
        if regonly:
            y = x + one
            for i in range(K // 2):
                x = jnp.maximum(x - one, y)
                y = jnp.maximum(y + one, x)
            o_ref[:] = jnp.minimum(x, y)
        else:
            for i in range(K // 2):
                x = jnp.maximum(x - one, x_ref[:])
                x = x + one
            o_ref[:] = x

    def call(x):
        return pl.pallas_call(
            kernel,
            grid=(GRID,),
            in_specs=[pl.BlockSpec((1, ROWS, WIDTH), lambda g: (g, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, ROWS, WIDTH), lambda g: (g, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((GRID, ROWS, WIDTH), dtype),
        )(x)

    @jax.jit
    def reps(x, n):
        def body(i, acc):
            y = call(x + (i & 1).astype(dtype))   # defeat hoisting
            return acc + y[0, 0, 0].astype(jnp.int32)

        return jax.lax.fori_loop(0, n, body, jnp.int32(0))

    return reps


def timeit(f, x, n, inner=3):
    np.asarray(f(x, jnp.int32(n)))
    best = float("inf")
    for _ in range(inner):
        t = time.time()
        np.asarray(f(x, jnp.int32(n)))
        best = min(best, time.time() - t)
    return best


def main():
    from ghostm_tpu.cli import _enable_compile_cache

    _enable_compile_cache()
    elems = GRID * ROWS * WIDTH
    N1, N2 = 2, 10
    REPEATS = 5
    results = {}
    for dtype in (jnp.int32, jnp.float32):
        for regonly in (False, True):
            name = jnp.dtype(dtype).name + ("_regonly" if regonly else "")
            try:
                xs = jnp.asarray(
                    np.random.default_rng(0).integers(
                        0, 7, (GRID, ROWS, WIDTH)), dtype,
                )
                f64 = make_chain(dtype, 64, regonly)
                f512 = make_chain(dtype, 512, regonly)
                # r04 (VERDICT weak #5): the probe's run-to-run variance on
                # this shared host is the claim-limiting factor — measure it.
                # REPEATS independent double-slope estimates; report
                # min/median/max and spread = (max - min) / median.
                rates = []
                for _ in range(REPEATS * 2):
                    if len(rates) >= REPEATS:
                        break
                    per = {}
                    for K, f in ((64, f64), (512, f512)):
                        t1 = timeit(f, xs, N1)
                        t2 = timeit(f, xs, N2)
                        per[K] = (t2 - t1) / (N2 - N1)
                    slope = (per[512] - per[64]) / (512 - 64)
                    if slope > 0:
                        rates.append(elems / slope / 1e12)
                if not rates:
                    raise RuntimeError("all slope attempts non-positive")
                rates.sort()
                med = rates[len(rates) // 2]
                spread = (rates[-1] - rates[0]) / med
                results[name] = {
                    "tops_per_s": round(med, 3),
                    "tops_min": round(rates[0], 3),
                    "tops_max": round(rates[-1], 3),
                    "spread": round(spread, 3),
                    "n_estimates": len(rates),
                }
                print(f"{name:16s}: {med:6.2f} Tops/s "
                      f"[{rates[0]:.2f}, {rates[-1]:.2f}] "
                      f"spread {spread:.2f}", flush=True)
            except Exception as e:
                results[name] = {
                    "error": f"{type(e).__name__}: {str(e)[:160]}"
                }
                print(f"{name:16s}: UNSUPPORTED ({type(e).__name__})",
                      flush=True)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "VPU_PROBE.json")
    with open(path, "w") as f:
        json.dump({
            "protocol": "double slope: fori_loop(n) trip-count slope "
                        "cancels per-call dispatch; K in {64,512} chain "
                        f"slope cancels fixed kernel cost; elems={elems}; "
                        "ops alternate max(x-1, ref) / x+1 so neither is "
                        "provably redundant",
            "device": str(jax.devices()[0]),
            "dtypes": results,
        }, f, indent=1)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
