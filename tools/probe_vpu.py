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

ROWS, WIDTH, GRID = 256, 256, 64


def make_chain(dtype, K):
    """fori_loop(n)-wrapped kernel: per element, K dependent ops."""

    def kernel(x_ref, o_ref):
        x = x_ref[:]
        one = jnp.ones((), dtype)
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
    N1, N2 = 2, 18
    results = {}
    for dtype in (jnp.int32, jnp.float32, jnp.bfloat16, jnp.int16, jnp.int8):
        name = jnp.dtype(dtype).name
        try:
            xs = jnp.asarray(
                np.random.default_rng(0).integers(0, 7, (GRID, ROWS, WIDTH)),
                dtype,
            )
            per = {}
            for K in (16, 128):
                f = make_chain(dtype, K)
                t1 = timeit(f, xs, N1)
                t2 = timeit(f, xs, N2)
                per[K] = (t2 - t1) / (N2 - N1)
            slope = (per[128] - per[16]) / (128 - 16)   # s per chain-op
            rate = elems / slope / 1e12 if slope > 0 else float("nan")
            results[name] = {
                "tops_per_s": round(rate, 3),
                "t16_ms": round(per[16] * 1e3, 3),
                "t128_ms": round(per[128] * 1e3, 3),
            }
            print(f"{name:9s}: {rate:6.2f} Tops/s "
                  f"(dev t16={per[16]*1e3:.3f} ms, t128={per[128]*1e3:.3f} ms)",
                  flush=True)
        except Exception as e:
            results[name] = {"error": f"{type(e).__name__}: {str(e)[:160]}"}
            print(f"{name:9s}: UNSUPPORTED ({type(e).__name__})", flush=True)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "VPU_PROBE.json")
    with open(path, "w") as f:
        json.dump({
            "protocol": "double slope: fori_loop(n) trip-count slope "
                        "cancels per-call dispatch; K in {16,128} chain "
                        f"slope cancels fixed kernel cost; elems={elems}; "
                        "ops alternate max(x-1, ref) / x+1 so neither is "
                        "provably redundant",
            "device": str(jax.devices()[0]),
            "dtypes": results,
        }, f, indent=1)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
