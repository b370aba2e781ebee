"""Dev probe: achievable VPU elem-op rate by dtype, measured as the SLOPE
of kernel time vs chain length K (dependent max/add ops per element inside
one Pallas kernel). Slope-based timing is immune to the constant-folding /
dispatch-overhead traps that broke round-1's synthetic probes (bench.py
docstring): the input streams from HBM refs, the output is written back,
and fixed overheads cancel in the K2 - K1 difference.

Usage: python tools/probe_vpu.py
"""

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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SCAN_LEN = 8


def make_chain(dtype, K, rows, width, grid):
    """Kernel: per element, K dependent (max(x + c1, x) style) ops."""

    def kernel(x_ref, o_ref):
        x = x_ref[:]
        one = jnp.ones((), dtype)
        # both ops genuinely depend on both operands (ADVICE r02: a
        # monotone x made `max(x, x_ref)` provably redundant — a
        # value-range pass could elide half the chain): max(x - 1, ref)
        # can go either way, and the +1 keeps the chain from fixpointing.
        for i in range(K // 2):
            x = jnp.maximum(x - one, x_ref[:])
            x = x + one
        o_ref[:] = x

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[pl.BlockSpec((1, rows, width), lambda g: (g, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, rows, width), lambda g: (g, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((grid, rows, width), dtype),
        )(x)

    return run


def timed(f, x):
    red = lambda: jnp.sum(f(x)[0, 0, :8].astype(jnp.int32))
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
    rows, width, grid = 256, 256, 64
    elems = grid * rows * width
    results = {}
    for dtype in (jnp.int32, jnp.int16, jnp.int8, jnp.float32, jnp.bfloat16):
        xs = jnp.asarray(
            np.random.default_rng(0).integers(0, 7, (grid, rows, width)),
            dtype,
        )
        ts = {}
        for K in (16, 64):
            ts[K] = timed(make_chain(dtype, K, rows, width, grid), xs)
        slope = (ts[64] - ts[16]) / (64 - 16)   # s per chain-op
        rate = elems / slope / 1e12 if slope > 0 else float("inf")
        name = jnp.dtype(dtype).name
        results[name] = {
            "tops_per_s": round(rate, 3),
            "t16_ms": round(ts[16] * 1e3, 3),
            "t64_ms": round(ts[64] * 1e3, 3),
        }
        print(f"{name:9s}: {rate:6.2f} Tops/s "
              f"(t16={ts[16]*1e3:.2f} ms, t64={ts[64]*1e3:.2f} ms)",
              flush=True)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "VPU_PROBE.json")
    with open(path, "w") as f:
        json.dump({
            "protocol": "slope of pallas kernel time vs dependent-chain "
                        "length K in {16, 64}, elems=grid*rows*width="
                        f"{elems}; ops alternate max(x-1, ref) / x+1 so "
                        "neither is provably redundant",
            "device": str(jax.devices()[0]),
            "dtypes": results,
        }, f, indent=1)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
