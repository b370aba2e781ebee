"""Dev probe: validate sw_fused vs the i8 reference path, then benchmark
fused vs the round-1 pipeline (einsum scores + skew + wave kernel).
Usage: python tools/probe_fused.py [cpu|tpu] [bench]"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

mode = sys.argv[1] if len(sys.argv) > 1 else "cpu"
if mode == "cpu":
    import os
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import jax.numpy as jnp

from ghostm_tpu.kernels import sw_fused, sw_pallas, sw_wave, sw_xla
from ghostm_tpu.ops.scoring import padded_matrix


def ref_path(qs, ws, mat, B, g0, lo, hi, go, ge):
    sc = sw_xla.banded_scores_i8(qs, ws, mat, B, g0, lo, hi)
    return sw_xla.sw_banded(sc, go, ge)


def check(seed, N, Lq, B, interpret):
    rng = np.random.default_rng(seed)
    mat = padded_matrix()
    halves, climit = sw_fused.build_packed_matrix(mat)
    # codes include stop(23)/sentinel(24)/pad(25) to exercise masking
    qs = jnp.asarray(rng.integers(0, 26, (N, Lq)).astype(np.int32))
    ws = jnp.asarray(rng.integers(0, 26, (N, Lq + B)).astype(np.int32))
    g0 = jnp.zeros(N, jnp.int32)
    lo = jnp.asarray(rng.integers(0, 8, N).astype(np.int32))
    hi = jnp.asarray(rng.integers(Lq // 2, Lq + B, N).astype(np.int32))
    s0, i0, b0 = ref_path(qs, ws, jnp.asarray(mat), B, g0, lo, hi, 11, 1)
    s1, i1, b1 = sw_fused.sw_fused_wave(
        qs, ws, halves, lo, hi, 11, 1, B,
        code_limit=climit, interpret=interpret,
    )
    ok = (np.array_equal(np.asarray(s0), np.asarray(s1))
          and np.array_equal(np.asarray(i0), np.asarray(i1))
          and np.array_equal(np.asarray(b0), np.asarray(b1)))
    if not ok:
        bad = np.nonzero(np.asarray(s0) != np.asarray(s1))[0]
        print(f"  MISMATCH seed={seed} N={N} Lq={Lq} B={B}: "
              f"{len(bad)} scores differ; first {bad[:5]}")
        for j in bad[:3]:
            print(f"   n={j}: ref=({s0[j]},{i0[j]},{b0[j]}) "
                  f"fused=({s1[j]},{i1[j]},{b1[j]})")
        return False
    print(f"  ok seed={seed} N={N} Lq={Lq} B={B} maxscore={int(np.max(s0))}")
    return True


def timed(f, reps=10):
    red = lambda: jnp.sum(jax.tree_util.tree_leaves(f())[0].astype(jnp.int32))
    np.asarray(red())
    best = float("inf")
    for _ in range(3):
        t = time.time()
        acc = jnp.int32(0)
        for _ in range(reps):
            acc = acc + red()
        np.asarray(acc)
        best = min(best, (time.time() - t) / reps)
    return best


def bench():
    rng = np.random.default_rng(0)
    N, Lq, B = 65536, 40, 32
    mat = jnp.asarray(padded_matrix())
    halves, climit = sw_fused.build_packed_matrix(padded_matrix())
    qs = jnp.asarray(rng.integers(0, 20, (N, Lq)).astype(np.int32))
    ws = jnp.asarray(rng.integers(0, 20, (N, Lq + B)).astype(np.int32))
    g0 = jnp.zeros(N, jnp.int32)
    lo = jnp.zeros(N, jnp.int32)
    hi = jnp.full(N, 1 << 20, jnp.int32)
    cells = N * Lq * B

    @jax.jit
    def old_fused(qs, ws):
        sc = sw_xla.banded_scores_i8(qs, ws, mat, B, g0, lo, hi)
        return sw_wave.sw_banded_wave(sc, 11, 1)

    @jax.jit
    def old_row(qs, ws):
        sc = sw_xla.banded_scores_i8(qs, ws, mat, B, g0, lo, hi)
        return sw_pallas.sw_banded_pallas(sc, 11, 1, row_tile=40)

    for W in (128, 256, 512):
        fn = functools.partial(
            sw_fused.sw_fused_wave, qs, ws, halves, lo, hi, 11, 1, B,
            code_limit=climit, lane_width=W,
        )
        dt = timed(fn)
        print(f"fused W={W}: {cells / dt / 1e9:.2f} GCUPS ({dt*1e3:.2f} ms)")
    print(f"old wave (einsum+skew+kernel): "
          f"{cells / timed(lambda: old_fused(qs, ws)) / 1e9:.2f} GCUPS")
    print(f"old row  (einsum+kernel):      "
          f"{cells / timed(lambda: old_row(qs, ws)) / 1e9:.2f} GCUPS")


if __name__ == "__main__":
    interpret = mode == "cpu"
    allok = True
    allok &= check(0, 128, 40, 32, interpret)
    allok &= check(1, 128, 24, 32, interpret)
    allok &= check(2, 128, 96, 32, interpret)
    allok &= check(3, 128, 40, 16, interpret)
    allok &= check(4, 256, 300, 32, interpret)   # multi a-tile
    allok &= check(5, 128, 40, 64, interpret)
    print("ALL OK" if allok else "FAILURES")
    if "bench" in sys.argv:
        bench()
