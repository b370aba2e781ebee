"""Dev probe: bare fused-kernel GCUPS vs (lane width W, interleave IL)."""

import functools as ft
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from ghostm_tpu.cli import _enable_compile_cache
from ghostm_tpu.kernels import sw_fused
from ghostm_tpu.ops.scoring import padded_matrix

_enable_compile_cache()
print("ready", flush=True)


def chained(f, reps=8):
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


N, Lq, B = 65536, 40, 32
h = B // 2
A = Lq + h - 1
atile = -(-A // sw_fused.UNROLL) * sw_fused.UNROLL
Ap = atile
SH = int(Ap + 2 * h).bit_length()
words, climit = sw_fused.build_packed_matrix(padded_matrix())
cells = N * Lq * B

import itertools
import os
configs = os.environ.get('SWEEP', '256:2').split(',')
for W, IL in [tuple(map(int, c.split(':'))) for c in configs]:
    G = N // W
    key = jax.random.PRNGKey
    qrow_t = jax.random.randint(key(0), (G, Ap, W), 0, 20, jnp.int32)
    wins_t = jax.random.randint(key(1), (G, Ap, W), 0, 20, jnp.int32)
    whead_t = jax.random.randint(key(2), (G, h, W), 0, 20, jnp.int32)
    fn = jax.jit(ft.partial(
        sw_fused.kernel_call, packed_words=words, band=B, gap_open=11,
        gap_extend=1, atile=atile, pack_shift=SH, code_limit=climit,
        cells=cells, interleave=IL,
    ))
    t0 = time.time()
    dt = chained(lambda: fn(qrow_t, wins_t, whead_t))
    print(f"W={W} IL={IL}: {cells/dt/1e9:.1f} GCUPS ({dt*1e3:.2f} ms, "
          f"compile+meas {time.time()-t0:.0f}s)", flush=True)
