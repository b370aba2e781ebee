"""Dev probe: bitonic sort kernel cost — dynamic vs static roll shifts,
plus a fully-unrolled network variant."""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ghostm_tpu.kernels.sort import sort_rows
from ghostm_tpu.cli import _enable_compile_cache

_enable_compile_cache()
print("ready", flush=True)


def timed(f, reps=5):
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


Q, M = 24576, 2368

@jax.jit
def make_keys(seed):
    k = jax.random.randint(
        jax.random.PRNGKey(seed), (Q, M // 64, 64), 0, 1 << 20, jnp.int32
    )
    k = jnp.sort(k, axis=2)
    k = k.at[:, 1::2].set(jnp.flip(k[:, 1::2], axis=2))
    return k.reshape(Q, M)

keys = jax.block_until_ready(make_keys(0))
print("keys made", flush=True)

t = timed(lambda: sort_rows(keys, presorted_run=64))
print(f"current sort_rows (dyn roll, skip6): {t*1e3:.2f} ms", flush=True)


def _sort_kernel_static(x_ref, o_ref, *, rows, length, first):
    L = length
    iota = jax.lax.broadcasted_iota(jnp.int32, (rows, L), 1)
    nstage = L.bit_length() - 1
    v = x_ref[:]
    for k in range(first, nstage + 1):
        dirbit = (iota >> k) & 1
        for j in range(k - 1, -1, -1):
            d = 1 << j
            bit = (iota >> j) & 1
            take_max = bit ^ dirbit
            partner = jnp.where(
                bit == 1,
                pltpu.roll(v, d, axis=1),
                pltpu.roll(v, L - d, axis=1),
            )
            lo = jnp.minimum(v, partner)
            hi = jnp.maximum(v, partner)
            v = jnp.where(take_max == 1, hi, lo)
    o_ref[:] = v


def sort_static(x, presorted_run=64):
    Q, M = x.shape
    run = presorted_run
    L = 1 << max(M - 1, 1).bit_length()
    rows = max(8, min(256, (1 << 20) // (L * 4) // 8 * 8))
    Qp = -(-Q // rows) * rows
    xp = jnp.full((Qp, L), jnp.int32(0x7FFFFFFF), jnp.int32)
    xp = jax.lax.dynamic_update_slice(xp, x.astype(jnp.int32), (0, 0))
    first = run.bit_length()
    out = pl.pallas_call(
        functools.partial(
            _sort_kernel_static, rows=rows, length=L, first=first
        ),
        grid=(Qp // rows,),
        in_specs=[pl.BlockSpec((rows, L), lambda g: (g, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rows, L), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Qp, L), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(xp)
    return out[:Q, :M]


t0 = time.time()
f = jax.jit(lambda x: sort_static(x))
r1 = jax.block_until_ready(f(keys))
print(f"static-unrolled compile+run: {time.time()-t0:.1f} s", flush=True)
r0 = jax.block_until_ready(sort_rows(keys, presorted_run=64))
print("static matches:", bool(jnp.all(r0 == r1)), flush=True)
t = timed(lambda: f(keys))
print(f"static-unrolled sort: {t*1e3:.2f} ms", flush=True)
