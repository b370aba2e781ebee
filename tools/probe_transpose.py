"""Dev probe: why is the (G, W, Ap) -> (G, Ap, W) code transpose slow,
and which variant is fastest?"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

print("ready", flush=True)


def timed(f, reps=20):
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


rng = np.random.default_rng(0)
N, Lq, B = 65536, 40, 32
Ap = 56
W = 128
G = N // W
x32 = jnp.asarray(rng.integers(0, 26, (N, Ap)).astype(np.int32))
x8 = x32.astype(jnp.int8)

_inc = jax.jit(lambda x: x + 1)
t = timed(lambda: _inc(x32), 20)
print(f"copy+1 (N,Ap) int32 [{N*Ap*4/1e6:.0f} MB]: {t*1e3:.2f} ms", flush=True)

tr = jax.jit(lambda x: jnp.transpose(x.reshape(G, W, Ap), (0, 2, 1)))
print(f"transpose int32 Ap=56: {timed(lambda: tr(x32))*1e3:.2f} ms", flush=True)

tr8 = jax.jit(
    lambda x: jnp.transpose(x.reshape(G, W, Ap), (0, 2, 1)).astype(jnp.int32)
)
print(f"transpose int8->widen Ap=56: {timed(lambda: tr8(x8))*1e3:.2f} ms", flush=True)

x64 = jnp.pad(x32, ((0, 0), (0, 8)))
tr64 = jax.jit(lambda x: jnp.transpose(x.reshape(G, W, 64), (0, 2, 1)))
print(f"transpose int32 Ap=64: {timed(lambda: tr64(x64))*1e3:.2f} ms", flush=True)

x128 = jnp.pad(x32, ((0, 0), (0, 128 - Ap)))
tr128 = jax.jit(lambda x: jnp.transpose(x.reshape(G, W, 128), (0, 2, 1)))
print(f"transpose int32 Ap=128: {timed(lambda: tr128(x128))*1e3:.2f} ms", flush=True)

# big-2D variant: (N, Ap) -> (Ap, N), then slice per block in kernel layout
trb = jax.jit(lambda x: x.T)
print(f"transpose int32 full 2D (N,Ap)->(Ap,N): {timed(lambda: trb(x32))*1e3:.2f} ms", flush=True)

# wider lane blocks
for Wv in (256, 512, 1024):
    Gv = N // Wv
    trw = jax.jit(lambda x, Gv=Gv, Wv=Wv: jnp.transpose(x.reshape(Gv, Wv, Ap), (0, 2, 1)))
    print(f"transpose int32 W={Wv}: {timed(lambda: trw(x32))*1e3:.2f} ms", flush=True)
