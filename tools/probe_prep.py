"""Dev probe: break down sw_fused prep cost and test alternatives."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from ghostm_tpu.kernels import sw_fused
from ghostm_tpu.ops.scoring import padded_matrix


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


rng = np.random.default_rng(0)
N, Lq, B = 65536, 40, 32
h = B // 2
A = Lq + h - 1
Ap = -(-A // sw_fused.UNROLL) * sw_fused.UNROLL
W = 256
G = N // W
halves, climit = sw_fused.build_packed_matrix(padded_matrix())
halves_j = jnp.asarray(halves)
qs = jnp.asarray(rng.integers(0, 20, (N, Lq)).astype(np.int32))
ws = jnp.asarray(rng.integers(0, 20, (N, Lq + B)).astype(np.int32))
lo = jnp.zeros(N, jnp.int32)
hi = jnp.full(N, 1 << 20, jnp.int32)

prof_f = jax.jit(lambda q: sw_fused.profile_words(q, halves_j))
prof = jax.block_until_ready(prof_f(qs))
print(f"profile_words: {timed(lambda: prof_f(qs))*1e3:.2f} ms")

pad_f = jax.jit(
    lambda p: jnp.pad(p, ((0, 0), (0, Ap - Lq + h), (0, 0)))[:, :Ap]
)
profp = jax.block_until_ready(pad_f(prof))
print(f"pad: {timed(lambda: pad_f(prof))*1e3:.2f} ms")

tr_f = jax.jit(
    lambda p: jnp.transpose(p.reshape(G, W, Ap, 4), (0, 2, 3, 1))
)
print(f"prof transpose: {timed(lambda: tr_f(profp))*1e3:.2f} ms")

trw_f = jax.jit(
    lambda w: jnp.transpose(w[:, h:h+Ap].reshape(G, W, Ap), (0, 2, 1))
)
print(f"wins transpose: {timed(lambda: trw_f(ws))*1e3:.2f} ms")


# alternative: transpose the CODES first (small), then select-tree the
# profile words directly in kernel layout
@jax.jit
def alt(qs, ws):
    qt = jnp.transpose(
        jnp.pad(qs, ((0, 0), (0, Ap - Lq + h)), constant_values=25)[:, :Ap]
        .reshape(G, W, Ap), (0, 2, 1),
    )  # (G, Ap, W)
    # 32-way select tree on code bits, vectorised over the word dim via
    # a (G, Ap, W, 1) broadcast against (4,) word tables -> too big; do
    # 4 words with 2D ops
    words32 = (halves_j[:, 1::4].astype(jnp.int32) << 8) | halves_j[:, 0::4]
    words32 = words32 | (halves_j[:, 2::4] << 16) | (halves_j[:, 3::4] << 24)
    # words32: (32, 4)
    outs = []
    for k in range(4):
        tbl = np.asarray(words32)[:, k] if isinstance(words32, np.ndarray) else None
        col = words32[:, k]  # (32,)
        v = qt
        # 5-level binary select tree
        cur = [col[i] for i in range(32)]
        for lvl in range(5):
            bit = (v >> lvl) & 1
            nxt = []
            for i in range(0, len(cur), 2):
                nxt.append(jnp.where(bit == 1, cur[i + 1], cur[i]))
            cur = nxt
        outs.append(cur[0])
    return jnp.stack(outs, axis=2)  # (G, Ap, 4, W)


out_alt = jax.block_until_ready(alt(qs, ws))
print(f"alt select-tree prof (transposed codes): {timed(lambda: alt(qs, ws))*1e3:.2f} ms")
# verify equality with transpose path
ref = np.asarray(tr_f(profp))
got = np.asarray(out_alt)
print("alt equals transpose path:", np.array_equal(ref, got))
