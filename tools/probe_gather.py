"""Dev probe: what sets XLA TPU row-gather cost — row count, source
size, or index locality? Decides whether a sort+gather+unpermute
propose rewrite could beat the direct random gather
(PROFILE_r04.json: the kmer-row gather is the propose wall at
~27 ms/chunk for 261k x 512 B rows from a 1.6 GB table).

Cases (all 256k rows of 128 int32 = 512 B):
  A  random rows from a 1.6 GB table      (the operative gather)
  B  random rows from a 128 MB table      (source-size / cache effect)
  C  SORTED row indices, 1.6 GB table     (locality effect)
  D  sequential rows (iota), 1.6 GB table (pure streaming bound)

fori-loop slope timing (tools/probe_devtime.py protocol), indices XORed
with a tiny loop-varying value so XLA cannot hoist.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

N_ROWS = 256 * 1024
WIDTH = 128


def slope(f, n1=3, n2=12, inner=3):
    def timed(n):
        np.asarray(f(jnp.int32(n)))
        best = float("inf")
        for _ in range(inner):
            t = time.time()
            np.asarray(f(jnp.int32(n)))
            best = min(best, time.time() - t)
        return best

    t1, t2 = timed(n1), timed(n2)
    if t2 <= t1:
        t1, t2 = timed(n1), timed(n2)
    return (t2 - t1) / (n2 - n1)


def make_case(table_rows, idx):
    # table and indices are jit ARGUMENTS, never closure captures — a
    # closed-over 1.6 GB device array becomes a baked-in constant that
    # the remote-compile service cannot serialize (memory:
    # axon-tunnel-pitfalls; engine._fullstep_for documents the rule)
    @jax.jit
    def reps(tab, idx, n):
        def body(i, acc):
            r = jnp.clip(idx ^ (i & 1), 0, tab.shape[0] - 1)
            g = tab[r]
            # FULL reduction: consuming only a couple of elements lets
            # XLA elide the gather entirely (first probe version read a
            # fantasy 10 ns/row); the sum forces every gathered row and
            # costs ~0.2 ms of streaming itself
            return acc + jnp.sum(g, dtype=jnp.int32)

        return jax.lax.fori_loop(0, n, body, jnp.int32(0))

    # build the table ON DEVICE (no host->device push of GBs)
    tab = jax.jit(
        lambda: jnp.arange(table_rows * WIDTH, dtype=jnp.int32).reshape(
            table_rows, WIDTH)
    )()
    idx_d = jnp.asarray(idx.astype(np.int32))
    return lambda n: reps(tab, idx_d, n)


def main():
    from ghostm_tpu.cli import _enable_compile_cache

    _enable_compile_cache()
    rng = np.random.default_rng(0)
    big = (1600 << 20) // (WIDTH * 4)      # ~1.6 GB of rows
    small = (128 << 20) // (WIDTH * 4)     # ~128 MB
    rnd_big = rng.integers(0, big, N_ROWS)
    rnd_small = rng.integers(0, small, N_ROWS)
    cases = {
        "A_random_1p6GB": (big, rnd_big),
        "B_random_128MB": (small, rnd_small),
        "C_sorted_1p6GB": (big, np.sort(rnd_big)),
        "D_sequential_1p6GB": (big, np.arange(N_ROWS) * (big // N_ROWS)),
    }
    out = {"rows": N_ROWS, "row_bytes": WIDTH * 4, "cases": {}}
    for name, (tr, idx) in cases.items():
        dt = slope(make_case(tr, idx))
        out["cases"][name] = {
            "ms": round(dt * 1e3, 2),
            "ns_per_row": round(dt / N_ROWS * 1e9, 1),
            "gb_per_s": round(N_ROWS * WIDTH * 4 / dt / 1e9, 2),
        }
        print(f"{name:20s}: {dt*1e3:7.2f} ms  "
              f"{dt/N_ROWS*1e9:6.1f} ns/row  "
              f"{N_ROWS*WIDTH*4/dt/1e9:6.2f} GB/s", flush=True)
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "GATHER_PROBE.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote GATHER_PROBE.json", flush=True)


if __name__ == "__main__":
    main()
