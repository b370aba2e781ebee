"""Worker for tests/test_multihost.py: one jax.distributed CPU process.

Each of the two processes owns one CPU device; the ("data"=1, "db"=2) mesh
spans both, so the index is sharded ACROSS PROCESSES and the proposal/merge
collectives run over the distributed CPU backend (gloo) — the same program
shape as a 2-host TPU pod run (SURVEY.md §4.2 "Multi-host").

Each worker recomputes the single-process reference locally and asserts its
own addressable slice of the distributed output matches. Exit 0 = pass.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"

import jax

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass

import numpy as np


def main():
    coord, pid, tmp = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    jax.distributed.initialize(coord, num_processes=2, process_id=pid)
    assert len(jax.devices()) == 2, jax.devices()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax.numpy as jnp

    from ghostm_tpu.config import Config
    from ghostm_tpu.engine import SearchEngine, pad_buffer
    from ghostm_tpu.index.diskio import load_index
    from ghostm_tpu.parallel import mesh as pm
    from ghostm_tpu.parallel.search import make_distributed_step

    cfg = Config(**np.load(f"{tmp}/cfg.npz", allow_pickle=True)["cfg"].item())
    index = load_index(f"{tmp}/idx")
    qcodes = np.load(f"{tmp}/qcodes.npy")

    # single-process local reference (loop path over both shards)
    ref_eng = SearchEngine(cfg, index, use_pallas=False)
    ref = ref_eng.search_batch(qcodes)

    # distributed: ("data"=1, "db"=2) mesh across the two processes
    from ghostm_tpu.engine import build_key_tables, pad_stack

    mesh = pm.make_mesh(1, 2)
    step = make_distributed_step(
        mesh, ref_eng._propose_static, ref_eng._align_static, cfg.max_hits
    )
    idx_sh = pm.index_sharding(mesh)
    put = lambda a: jax.device_put(a, idx_sh)
    buffers = np.stack(
        [pad_buffer(index.buffers[i], cfg) for i in range(2)]
    )
    # colocated_shards=True to MATCH ref_eng's loop-path layout choice —
    # the distributed step reuses ref_eng's propose statics
    maps, mode, _w = build_key_tables(
        index, ref_eng._nbins, cfg.band_width // 2, cfg.query_frame_len,
        ref_eng._table_width, ref_eng.expand, colocated_shards=True,
    )
    assert (mode == "direct") == ref_eng._propose_static["direct_tables"]
    assert (mode == "aligned") == ref_eng._propose_static["fuse_tables"]
    assert _w == ref_eng._propose_static["table_width"]
    qflat = qcodes.reshape(-1, cfg.query_frame_len)
    out = step(
        jax.device_put(qflat, pm.query_sharding(mesh)),
        put(buffers), put(index.bucket_starts),
        put(pad_stack([m[0] for m in maps])),
        put(pad_stack([m[1] for m in maps])),
        put(index.starts), put(index.subject_ids), put(index.lengths),
        jax.device_put(
            np.asarray(ref_eng.matrix), pm.replicated(mesh)
        ),
    )
    # each process checks its addressable rows
    for name in ("score", "gsid", "frame", "qend", "s_end"):
        arr = out[name]
        want = getattr(ref, name)
        for shard in arr.addressable_shards:
            sl = shard.index[0]
            np.testing.assert_array_equal(
                np.asarray(shard.data), want[sl],
                err_msg=f"field {name} mismatch on process {pid}",
            )
    print(f"process {pid}: ok", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
