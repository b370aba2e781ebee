"""Distributed search: shard_map over the ("data", "db") mesh
(SURVEY.md §2.1, §3.3, §5.8).

One compiled program, three phases, two small collectives along "db":

  1. propose  (local)     — seed lookup + voting on the local index shard;
  2. select   (collective)— all_gather every shard's top-N proposals and
     re-rank by (votes desc, subject id asc, bin asc): the candidate set is
     EXACTLY the single-index selection for any shard layout;
  3. align    (local)     — subject-bounded banded SW on the selected
     candidates owned by this shard, then psum the disjoint-masked hit
     fields along "db" (each candidate is owned by exactly one shard) and
     rank per read locally.

k is tiny (<= max_hits per read), so one gather of k*n_db rows beats any
tree merge (SURVEY.md §5.8); XLA lowers the collectives onto ICI within a
slice and DCN across hosts.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ghostm_tpu.engine import (
    NFRAMES, align_shard, propose_shard, rank_reads,
)
from ghostm_tpu.kernels.candidates import select_global
from ghostm_tpu.parallel.mesh import DATA_AXIS, DB_AXIS

BIG = 1 << 30


def make_distributed_step(mesh, propose_static: dict, align_static: dict,
                          topk: int):
    """Build the jitted mesh-wide search step (see engine.SearchEngine)."""
    ncand = propose_static["ncand"]

    def local_step(qflat, buffers, bucket_starts, tab_main,
                   tab_aux, starts, subject_ids, lengths, matrix):
        # local shard rows: exactly one along "db"
        buf, bst = buffers[0], bucket_starts[0]
        rb, lo = tab_main[0], tab_aux[0]
        st, sid, ln = starts[0], subject_ids[0], lengths[0]
        # --- phase 1: propose
        pg, pb, pv = propose_shard(qflat, bst, rb, lo, sid, **propose_static)
        # --- phase 2: collective select
        gath = [
            lax.all_gather(x, DB_AXIS, axis=0, tiled=False)
            for x in (pg, pb, pv)
        ]  # (n_db, Qf, ncand)
        n_db = gath[0].shape[0]
        Qf = gath[0].shape[1]
        flat = [
            jnp.moveaxis(g, 0, 1).reshape(Qf, n_db * ncand) for g in gath
        ]
        sel_g, sel_b, sel_v = select_global(*flat, ncand)
        sel_g = jnp.where(sel_v > 0, sel_g, BIG)
        sel_b = jnp.where(sel_v > 0, sel_b, BIG)
        # --- phase 3: align + disjoint-mask merge
        score, qend, bend, s_end, g0, srow, owned = align_shard(
            qflat, buf, st, sid, ln, matrix, sel_g, sel_b, **align_static
        )
        live = owned & (score > 0)
        my_shard = lax.axis_index(DB_AXIS).astype(jnp.int32)
        zero = jnp.zeros_like(score)
        fields = (
            score,
            jnp.where(live, qend, zero),
            jnp.where(live, bend, zero),
            jnp.where(live, s_end, zero),
            jnp.where(live, g0, zero),
            jnp.where(live, srow, zero),
            jnp.where(live, my_shard, zero),
        )
        score, qend, bend, s_end, g0, srow, shard = (
            lax.psum(f, DB_AXIS) for f in fields
        )
        # per-read rank
        R = Qf // NFRAMES
        M = NFRAMES * ncand
        rs = lambda a: a.reshape(R, M)
        frame = jnp.tile(
            jnp.repeat(jnp.arange(NFRAMES, dtype=jnp.int32), ncand)[None, :],
            (R, 1),
        )
        gsid = jnp.where(score > 0, sel_g, BIG).reshape(R, M)
        out = rank_reads(
            rs(score), gsid, frame, rs(qend), rs(s_end), rs(bend), rs(g0),
            rs(srow), rs(shard), topk,
        )
        return out

    specs_idx = P(DB_AXIS)
    fn = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(DATA_AXIS), specs_idx, specs_idx, specs_idx, specs_idx,
                  specs_idx, specs_idx, specs_idx, P()),
        out_specs=tuple([P(DATA_AXIS)] * 9),
        check_vma=False,
    )

    @jax.jit
    def step(qflat, buffers, bucket_starts, tab_main, tab_aux,
             starts, subject_ids, lengths, matrix) -> Dict[str, jnp.ndarray]:
        (score, gsid, frame, qend, s_end, bend, g0, srow, shard) = fn(
            qflat, buffers, bucket_starts, tab_main, tab_aux,
            starts, subject_ids, lengths, matrix,
        )
        return {
            "score": score, "gsid": gsid, "frame": frame, "qend": qend,
            "s_end": s_end, "bend": bend, "g0": g0, "srow": srow,
            "shard": shard,
        }

    return step
