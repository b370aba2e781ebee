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
    NFRAMES, align_shard, fetch_windows, propose_shard, rank_reads,
    refine_stats_packed,
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
        sel_g, sel_b, sel_v = select_global(
            *flat, ncand, use_kernel=align_static.get("use_pallas", False)
        )
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
            use_kernel=align_static.get("use_pallas", False),
        )
        # --- phase 4: in-graph refine (stats for the reported hits) ---
        # Each db shard fetches windows for the hits IT owns from its local
        # buffer; one psum assembles the full window set (hits are owned by
        # exactly one shard; unowned contributions are zero), then every
        # shard runs the identical small moves-DP — bit-identical to the
        # loop path's packed refine (engine._make_refine_packed), with no
        # host-side buffer work per batch (VERDICT.md weak #5).
        packed = jnp.stack(out)              # (9, R, K)
        K = packed.shape[2]
        hit_shard = packed[8].reshape(-1)
        hit_g0 = packed[6].reshape(-1)
        hit_srow = packed[7].reshape(-1)
        Lq = qflat.shape[1]
        wlen = Lq + align_static["band"]
        mine = hit_shard == my_shard
        w_local = fetch_windows(buf, hit_g0, align_static["lead"], wlen)
        S = st.shape[0]
        sr = jnp.clip(hit_srow, 0, S - 1)
        zero = jnp.zeros_like(hit_g0)
        w = lax.psum(
            jnp.where(mine[:, None], w_local.astype(jnp.int32), 0), DB_AXIS
        )
        lo2 = lax.psum(jnp.where(mine, st[sr], zero), DB_AXIS)
        hi2 = lax.psum(jnp.where(mine, st[sr] + ln[sr], zero), DB_AXIS)
        stats = refine_stats_packed(
            qflat.reshape(R, NFRAMES, Lq), packed, matrix, w, lo2, hi2,
            band=align_static["band"], gap_open=align_static["gap_open"],
            gap_extend=align_static["gap_extend"],
        )
        return out + tuple(stats[i] for i in range(9))

    specs_idx = P(DB_AXIS)
    fn = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(DATA_AXIS), specs_idx, specs_idx, specs_idx, specs_idx,
                  specs_idx, specs_idx, specs_idx, P()),
        out_specs=tuple([P(DATA_AXIS)] * 18),
        check_vma=False,
    )

    HIT_KEYS = ("score", "gsid", "frame", "qend", "s_end", "bend", "g0",
                "srow", "shard")
    STAT_KEYS = ("qstart", "qend_s", "sstart", "send", "length", "matches",
                 "mismatch", "gapopen", "score_check")

    @jax.jit
    def step(qflat, buffers, bucket_starts, tab_main, tab_aux,
             starts, subject_ids, lengths, matrix) -> Dict[str, jnp.ndarray]:
        outs = fn(
            qflat, buffers, bucket_starts, tab_main, tab_aux,
            starts, subject_ids, lengths, matrix,
        )
        d = dict(zip(HIT_KEYS, outs[:9]))
        d.update(zip(STAT_KEYS, outs[9:]))
        return d

    return step
