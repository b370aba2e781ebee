"""Batch streaming loop with checkpoint/resume (SURVEY.md §5.3/§5.4).

The only mutable state of a search run is (input cursor, emitted rows) — the
index is immutable — so fault tolerance is per-batch result parts plus a
cursor manifest: results are written to `<out>.parts/part-{i}.tsv` with
`<out>.parts/cursor.json` recording completed batches; `--resume` skips
completed parts and re-runs the first incomplete one. Without checkpointing,
rows stream straight into the output file.
"""

from __future__ import annotations

import json
import logging
import os
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Iterable, Optional

import numpy as np

from ghostm_tpu.report import M8_HEADER, SubjectNames, write_hits
from ghostm_tpu.utils.metrics import BatchMetrics, MetricsLog

log = logging.getLogger("ghostm_tpu.pipeline")

NFRAMES = 6


def _subject_names(index) -> SubjectNames:
    names = {}
    for sh in index.shards:
        for row, gid in enumerate(sh.store.subject_ids):
            names[int(gid)] = sh.store.names[row]
    return SubjectNames(names)


def run_search(
    engine,
    batches: Iterable,
    output: str,
    resume: bool = False,
) -> int:
    cfg = engine.cfg
    snames = _subject_names(engine.index)
    db_seqs = sum(sh.store.num_subjects for sh in engine.index.shards)
    metrics = MetricsLog()
    checkpointing = cfg.checkpoint_batches > 0
    parts_dir = output + ".parts"
    cursor_path = os.path.join(parts_dir, "cursor.json")
    done = 0
    if checkpointing:
        os.makedirs(parts_dir, exist_ok=True)
        if resume and os.path.exists(cursor_path):
            with open(cursor_path) as f:
                done = json.load(f)["completed_batches"]
            log.info("resuming after %d completed batches", done)

    total_rows = 0
    profile_cm = None
    if cfg.profile_dir:
        import jax

        profile_cm = jax.profiler.trace(cfg.profile_dir)
        profile_cm.__enter__()
    # Optional device-memory accounting (VERDICT r03 missing #5): when
    # GHOSTM_TPU_HBM_LOG names a file, record per-batch device
    # memory_stats() peaks there at exit. Zero cost when unset.
    hbm_log = os.environ.get("GHOSTM_TPU_HBM_LOG")
    hbm_peak = {}

    def _hbm_sample():
        if not hbm_log:
            return
        try:
            import jax

            st = jax.local_devices()[0].memory_stats() or {}
            for k in ("bytes_in_use", "peak_bytes_in_use",
                      "largest_alloc_size", "bytes_limit"):
                if k in st:
                    hbm_peak[k] = max(hbm_peak.get(k, 0), int(st[k]))
            if not st:
                # backends without allocator stats (the axon tunnel):
                # sum the live device arrays — a per-batch lower bound on
                # residency (excludes XLA temp workspace)
                live = sum(
                    a.size * a.dtype.itemsize for a in jax.live_arrays()
                )
                hbm_peak["live_array_bytes"] = max(
                    hbm_peak.get("live_array_bytes", 0), int(live)
                )
        except Exception:
            hbm_peak.setdefault("error", 1)
    # Software pipelining (loop path): batch i+1's device work is DISPATCHED
    # (JAX dispatch is async) before batch i's single packed result array is
    # fetched, so device compute overlaps the host-side fetch + TSV
    # formatting + write. The mesh path stays synchronous (its outputs are
    # process-sharded global arrays).
    # GHOSTM_TPU_SYNC_PIPELINE=1 fetches batch i before dispatching batch
    # i+1: gives up the host-overlap (~10-20% at small DBs) but halves
    # peak device memory — two in-flight batches of propose/align
    # intermediates on a k=5 multi-GB index can exceed v5e HBM.
    sync_pipeline = os.environ.get("GHOSTM_TPU_SYNC_PIPELINE") == "1"
    use_async = getattr(engine, "mesh", None) is None
    try:
        import jax
        multiproc = jax.process_count() > 1
    except Exception:
        multiproc = False
    if multiproc:
        # config 4 (SURVEY.md §3.3): every process streams the same input;
        # outputs are data-sharded, so each process writes ROW-ADDRESSED
        # result parts for the rows it holds (replica-0 dedupe in
        # engine.search_batch_stats_local). Parts sort lexicographically
        # into global row order; process 0 concatenates after a barrier.
        if not checkpointing:
            raise ValueError(
                "multi-process runs need checkpoint_batches > 0 "
                "(per-batch row-addressed result parts)"
            )
        cursor_path = os.path.join(
            parts_dir, f"cursor-p{jax.process_index()}.json"
        )
        if resume:
            # Every process must resume from the SAME batch index (the
            # streaming loop is a sequence of global collectives), but
            # per-process cursors legitimately disagree after a mid-run
            # failure — each process checkpoints independently, so a
            # SIGKILL can land between one process's cursor write and
            # its peer's. Resume from the MINIMUM across all process
            # cursors (missing cursor = 0): batches some process never
            # finished are re-run by everyone; part writes are
            # tmp+rename overwrites with byte-identical content, so
            # re-running a completed batch is idempotent. Found by
            # tools/bench_scale_mp.py's kill+resume rehearsal (the
            # per-process resume diverged and tripped the multihost
            # same-value assert on the first re-dispatched batch).
            dones = []
            for pi in range(jax.process_count()):
                cp = os.path.join(parts_dir, f"cursor-p{pi}.json")
                try:
                    with open(cp) as f:
                        dones.append(json.load(f)["completed_batches"])
                except (FileNotFoundError, ValueError, KeyError):
                    dones.append(0)
            done = min(dones)
            log.info(
                "resuming after %d completed batches (process cursors: %s)",
                done, dones,
            )
    pending = None  # (bi, names, lens, nreads, R, dev_or_(hits, stats), t0)

    def _write_part(part, names, lens, hits, stats):
        with open(part + ".tmp", "w") as f:
            rows = write_hits(
                f, cfg, names, lens, snames, hits, stats,
                engine.index.total_residues, db_seqs,
            )
        os.replace(part + ".tmp", part)
        return rows

    def _flush(p):
        nonlocal total_rows
        bi, names, lens, nreads, R, payload, t0 = p
        if multiproc:
            rows = 0
            for st0, hits, stats in payload:
                r_loc = hits.score.shape[0]
                part = os.path.join(
                    parts_dir, f"part-{bi:06d}-r{st0:08d}.tsv"
                )
                rows += _write_part(
                    part, names[st0 : st0 + r_loc],
                    lens[st0 : st0 + r_loc], hits, stats,
                )
            with open(cursor_path, "w") as f:
                json.dump({"completed_batches": bi + 1}, f)
            _hbm_sample()
            wall = time.time() - t0
            m = BatchMetrics(nreads, wall, 0, rows)
            metrics.add(m)
            total_rows += rows
            return
        if use_async:
            hits, stats = engine.unpack_results(np.asarray(payload))
        else:
            hits, stats = payload
        if checkpointing:
            part = os.path.join(parts_dir, f"part-{bi:06d}.tsv")
            rows = _write_part(part, names, lens, hits, stats)
            with open(cursor_path, "w") as f:
                json.dump({"completed_batches": bi + 1}, f)
        else:
            rows = write_hits(
                out_f, cfg, names, lens, snames, hits, stats,
                engine.index.total_residues, db_seqs,
            )
        _hbm_sample()
        wall = time.time() - t0
        n_aln = R * NFRAMES * cfg.candidates_per_frame
        cells = n_aln * cfg.query_frame_len * cfg.band_width
        m = BatchMetrics(nreads, wall, cells * engine.n_shards, rows)
        metrics.add(m)
        log.info(
            "batch %d: %d reads, %d rows, %.2fs (%.0f reads/s, %.2f GCUPS)",
            bi, nreads, rows, wall, m.reads_per_s, m.gcups,
            extra={"metrics": vars(m)},
        )
        total_rows += rows

    # r04: the flush (device->host fetch + TSV format + write) runs on a
    # background thread. The tunnel charges a fixed ~30 ms per fetch and
    # the fetch blocks the calling thread — on the MAIN thread that cost
    # serializes with the next batch's translate+dispatch even though
    # dispatch is async (measured: e2e 234 ms/batch vs 190 ms device
    # step). The GIL drops during the blocking fetch, so one worker
    # thread restores the overlap; a single worker keeps part files and
    # cursor updates strictly ordered. Bit-identical output. Shut down in
    # `finally` so an in-flight flush is joined (and its error surfaced)
    # even when the main loop raises first.
    flusher = None if sync_pipeline else ThreadPoolExecutor(1)
    fut = None
    try:
        out_f = None if checkpointing else open(output, "w")
        if out_f:
            out_f.write(M8_HEADER + "\n")
        for bi, (names, dna, lens) in enumerate(batches):
            if checkpointing and bi < done:
                continue
            t0 = time.time()
            if use_async and not cfg.check:
                # r05: translation runs ON DEVICE inside the one compiled
                # program (engine._fullstep_dna_for) — the host translate
                # cost ~34 ms of serial main-thread time per 8192-read
                # batch; bit-identical (tests/test_pipeline.py)
                R = dna.shape[0]
                payload = engine.search_refine_async_dna(dna, lens)
            else:
                qcodes = engine.translate(dna, lens)
                R = qcodes.shape[0]
                if cfg.check and use_async:
                    # checkify debug pass (raises on OOB/NaN; SURVEY.md §5.2)
                    engine.search_batch_checked(qcodes)
                if use_async:
                    payload = engine.search_refine_async(qcodes)
                elif multiproc:
                    payload = engine.search_batch_stats_local(qcodes)
                else:
                    # mesh path: hits AND stats from ONE compiled step
                    payload = engine.search_batch_stats(qcodes)
            if pending is not None:
                if flusher is None:
                    _flush(pending)
                else:
                    if fut is not None:
                        fut.result()   # propagate errors, bound the queue
                    fut = flusher.submit(_flush, pending)
            pending = (
                bi, names, lens, len(names), R, payload, t0
            )
            if sync_pipeline:
                _flush(pending)
                pending = None
        if fut is not None:
            fut.result()
            fut = None
        if pending is not None:
            _flush(pending)
            pending = None
        if checkpointing:
            if multiproc:
                from jax.experimental import multihost_utils

                multihost_utils.sync_global_devices("ghostm_tpu_parts_done")
                if jax.process_index() != 0:
                    log.info("process %d: parts written", jax.process_index())
                    return total_rows
            # concatenate parts into the final output (row-addressed part
            # names sort lexicographically into global row order)
            with open(output, "w") as f:
                f.write(M8_HEADER + "\n")
                for p in sorted(os.listdir(parts_dir)):
                    if p.startswith("part-") and p.endswith(".tsv"):
                        with open(os.path.join(parts_dir, p)) as pf:
                            f.write(pf.read())
        elif out_f:
            out_f.close()
    finally:
        if flusher is not None:
            try:
                if fut is not None:
                    fut.result()
            finally:
                flusher.shutdown(wait=True)
        if profile_cm:
            profile_cm.__exit__(None, None, None)
        if hbm_log and hbm_peak:
            with open(hbm_log, "w") as f:
                json.dump(hbm_peak, f)
    log.info("search done: %s", metrics.dumps())
    return total_rows
