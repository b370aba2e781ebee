"""Index build / load round-trip and seed-lookup correctness (SURVEY.md §4.2)."""

import numpy as np

from ghostm_tpu.index import diskio, seeds, store
from ghostm_tpu.ops.encode import SENTINEL, decode_aa


def _records(rng, n, lo=20, hi=60):
    recs = []
    for i in range(n):
        length = int(rng.integers(lo, hi))
        seq = "".join(rng.choice(list("ARNDCQEGHILKMFPSTWYV"), size=length))
        recs.append((f"subj{i}", seq.encode()))
    return recs


def test_store_layout(rng):
    recs = _records(rng, 5)
    st = store.build_store(recs, sentinel_pad=8)
    assert st.num_subjects == 5
    for i, (name, seq) in enumerate(recs):
        assert decode_aa(st.subject_seq(i)) == seq.decode()
        assert st.pos_to_subject(np.array([st.starts[i]]))[0] == i
    # sentinel separation
    assert (st.buffer[:8] == SENTINEL).all()
    assert st.buffer[st.starts[0] + st.lengths[0]] == SENTINEL


def test_seed_index_matches_oracle(rng):
    recs = _records(rng, 4)
    st = store.build_store(recs, sentinel_pad=8)
    k = 3
    idx = seeds.build_seed_index(st.buffer, k)
    keys = seeds.kmer_keys(st.buffer, k)
    # every bucket holds exactly the positions with that key, position-sorted
    for key in rng.integers(0, 20**k, size=50):
        lo, hi = idx.bucket_starts[key], idx.bucket_starts[key + 1]
        got = idx.positions[lo:hi]
        want = np.nonzero(keys == key)[0]
        assert list(got) == list(want)
    # overflow bucket is empty
    nb = 20**k
    assert idx.bucket_starts[nb] == idx.bucket_starts[nb + 1] == len(idx.positions)


def test_kmer_keys_invalid_windows():
    # sentinel/X residues never form seeds
    buf = np.array([0, 1, 2, SENTINEL, 3, 4, 5], dtype=np.int8)
    keys = seeds.kmer_keys(buf, 3)
    nb = 20**3
    assert keys[0] == 0 * 400 + 1 * 20 + 2
    assert keys[1] == nb and keys[2] == nb and keys[3] == nb
    assert keys[4] == 3 * 400 + 4 * 20 + 5


def test_disk_roundtrip(tmp_path, rng):
    recs = _records(rng, 10)
    assign = store.shard_records(recs, 3)
    shards = []
    for ids in assign:
        st = store.build_store(
            [recs[i] for i in ids], sentinel_pad=8, subject_ids=ids
        )
        shards.append(diskio.IndexShard(st, seeds.build_seed_index(st.buffer, 3)))
    prefix = str(tmp_path / "db")
    diskio.save_index(prefix, shards, seed_len=3)
    loaded = diskio.load_index(prefix)
    assert loaded.seed_len == 3
    assert loaded.buffers.shape[0] == 3
    assert loaded.total_residues == sum(len(s) for _, s in recs)
    # all global subject ids present exactly once
    all_ids = np.concatenate([sh.store.subject_ids for sh in loaded.shards])
    assert sorted(all_ids) == list(range(10))
    # padded region is sentinel
    sh0 = loaded.shards[0]
    assert (loaded.buffers[0, len(sh0.store.buffer):] == SENTINEL).all()


def _build_sharded(recs, n_shards, k=3, hits_per_seed=16, pad=8):
    """db-mode build (global truncation -> shard -> per-shard index)."""
    from ghostm_tpu.ops.encode import encode_aa

    keep = seeds.global_bucket_truncation(
        [encode_aa(s) for _, s in recs], k, hits_per_seed
    )
    assign = store.shard_records(recs, n_shards)
    shards = []
    for ids in assign:
        st = store.build_store([recs[i] for i in ids], pad, subject_ids=ids)
        kb = np.zeros(len(st.buffer), dtype=bool)
        for r, gi in enumerate(ids):
            kb[st.starts[r]: st.starts[r] + len(keep[gi])] = keep[gi]
        shards.append(
            diskio.IndexShard(st, seeds.build_seed_index(st.buffer, k, kb))
        )
    return diskio.stack_shards(shards, k)


def test_merge_shards_equals_one_shard_build(rng):
    """merge_shards of a 3-shard index is BYTE-identical to the 1-shard
    build of the same records — buffer, starts, ids, seed positions,
    bucket_starts, names (the basis for the engine's colocated-shard
    merge being bit-identical)."""
    recs = _records(rng, 37, lo=20, hi=120)
    one = _build_sharded(recs, 1, hits_per_seed=4)   # low cap: truncation on
    three = _build_sharded(recs, 3, hits_per_seed=4)
    merged = diskio.merge_shards(three)
    assert merged.buffers.shape[0] == 1
    a, b = merged.shards[0], one.shards[0]
    assert (a.store.buffer == b.store.buffer).all()
    assert (a.store.starts == b.store.starts).all()
    assert (a.store.lengths == b.store.lengths).all()
    assert (a.store.subject_ids == b.store.subject_ids).all()
    assert a.store.names == b.store.names
    assert (a.seeds.positions == b.seeds.positions).all()
    assert (a.seeds.bucket_starts == b.seeds.bucket_starts).all()
    assert merged.expand_width == one.expand_width
    assert merged.total_residues == one.total_residues


def test_colocated_merge_engine_paths(rng, monkeypatch):
    """The engine merges colocated shards by default (merged search ==
    unmerged loop search == 1-shard search, bit-identical), and
    GHOSTM_TPU_MERGE_COLOCATED=0 preserves the true multi-shard loop
    path for coverage."""
    from ghostm_tpu.config import Config
    from ghostm_tpu.engine import SearchEngine
    from ghostm_tpu.ops.encode import encode_dna
    from tools.simulate import reads_from_proteins

    recs = _records(rng, 40, lo=40, hi=150)
    cfg = Config(query_batch=32, seed_len=3, hits_per_seed=16)
    one = _build_sharded(recs, 1)
    two = _build_sharded(recs, 2)
    prots = [s.decode() for _, s in recs]
    names, reads = reads_from_proteins(rng, prots, 32, read_len=100)
    dna = np.full((32, 100), 4, np.int8)
    lens = np.zeros(32, np.int32)
    for i, rd in enumerate(reads):
        c = encode_dna(rd)
        dna[i, : len(c)] = c
        lens[i] = len(c)

    def run(index, merge):
        monkeypatch.setenv("GHOSTM_TPU_MERGE_COLOCATED", merge)
        eng = SearchEngine(cfg, index, use_pallas=False)
        qc = eng.translate(dna, lens)
        return eng, np.asarray(eng.search_refine_async(qc))

    eng1, r1 = run(one, "1")
    eng2m, r2m = run(two, "1")
    eng2l, r2l = run(two, "0")
    assert not eng1.merged_colocated and eng2m.merged_colocated
    assert not eng2l.merged_colocated and eng2l.n_shards == 2
    assert eng2m.n_shards == 1
    assert (r1 == r2m).all()
    # loop path: same hits + stats modulo the buffer-layout bookkeeping
    # fields (rows 6-8 are window start in shard-local buffer coords,
    # shard-local subject row, shard id — merged collapses all three)
    assert (r1[:6] == r2l[:6]).all()
    assert (r1[9:] == r2l[9:]).all()


def test_table_width_guard():
    """Engine steps the aligned-table width down when bucket padding would
    inflate the table past 2x the raw positions (VERDICT r01 weak #4)."""
    import numpy as np

    from ghostm_tpu.config import Config
    from ghostm_tpu.engine import SearchEngine
    from ghostm_tpu.index import diskio, seeds, store
    from ghostm_tpu.ops.encode import encode_aa

    rng = np.random.default_rng(0)
    aas = "ARNDCQEGHILKMFPSTWYV"
    # many subjects with DIVERSE k-mers: most buckets hold 1-3 positions,
    # so a 64-wide row pads ~20-60x — the guard must step down to 32
    records = [
        (f"s{i}", "".join(rng.choice(list(aas), 40)).encode())
        for i in range(150)
    ]
    cfg = Config(seed_len=4, hits_per_seed=64, query_batch=128)
    keep = seeds.global_bucket_truncation(
        [encode_aa(s) for _, s in records], cfg.seed_len, cfg.hits_per_seed
    )
    st = store.build_store(records, cfg.sentinel_pad,
                           subject_ids=list(range(len(records))))
    kb = np.zeros(len(st.buffer), dtype=bool)
    for r in range(len(records)):
        kb[st.starts[r]: st.starts[r] + len(keep[r])] = keep[r]
    shard = diskio.IndexShard(
        st, seeds.build_seed_index(st.buffer, cfg.seed_len, kb)
    )
    index = diskio.stack_shards([shard], cfg.seed_len)
    eng = SearchEngine(cfg, index, use_pallas=False)
    assert eng._table_width == 32
    assert eng._padded_total(32) < eng._padded_total(64)
    # a dense index (few fat buckets) keeps the full-expansion width
    records2 = [("t0", (b"ACDEFGHIKL" * 400))] * 4
    records2 = [(f"t{i}", s) for i, (_, s) in enumerate(records2)]
    keep2 = seeds.global_bucket_truncation(
        [encode_aa(s) for _, s in records2], cfg.seed_len, cfg.hits_per_seed
    )
    st2 = store.build_store(records2, cfg.sentinel_pad,
                            subject_ids=list(range(4)))
    kb2 = np.zeros(len(st2.buffer), dtype=bool)
    for r in range(4):
        kb2[st2.starts[r]: st2.starts[r] + len(keep2[r])] = keep2[r]
    shard2 = diskio.IndexShard(
        st2, seeds.build_seed_index(st2.buffer, cfg.seed_len, kb2)
    )
    index2 = diskio.stack_shards([shard2], cfg.seed_len)
    eng2 = SearchEngine(cfg, index2, use_pallas=False)
    assert eng2._table_width == 64


def test_direct_table_cap_fallback(tmp_path, monkeypatch):
    """Direct-table layout falls back to the aligned layout when the
    (nb + 1) x W x 4 budget exceeds the cap — split across shards on the
    colocated loop path — and the search output is bit-identical either
    way (same engine contract, different table layout)."""
    import os

    import ghostm_tpu.engine as eng_mod
    from ghostm_tpu.cli import main as cli_main

    # use the committed golden dataset via the CLI for an end-to-end check
    here = os.path.dirname(__file__)
    gold = os.path.join(here, "golden")
    prefix = str(tmp_path / "idx")
    assert cli_main(
        ["db", "-i", os.path.join(gold, "config1_db.fa"), "-o", prefix]
    ) == 0
    out_direct = str(tmp_path / "h_direct.tsv")
    out_fallback = str(tmp_path / "h_fallback.tsv")
    args = ["aln", "-d", prefix, "-i",
            os.path.join(gold, "config1_reads.fa"), "--no-pallas",
            "--batch", "128"]
    assert cli_main(args + ["-o", out_direct]) == 0
    monkeypatch.setattr(eng_mod, "DIRECT_TABLE_CAP", 1024)  # force fallback
    assert cli_main(args + ["-o", out_fallback]) == 0
    with open(out_direct) as f1, open(out_fallback) as f2:
        assert f1.read() == f2.read()
    # and the golden table is what both produce
    with open(os.path.join(gold, "config1_hits.tsv")) as f:
        assert f.read() == open(out_direct).read()
