"""Native C++ host kernels vs numpy reference: bit-identical outputs
(SURVEY.md §2 — the reference's native index builder / FASTA reader)."""

import numpy as np
import pytest

from ghostm_tpu import native
from ghostm_tpu.index import seeds
from ghostm_tpu.ops.encode import SENTINEL, encode_aa

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def _numpy_csr(buf, k, keep=None):
    keys = seeds.kmer_keys(buf, k)
    valid = keys < 20**k
    if keep is not None:
        valid &= keep[: len(keys)]
    vkeys = keys[valid]
    vpos = np.nonzero(valid)[0].astype(np.int32)
    counts = np.bincount(vkeys, minlength=20**k)
    bucket_starts = np.zeros(20**k + 2, dtype=np.int64)
    np.cumsum(counts, out=bucket_starts[1 : 20**k + 1])
    bucket_starts[20**k + 1] = bucket_starts[20**k]
    order = np.argsort(vkeys, kind="stable")
    return vpos[order], bucket_starts.astype(np.int32)


@pytest.mark.parametrize("k", [2, 3, 4])
def test_kmer_csr_matches_numpy(rng, k):
    buf = rng.integers(0, 26, size=5000).astype(np.int8)  # incl. invalid codes
    pos_n, bs_n = _numpy_csr(buf, k)
    pos_c, bs_c = native.kmer_csr(buf, k)
    np.testing.assert_array_equal(pos_c, pos_n)
    np.testing.assert_array_equal(bs_c, bs_n)


def test_kmer_csr_keep_mask(rng):
    buf = rng.integers(0, 20, size=2000).astype(np.int8)
    keep = rng.random(len(buf)) < 0.5
    pos_n, bs_n = _numpy_csr(buf, 3, keep)
    pos_c, bs_c = native.kmer_csr(buf, 3, keep)
    np.testing.assert_array_equal(pos_c, pos_n)
    np.testing.assert_array_equal(bs_c, bs_n)


def test_fasta_reader(tmp_path):
    p = tmp_path / "t.fa"
    p.write_text(
        ">s0 desc ignored\nARNDCQ\nEGHIK\n\n>s1\nmfpst*\n>empty\n>s3\nWYV\n"
    )
    out = native.read_fasta_protein(str(p))
    assert out is not None
    names, seqs = out
    assert names == ["s0", "s1", "empty", "s3"]
    np.testing.assert_array_equal(seqs[0], encode_aa("ARNDCQEGHIK"))
    np.testing.assert_array_equal(seqs[1], encode_aa("MFPST*"))
    assert len(seqs[2]) == 0
    np.testing.assert_array_equal(seqs[3], encode_aa("WYV"))


def test_build_seed_index_uses_native(rng):
    # end-to-end through the public builder (native path active)
    buf = np.concatenate(
        [
            rng.integers(0, 20, size=300).astype(np.int8),
            np.full(8, SENTINEL, np.int8),
            rng.integers(0, 20, size=300).astype(np.int8),
        ]
    )
    idx = seeds.build_seed_index(buf, 3)
    keys = seeds.kmer_keys(buf, 3)
    for key in rng.integers(0, 8000, size=30):
        lo, hi = idx.bucket_starts[key], idx.bucket_starts[key + 1]
        np.testing.assert_array_equal(
            idx.positions[lo:hi], np.nonzero(keys == key)[0]
        )


def test_m8_format_fuzz_matches_python(rng):
    """The C printf path must reproduce CPython's f-string bytes exactly
    for every column format (:.2f, ints, :.2e, :.1f), including ties and
    extreme magnitudes (report.write_hits fast path)."""
    if not native.available() or native.m8_format(
        np.zeros(0, np.int32), b"", np.zeros(1, np.int64),
        np.zeros(0, np.int32), b"", np.zeros(1, np.int64),
        *([np.zeros(0)] * 10),
    ) is None:
        import pytest

        pytest.skip("native library unavailable")
    n = 4096
    pid = rng.random(n) * 100
    pid[:16] = [0.125, 99.995, 100.0, 0.005, 2.675, 33.335, 66.665, 0.0,
                12.345, 87.655, 0.015, 0.025, 49.995, 50.005, 1.115, 3.885]
    ev = 10.0 ** (rng.random(n) * 40 - 35)
    ev[:6] = [0.0, 1e-300, 9.995e-10, 2.5e-3, 9.999, 1.0]
    bits = rng.random(n) * 500
    bits[:6] = [0.05, 0.15, 0.25, 99.95, 123.45, 0.0]
    ints = [rng.integers(0, 2**31 - 1, n).astype(np.int32) for _ in range(3)]
    i64s = [rng.integers(0, 2**40, n).astype(np.int64) for _ in range(4)]
    qnames = [f"q{i}" for i in range(n)]
    snames = [f"subj_{i}" for i in range(n)]
    from ghostm_tpu.report import _name_arena

    qarena, qoff = _name_arena(qnames)
    sarena, soff = _name_arena(snames)
    idx = np.arange(n, dtype=np.int32)
    got = native.m8_format(
        idx, qarena, qoff, idx, sarena, soff,
        pid, ints[0], ints[1], ints[2], i64s[0], i64s[1], i64s[2], i64s[3],
        ev, bits,
    )
    assert got is not None
    want = "".join(
        f"{qnames[i]}\t{snames[i]}\t{pid[i]:.2f}\t{ints[0][i]}\t"
        f"{ints[1][i]}\t{ints[2][i]}\t{i64s[0][i]}\t{i64s[1][i]}\t"
        f"{i64s[2][i]}\t{i64s[3][i]}\t{ev[i]:.2e}\t{bits[i]:.1f}\n"
        for i in range(n)
    )
    assert got.decode() == want


def test_write_hits_native_equals_python():
    """End-to-end: write_hits with a SubjectNames arena (native fast path)
    must emit byte-identical output to the plain-dict Python loop."""
    import io

    from ghostm_tpu.config import Config
    from ghostm_tpu.engine import BatchHits
    from ghostm_tpu.report import SubjectNames, write_hits

    rng2 = np.random.default_rng(7)
    R, K = 128, 5
    z = np.zeros((R, K), np.int32)
    hits = BatchHits(
        rng2.integers(0, 120, (R, K)).astype(np.int32),
        rng2.integers(0, 500, (R, K)).astype(np.int32),
        rng2.integers(0, 6, (R, K)).astype(np.int32),
        rng2.integers(10, 33, (R, K)).astype(np.int32),
        rng2.integers(50, 300, (R, K)).astype(np.int32),
        rng2.integers(10, 33, (R, K)).astype(np.int32), z, z, z,
    )
    stats = {
        k: rng2.integers(0, 30, (R, K)).astype(np.int32)
        for k in ("qstart", "qend", "sstart", "send", "length", "matches",
                  "mismatch", "gapopen")
    }
    stats["length"] = np.maximum(stats["length"], 1)
    names = [f"read{i}" for i in range(R)]
    d = {i: f"s{i}" for i in range(500)}
    lens = np.full(R, 100, np.int32)
    cfg = Config(query_batch=R, seed_len=4)
    b1, b2 = io.StringIO(), io.StringIO()
    n1 = write_hits(b1, cfg, names, lens, d, hits, stats, 10**6, 500)
    n2 = write_hits(
        b2, cfg, names, lens, SubjectNames(d), hits, stats, 10**6, 500
    )
    assert n1 == n2
    assert b1.getvalue() == b2.getvalue()
    assert n1 > 0
