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
