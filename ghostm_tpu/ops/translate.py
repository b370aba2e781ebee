"""Six-frame DNA -> protein translation (SURVEY.md §2 "Six-frame translator").

TPU-native design: translation is a pure LUT — codons index a dense (5,5,5)
table (A,C,G,T,N). Two bit-identical implementations:

  * `six_frame_translate` — numpy host path (test oracle, --check path);
  * `six_frame_translate_jnp` — device path, compiled INTO the engine's
    one-program batch step (r05): the host version cost ~34 ms of serial
    main-thread time per 8192-read batch, the single largest non-overlapped
    host cost in the pipeline. The device version is GATHER-FREE (TPU
    gathers are row-count bound, ~10 ns/row — a naive LUT gather would
    give back most of the win): the 125-entry codon tables become 7-level
    binary select trees over baked constants (the same trick as the fused
    SW kernel's profile-word select tree, kernels/sw_fused.qwords), and
    the reverse-complement's per-read anchoring becomes a log2(L)-step
    conditional-roll network (the same trick as engine.fetch_windows)
    instead of a take_along_axis gather.

Stop codons are KEPT in-frame as AA_STOP codes rather than splitting the
frame into ragged ORFs; hard-stop scoring (ops.scoring.padded_matrix) makes
alignments unable to span a stop, which reproduces split-at-stop behaviour
with static shapes (divergence note: SURVEY.md §7.2 "Ragged everything").
"""

from __future__ import annotations

import numpy as np

from ghostm_tpu.ops.encode import AA_X, PAD, encode_aa

# Standard genetic code, codon written in DNA (T not U).
_CODON_TABLE = {
    "TTT": "F", "TTC": "F", "TTA": "L", "TTG": "L",
    "CTT": "L", "CTC": "L", "CTA": "L", "CTG": "L",
    "ATT": "I", "ATC": "I", "ATA": "I", "ATG": "M",
    "GTT": "V", "GTC": "V", "GTA": "V", "GTG": "V",
    "TCT": "S", "TCC": "S", "TCA": "S", "TCG": "S",
    "CCT": "P", "CCC": "P", "CCA": "P", "CCG": "P",
    "ACT": "T", "ACC": "T", "ACA": "T", "ACG": "T",
    "GCT": "A", "GCC": "A", "GCA": "A", "GCG": "A",
    "TAT": "Y", "TAC": "Y", "TAA": "*", "TAG": "*",
    "CAT": "H", "CAC": "H", "CAA": "Q", "CAG": "Q",
    "AAT": "N", "AAC": "N", "AAA": "K", "AAG": "K",
    "GAT": "D", "GAC": "D", "GAA": "E", "GAG": "E",
    "TGT": "C", "TGC": "C", "TGA": "*", "TGG": "W",
    "CGT": "R", "CGC": "R", "CGA": "R", "CGG": "R",
    "AGT": "S", "AGC": "S", "AGA": "R", "AGG": "R",
    "GGT": "G", "GGC": "G", "GGA": "G", "GGG": "G",
}

_BASE = {"A": 0, "C": 1, "G": 2, "T": 3}

# (5,5,5) codon LUT; any position == 4 (ambiguous N) -> X.
CODON_LUT = np.full((5, 5, 5), AA_X, dtype=np.int8)
for _codon, _aa in _CODON_TABLE.items():
    i, j, k = (_BASE[c] for c in _codon)
    CODON_LUT[i, j, k] = encode_aa(_aa)[0]

# complement for codes A,C,G,T,N -> T,G,C,A,N
_COMP = np.array([3, 2, 1, 0, 4], dtype=np.int8)


# Flat 125-entry tables for the device select trees. RC_LUT_FLAT[i] is the
# amino acid of the REVERSE-COMPLEMENT codon read at forward position i:
# RC_LUT[a, b, c] = CODON_LUT[comp(c), comp(b), comp(a)] — so the reverse
# strand translates with a forward scan + reversal, no per-read rc buffer.
CODON_LUT_FLAT = CODON_LUT.reshape(-1)
RC_LUT_FLAT = CODON_LUT[
    _COMP[np.arange(5)][None, None, :, ],
    _COMP[np.arange(5)][None, :, None],
    _COMP[np.arange(5)][:, None, None],
].reshape(-1)


def _select_tree_lut(idx, lut_flat):
    """jnp: lut_flat[idx] for a 125-entry int table WITHOUT a gather —
    7-level binary select tree over 128 baked scalar constants (pad = X).
    Exact integer semantics; ~127 vector selects over idx's shape."""
    import jax.numpy as jnp

    vals = [int(lut_flat[c]) if c < len(lut_flat) else int(AA_X)
            for c in range(128)]
    bits = [((idx >> b) & 1) == 1 for b in range(7)]
    cur = [jnp.int32(v) for v in vals]
    for b in range(7):
        cur = [jnp.where(bits[b], cur[2 * i + 1], cur[2 * i])
               for i in range(len(cur) // 2)]
    return cur[0]


def six_frame_translate_jnp(dna, lengths, frame_len: int):
    """Device twin of six_frame_translate — bit-identical output
    (tests/test_ops.py::test_translate_device_matches_host), traceable
    into the engine's one-program step. See module docstring for the
    gather-free design."""
    import jax.numpy as jnp

    R, L = dna.shape
    d = dna.astype(jnp.int32)
    lengths = lengths.astype(jnp.int32)
    c = jnp.clip(d, 0, 4)
    # codon start index at every forward position (pad tail with N codons)
    cN = jnp.concatenate([c, jnp.full((R, 2), 4, jnp.int32)], axis=1)
    idx = (cN[:, :L] * 5 + cN[:, 1 : L + 1]) * 5 + cN[:, 2 : L + 2]
    fwd_aa = _select_tree_lut(idx, CODON_LUT_FLAT)     # (R, L)
    rc_aa = _select_tree_lut(idx, RC_LUT_FLAT)         # (R, L)
    # H[i] = rc_aa[len - 3 - i]: flip, then per-read left-roll by
    # (L - len + 2) via its bits (conditional static rolls, no gather)
    Hr = jnp.flip(rc_aa, axis=1)                       # Hr[i] = rc_aa[L-1-i]
    sh = (L - lengths + 2) % L
    for b in range(max(L - 1, 1).bit_length()):
        dlt = 1 << b
        Hr = jnp.where(
            ((sh >> b) & 1)[:, None] == 1, jnp.roll(Hr, -dlt, axis=1), Hr
        )
    ncod_max = min(frame_len, L)
    j = jnp.arange(ncod_max, dtype=jnp.int32)[None, :]
    frames = []
    for off in range(3):
        n_cod = min(frame_len, max(0, (L - off) // 3))
        src = fwd_aa[:, off : off + 3 * n_cod : 3]
        valid = j[:, :n_cod] < (lengths[:, None] - off) // 3
        aa = jnp.where(valid, src[:, :n_cod], PAD)
        frames.append(jnp.pad(
            aa, ((0, 0), (0, frame_len - n_cod)), constant_values=PAD
        ))
    for off in range(3):
        n_cod = min(frame_len, max(0, (L - off) // 3))
        src = Hr[:, off : off + 3 * n_cod : 3]
        valid = j[:, :n_cod] < (lengths[:, None] - off) // 3
        aa = jnp.where(valid, src[:, :n_cod], PAD)
        frames.append(jnp.pad(
            aa, ((0, 0), (0, frame_len - n_cod)), constant_values=PAD
        ))
    return jnp.stack(frames, axis=1).astype(jnp.int8)


def six_frame_translate(
    dna: np.ndarray, lengths: np.ndarray, frame_len: int
) -> np.ndarray:
    """Translate a padded batch of DNA reads in all six frames.

    Args:
      dna: (R, L) int8 codes (A=0..T=3, N=4); padding value irrelevant (masked).
      lengths: (R,) true read lengths.
      frame_len: output residues per frame (pad with PAD / truncate).

    Returns:
      (R, 6, frame_len) int8 amino-acid codes. Frames 0-2 forward offsets
      0,1,2; frames 3-5 are offsets 0,1,2 of the reverse complement.
    """
    dna = np.ascontiguousarray(dna, dtype=np.int8)
    R, L = dna.shape
    lengths = np.asarray(lengths, dtype=np.int64)

    # Reverse-complement with per-read length: rc[r, i] = comp(dna[r, len-1-i])
    pos = np.arange(L, dtype=np.int64)[None, :]
    rc_idx = np.clip(lengths[:, None] - 1 - pos, 0, L - 1)
    rc = _COMP[np.take_along_axis(dna, rc_idx, axis=1)]
    rc[pos >= lengths[:, None]] = 4

    out = np.full((R, 6, frame_len), PAD, dtype=np.int8)
    for strand, seqs in enumerate((dna, rc)):
        for off in range(3):
            n_cod = min(frame_len, max(0, (L - off) // 3))
            if n_cod == 0:
                continue
            c = seqs[:, off : off + 3 * n_cod].reshape(R, n_cod, 3)
            aa = CODON_LUT[
                np.clip(c[..., 0], 0, 4),
                np.clip(c[..., 1], 0, 4),
                np.clip(c[..., 2], 0, 4),
            ]
            valid = np.arange(n_cod)[None, :] < (lengths[:, None] - off) // 3
            aa = np.where(valid, aa, PAD)
            out[:, 3 * strand + off, :n_cod] = aa
    return out
