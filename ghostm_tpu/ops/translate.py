"""Six-frame DNA -> protein translation (SURVEY.md §2 "Six-frame translator").

TPU-native design: translation is a pure LUT gather — codons index a dense
(5,5,5) table (A,C,G,T,N) — vectorised with numpy on the host query-prep path
(SURVEY.md §3.3: translation happens host-side between device steps). Stop
codons are KEPT in-frame as AA_STOP codes rather than splitting the frame into
ragged ORFs; hard-stop scoring (ops.scoring.padded_matrix) makes alignments
unable to span a stop, which reproduces split-at-stop behaviour with static
shapes (divergence note: SURVEY.md §7.2 "Ragged everything").
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
