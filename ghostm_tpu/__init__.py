"""ghostm_tpu — a TPU-native metagenomic homology-search engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of GHOSTM
(jakewendt/ghostm; Suzuki et al., PLoS ONE 7(5):e36060, 2012): protein-database
seed indexing, six-frame translation of DNA reads, seed lookup + diagonal
voting for candidate selection, banded Smith-Waterman extension as a Pallas
wavefront kernel, and per-query top-hit ranking with E-values — scaled over a
TPU device mesh with the database index sharded along a "db" axis and query
batches data-parallel along a "data" axis.

Provenance: the reference checkout at /root/reference was EMPTY at survey and
build time (SURVEY.md §0); parity targets come from BASELINE.json and the
published GHOSTM paper, with the in-repo CPU oracle (ghostm_tpu.oracle) as the
interim ground truth.
"""

__version__ = "0.1.0"

from ghostm_tpu.config import Config  # noqa: F401
