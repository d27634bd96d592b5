"""swtpu — TPU-native pairwise sequence alignment engine.

A brand-new JAX / XLA / Pallas framework with the capabilities of the
``eukaryo/smith-waterman-simd`` reference (C++/AVX2, ``/root/reference/source.cpp``):

- exact local (Smith-Waterman) and semi-global pairwise alignment with
  traceback, linear and affine (Gotoh) gaps in every engine family,
  runtime substitution matrices (4x4 DNA, reference oracle
  source.cpp:35-60; BLOSUM62 protein),
- inter-pair *batch* DP kernels (the reference's fastest family,
  source.cpp:1227-1522) re-designed for the TPU VPU: batch on lanes,
  row-scan in time,
- intra-pair *wavefront* (anti-diagonal) kernels (source.cpp:62-1071)
  as the alternate schedule for single long pairs,
- adaptive-banded X-drop semi-global alignment with traceback
  (source.cpp:1836-2725): device forward pass, host traceback,
- fixed-band (static diagonal corridor) local alignment at the
  issue-bound rate, with traceback,
- 8/16/32-bit precision tiers with runtime overflow promotion,
- pod-scale data-parallel batch engine and sequence-parallel single-pair
  striping via jax.sharding / shard_map.

Everything is validated by fixed-seed randomized differential testing
against scalar oracles, mirroring the reference's harness strategy
(source.cpp:2943-3030).
"""

__version__ = "0.2.0"

from swtpu.core.scoring import ScoringParams, DNA_111, dna_matrix  # noqa: F401
from swtpu.core.encode import (  # noqa: F401
    pack_2bit,
    unpack_2bit,
    random_dna,
    mutate,
    revcomp,
)
