"""Scoring model: substitution matrix + gap penalties.

The reference's kernel interface takes a flat 16-entry int8 DNA substitution
matrix and a single linear gap penalty (``source.cpp:35-39``, ``62-66``); the
fixed-parameter kernels bake in (match, mismatch, gap) = (1, 1, 1)
(``source.cpp:1073-1079``).  We generalize to a dataclass that also carries
affine-gap (Gotoh) parameters; linear gap is the ``gap_open == gap_extend``
special case, which is the parity mode with the reference.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np


@dataclasses.dataclass(frozen=True)
class ScoringParams:
    """Alignment scoring parameters.

    Attributes:
      matrix: [A, A] int substitution scores (A = alphabet size; 4 for DNA).
      gap_open: penalty (positive) for opening a gap. For linear-gap parity
        with the reference, gap_open == gap_extend == gap.
      gap_extend: penalty (positive) for extending a gap by one.
    """

    matrix: np.ndarray
    gap_open: int
    gap_extend: int

    def __post_init__(self):
        m = np.asarray(self.matrix, dtype=np.int32)
        if m.ndim != 2 or m.shape[0] != m.shape[1]:
            raise ValueError(f"matrix must be square, got {m.shape}")
        object.__setattr__(self, "matrix", m)

    @property
    def alphabet_size(self) -> int:
        return int(self.matrix.shape[0])

    @property
    def is_linear(self) -> bool:
        return self.gap_open == self.gap_extend

    @property
    def gap(self) -> int:
        """Linear gap penalty (valid only when is_linear)."""
        if not self.is_linear:
            raise ValueError("gap requested on affine ScoringParams")
        return self.gap_open

    @property
    def flat16(self) -> np.ndarray:
        """Flat row-major 16-entry form matching the reference ABI
        (``source.cpp:35-39``: score_matrix[seq1[x]*4 + seq2[y]])."""
        if self.alphabet_size != 4:
            raise ValueError("flat16 only defined for DNA (4-letter) scoring")
        return self.matrix.reshape(-1).astype(np.int32)

    @staticmethod
    def linear(matrix: np.ndarray, gap: int) -> "ScoringParams":
        return ScoringParams(matrix=matrix, gap_open=gap, gap_extend=gap)


def dna_matrix(match: int, mismatch: int) -> np.ndarray:
    """4x4 DNA substitution matrix with uniform match/mismatch scores."""
    m = np.full((4, 4), int(mismatch), dtype=np.int32)
    np.fill_diagonal(m, int(match))
    return m


#: The reference's general-scoring test parameters (source.cpp:2954-2959):
#: match +10, mismatch -30, linear gap 15.
DNA_10_30_15 = ScoringParams.linear(dna_matrix(10, -30), 15)

#: The reference's fixed "(1,1,1)" scoring: match +1, mismatch -1, gap 1
#: (source.cpp:1073-1079).
DNA_111 = ScoringParams.linear(dna_matrix(1, -1), 1)
