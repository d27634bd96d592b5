"""Center-star multiple sequence alignment on the batched NW engine.

Extension beyond the reference: the reference stops at pairwise kernels
plus an intended-but-empty ``assembly`` driver (source.cpp:2729-2731).
A framework whose users come from pairwise alignment almost always needs
the next composition up — aligning N sequences at once — so swtpu ships
the classic center-star construction (Gusfield 1993, a 2-approximation
of the optimal sum-of-pairs MSA):

1. score all sequence pairs with the device NW forward pass (batched,
   no host walk — only the corner score is read);
2. pick the center = the sequence with the maximum total similarity to
   the others;
3. globally align every other sequence to the center with
   :func:`swtpu.batch.nw_align_batch` (device forward + endpoint-pinned
   host walk, linear or affine/Gotoh, DNA or protein);
4. merge the pairwise paths under "once a gap, always a gap": each
   center gap-slot is widened to the maximum insertion any pair puts
   there, insertions left-justified within their slot.

Everything device-shaped is batched (steps 1 and 3 are one engine call
each); the merge is O(total aligned length) host work.

Rows are int arrays over the input alphabet with ``GAP`` (-1) for gap
columns; :func:`msa_rows_to_strings` renders FASTA-style rows with '-'.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

from swtpu.core.scoring import ScoringParams

__all__ = [
    "GAP",
    "MsaResult",
    "msa_center_star",
    "msa_rows_to_strings",
    "sp_score",
]

#: Gap sentinel in MSA rows (rows are int16/int32; alphabets are uint8).
GAP = -1


@dataclasses.dataclass
class MsaResult:
    """A multiple alignment.

    Attributes:
      rows: one int array per input sequence (input order), all the same
        length; entries are alphabet codes or :data:`GAP`.
      center: index of the center sequence.
      scores: [N] pairwise NW score of each sequence vs the center
        (``scores[center]`` is the center's self-alignment score).
      sp: sum-of-pairs score of the final MSA under the linear-gap
        column scoring (None when scoring is affine — SP columns have
        no well-defined open/extend split).
    """

    rows: List[np.ndarray]
    center: int
    scores: np.ndarray
    sp: Optional[int]


def _pad_batch(seqs: Sequence[np.ndarray]) -> Tuple[np.ndarray, np.ndarray]:
    lens = np.array([len(s) for s in seqs], dtype=np.int64)
    out = np.zeros((len(seqs), int(lens.max())), dtype=np.uint8)
    for i, s in enumerate(seqs):
        out[i, : len(s)] = s
    return out, lens


def _nw_scores_vs(
    seqs: Sequence[np.ndarray],
    other: Sequence[np.ndarray],
    params: ScoringParams,
) -> np.ndarray:
    """Device-only NW corner scores for pairs (seqs[k], other[k])."""
    from swtpu.kernels.xla.semiglobal_scan import (
        semiglobal_batch_diag,
        semiglobal_batch_general,
    )

    qs, lq = _pad_batch(seqs)
    ts, lt = _pad_batch(other)
    if params.alphabet_size == 4 and _is_uniform(params.matrix):
        match = int(params.matrix[0, 0])
        mismatch = -int(params.matrix[0, 1])
        if params.is_linear:
            fwd = semiglobal_batch_diag(
                qs, ts, match, mismatch, params.gap,
                lens_q=lq, lens_t=lt, pin_end=True,
            )
        else:
            fwd = semiglobal_batch_diag(
                qs, ts, match, mismatch,
                gap_open=params.gap_open, gap_extend=params.gap_extend,
                lens_q=lq, lens_t=lt, pin_end=True,
            )
    else:
        fwd = semiglobal_batch_general(
            qs, ts, params, lens_q=lq, lens_t=lt, pin_end=True
        )
    return np.asarray(fwd[0])


def _is_uniform(matrix: np.ndarray) -> bool:
    diag = np.diag(matrix)
    off = matrix[~np.eye(matrix.shape[0], dtype=bool)]
    return bool(np.all(diag == diag[0]) and np.all(off == off[0]))


def _choose_center(
    seqs: Sequence[np.ndarray], params: ScoringParams
) -> Tuple[int, np.ndarray]:
    """argmax_k sum_j NW(k, j); ties broken by lowest index.

    Returns (center, totals). One batched device call over the
    N(N-1)/2 unordered pairs.
    """
    n = len(seqs)
    pairs = [(i, j) for i in range(n) for j in range(i + 1, n)]
    if not pairs:
        return 0, np.zeros(1, dtype=np.int64)
    qs = [seqs[i] for i, _ in pairs]
    ts = [seqs[j] for _, j in pairs]
    s = _nw_scores_vs(qs, ts, params).astype(np.int64)
    totals = np.zeros(n, dtype=np.int64)
    for (i, j), sc in zip(pairs, s):
        totals[i] += sc
        totals[j] += sc
    return int(np.argmax(totals)), totals


def _path_profile(
    path: Sequence[Tuple[int, int]], lc: int
) -> Tuple[List[List[int]], np.ndarray]:
    """Decompose a (query=seq, target=center) NW path into center
    coordinates: per-slot inserted query indices (slot j = between center
    chars j and j+1; slot 0 = before the first) and the query index
    aligned to each center char (-1 = deletion)."""
    slots: List[List[int]] = [[] for _ in range(lc + 1)]
    char_at = np.full(lc, GAP, dtype=np.int64)
    for (i0, j0), (i1, j1) in zip(path, path[1:]):
        di, dj = i1 - i0, j1 - j0
        if di == 1 and dj == 1:
            char_at[j1 - 1] = i1 - 1
        elif di == 1 and dj == 0:
            slots[j0].append(i1 - 1)
        # di == 0, dj == 1: center char j1-1 aligned to a gap
    return slots, char_at


def msa_center_star(
    seqs: Sequence[np.ndarray],
    match: int = 1,
    mismatch: int = 1,
    gap: int = 1,
    gap_open: Optional[int] = None,
    gap_extend: Optional[int] = None,
    params: Optional[ScoringParams] = None,
    center: Optional[int] = None,
) -> MsaResult:
    """Center-star MSA of ``seqs`` (list of alphabet-code arrays).

    Scoring mirrors the pairwise API: uniform (match, mismatch-penalty,
    gap-penalty) DNA by default, ``gap_open``/``gap_extend`` for affine
    (Gotoh), or ``params`` for a general matrix (protein/BLOSUM62).
    ``center`` overrides step 2 (useful to star around a known
    reference sequence).
    """
    from swtpu.batch import nw_align_batch
    from swtpu.core.scoring import dna_matrix

    seqs = [np.asarray(s, dtype=np.uint8) for s in seqs]
    if not seqs or any(len(s) == 0 for s in seqs):
        raise ValueError("msa needs >= 1 non-empty sequences")
    if params is None:
        mat = dna_matrix(match, -mismatch)
        if gap_open is not None:
            params = ScoringParams(mat, gap_open=gap_open, gap_extend=gap_extend)
        else:
            params = ScoringParams.linear(mat, gap)
    n = len(seqs)
    if n == 1:
        row = seqs[0].astype(np.int64)
        return MsaResult([row], 0, np.zeros(1, dtype=np.int64), _sp([row], params))

    if center is None:
        center, _ = _choose_center(seqs, params)
    c = seqs[center]
    others = [k for k in range(n) if k != center]

    qs, lq = _pad_batch([seqs[k] for k in others])
    ts, lt = _pad_batch([c] * len(others))
    kwargs = dict(params=None, lens_q=lq, lens_t=lt)
    if params.alphabet_size == 4 and _is_uniform(params.matrix):
        m0 = int(params.matrix[0, 0])
        x0 = -int(params.matrix[0, 1])
        if params.is_linear:
            aligned = nw_align_batch(qs, ts, m0, x0, params.gap, **kwargs)
        else:
            aligned = nw_align_batch(
                qs, ts, m0, x0,
                gap_open=params.gap_open, gap_extend=params.gap_extend,
                **kwargs,
            )
    else:
        kwargs["params"] = params
        aligned = nw_align_batch(qs, ts, **kwargs)

    lc = len(c)
    profiles = [_path_profile(path, lc) for _, path in aligned]
    ins = np.zeros(lc + 1, dtype=np.int64)
    for slots, _ in profiles:
        for j in range(lc + 1):
            ins[j] = max(ins[j], len(slots[j]))

    # center row: each slot's insertions render as gaps
    def build_center() -> np.ndarray:
        out: List[int] = []
        for j in range(lc):
            out.extend([GAP] * int(ins[j]))
            out.append(int(c[j]))
        out.extend([GAP] * int(ins[lc]))
        return np.array(out, dtype=np.int64)

    def build_row(k: int, slots: List[List[int]], char_at: np.ndarray) -> np.ndarray:
        s = seqs[k]
        out: List[int] = []
        for j in range(lc + 1):
            got = [int(s[i]) for i in slots[j]]
            out.extend(got + [GAP] * (int(ins[j]) - len(got)))
            if j < lc:
                ci = char_at[j]
                out.append(int(s[ci]) if ci != GAP else GAP)
        return np.array(out, dtype=np.int64)

    rows: List[Optional[np.ndarray]] = [None] * n
    rows[center] = build_center()
    for (k, (slots, char_at)) in zip(others, profiles):
        rows[k] = build_row(k, slots, char_at)
    width = {len(r) for r in rows}
    assert len(width) == 1, f"ragged MSA rows: {sorted(width)}"

    scores = np.zeros(n, dtype=np.int64)
    for k, (sc, _) in zip(others, aligned):
        scores[k] = sc
    scores[center] = _nw_scores_vs([c], [c], params)[0]
    return MsaResult(list(rows), center, scores, _sp(rows, params))


def _sp(rows: Sequence[np.ndarray], params: ScoringParams) -> Optional[int]:
    return sp_score(rows, params) if params.is_linear else None


def sp_score(rows: Sequence[np.ndarray], params: ScoringParams) -> int:
    """Sum-of-pairs score of an MSA under linear-gap column scoring:
    char/char pairs score matrix[a, b], char/gap pairs score -gap,
    gap/gap pairs score 0 (the standard SP convention)."""
    if not params.is_linear:
        raise ValueError("sp_score is defined for linear gap scoring")
    mat = params.matrix.astype(np.int64)
    g = int(params.gap)
    total = 0
    n = len(rows)
    for a in range(n):
        ra = rows[a]
        for b in range(a + 1, n):
            rb = rows[b]
            both = (ra != GAP) & (rb != GAP)
            one = (ra != GAP) ^ (rb != GAP)
            total += int(mat[ra[both], rb[both]].sum()) - g * int(one.sum())
    return total


def msa_rows_to_strings(
    rows: Sequence[np.ndarray], alphabet: str = "dna"
) -> List[str]:
    """Render MSA rows as strings with '-' for gaps."""
    if alphabet == "protein":
        from swtpu.core.protein import PROTEIN_ALPHABET as letters
    else:
        letters = "ACGT"
    return [
        "".join("-" if int(x) == GAP else letters[int(x)] for x in r)
        for r in rows
    ]
