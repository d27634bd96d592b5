"""Greedy overlap-layout-consensus assembly driver.

The reference left ``assembly(reads)`` as an empty stub
(source.cpp:2729-2731) — the intended consumer of its alignment kernels.
This module implements that driver on top of swtpu's engines:

1. **Overlap**: all-vs-all read scoring on device (the batch SW engine) to
   find candidate pairs, then exact suffix-prefix verification with the
   (C++) traceback walker: an overlap is a local alignment whose path ends
   at the suffix end of read A and starts at the prefix start of read B.
2. **Layout**: greedy chaining — start from a read that is nobody's good
   right-extension, repeatedly follow the best outgoing overlap.
3. **Consensus**: splice each next read at its overlap offset (reads are
   assumed low-error; ties/conflicts resolved by the earlier read).

A demo at the reference's intended scale, not a production assembler —
but every step runs through the real engines.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from swtpu.core.scoring import DNA_111, ScoringParams


def make_reads(
    rng: np.random.Generator,
    genome: np.ndarray,
    read_len: int,
    step: int,
    shuffle: bool = True,
) -> List[np.ndarray]:
    """Tile a genome into overlapping reads (overlap = read_len - step)."""
    starts = list(range(0, len(genome) - read_len + 1, step))
    if starts[-1] != len(genome) - read_len:
        starts.append(len(genome) - read_len)  # cover the tail
    reads = [genome[i : i + read_len] for i in starts]
    if shuffle:
        order = rng.permutation(len(reads))
        reads = [reads[i] for i in order]
    return reads


def _ambig_safe(params: ScoringParams) -> ScoringParams:
    """Extend the matrix with one never-matching row/col for ambiguity
    codes (encode_dna maps N to 4, one past the 4x4 DNA matrix; the exact
    walkers index matrix[code] directly, so unextended codes read out of
    bounds). The extra code scores the matrix's worst mismatch against
    everything, including itself."""
    A = params.alphabet_size
    worst = int(params.matrix.min())
    m = np.full((A + 1, A + 1), worst, dtype=np.int32)
    m[:A, :A] = params.matrix
    return ScoringParams(m, params.gap_open, params.gap_extend)


def _overlap_coords(
    a: np.ndarray,
    b: np.ndarray,
    params: ScoringParams,
    min_overlap: int,
    slack: int = 0,
) -> int:
    """Offset of B's origin in A coordinates if A's suffix aligns to B's
    prefix, else 0.

    ``slack`` tolerates sequencing errors at the read ends: a local
    alignment clips a trailing/leading mismatch, so error-tolerant overlap
    detection must accept paths ending within ``slack`` of A's end and
    starting within ``slack`` of B's start (exact suffix-prefix at the
    default 0)."""
    from swtpu import native
    from swtpu.oracle.sw import sw_traceback

    if native.available():
        score, path = native.sw_traceback(a, b, params.matrix, params.gap)
    else:
        score, path = sw_traceback(a, b, params)
    if len(path) < 2:
        return 0
    (i0, j0), (i1, j1) = path[0], path[-1]
    # suffix-prefix (± slack): alignment reaches A's end, starts at B's start
    if i1 >= len(a) - slack and j0 <= slack and (i1 - i0) >= min_overlap:
        # Anchor the placement at the alignment END (i1, j1): B's last
        # aligned char B[j1-1] sits at A position i1-1, so B's origin is
        # i1 - j1 in A coordinates. Anchoring at the start (i0 - j0) is
        # only equal for gapless paths — an indel inside the overlap
        # shifts the appended suffix by the indel drift (advisor r03).
        # At slack=0 this is exactly len(a) - j1: the exact splice.
        offset = i1 - j1
        return offset if 0 < offset < len(a) else 0
    return 0


def assemble_greedy(
    reads: Sequence[np.ndarray],
    params: ScoringParams = DNA_111,
    min_overlap: int = 20,
    engine=None,
    slack: int = 0,
) -> np.ndarray:
    """Assemble reads into one contig (greedy OLC). Returns the contig.

    ``slack > 0`` turns on error tolerance: overlap endpoints may miss the
    read ends by up to ``slack`` (local alignment clips erroneous ends),
    and the consensus is a per-column majority vote over all chained reads
    (a base from the earliest covering read is replaced only when strictly
    outvoted) instead of a splice — substitution errors covered >= 3x are
    voted out. With the default slack=0 the consensus degenerates to the
    exact splice (clean reads assemble bit-exactly)."""
    n = len(reads)
    if n == 0:
        return np.zeros(0, np.uint8)
    if n == 1:
        return np.asarray(reads[0])

    if engine is None:
        from swtpu.kernels.xla import sw_batch_diag

        engine = lambda q, t: sw_batch_diag(q, t, params)

    # device screening: score every ordered pair (A suffix vs B prefix is a
    # local alignment, so plain SW scores upper-bound the overlap)
    L = max(len(r) for r in reads)
    batch_q = np.full((n * (n - 1), L), 4, np.uint8)
    batch_t = np.full((n * (n - 1), L), 5, np.uint8)
    pairs = []
    row = 0
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            batch_q[row, : len(reads[i])] = reads[i]
            batch_t[row, : len(reads[j])] = reads[j]
            pairs.append((i, j))
            row += 1
    scores = np.asarray(engine(batch_q, batch_t))

    # with errors allowed inside the overlap, require most (not all) of
    # min_overlap columns to be matches before exact verification
    thresh = (min_overlap - 2 * slack) * int(np.diag(params.matrix).min())
    best_next: dict = {}
    has_pred: set = set()
    # exact verification of promising pairs, best overlap per source read.
    # Verification walks matrix[code] directly, so clip ambiguity codes to
    # the extended never-match row (N stays N, it just can't overflow).
    vparams = _ambig_safe(params)
    A = params.alphabet_size
    vreads = [np.minimum(np.asarray(r), A).astype(np.uint8) for r in reads]
    order = np.argsort(-scores)
    for idx in order:
        if scores[idx] < thresh:
            break
        i, j = pairs[idx]
        if i in best_next:
            continue
        off = _overlap_coords(vreads[i], vreads[j], vparams, min_overlap,
                              slack)
        if off > 0:
            best_next[i] = (j, off)
            has_pred.add(j)

    # layout: start from a read with no predecessor, chain offsets
    starts = [i for i in range(n) if i not in has_pred]
    start = starts[0] if starts else 0
    chain = [(start, 0)]  # (read index, contig offset)
    used = {start}
    cur, cur_off = start, 0
    while cur in best_next:
        nxt, off = best_next[cur]
        if nxt in used:
            break
        cur_off += off
        chain.append((nxt, cur_off))
        used.add(nxt)
        cur = nxt

    # consensus: first covering read's base, replaced only when strictly
    # outvoted by the per-column majority over all chained reads.
    # Ambiguity codes (>3, e.g. N from encode_dna) never vote — they keep
    # the first covering read's base and are outvoted by ANY real base.
    total = max(off + len(reads[r]) for r, off in chain)
    base = np.full(total, 255, np.uint8)
    counts = np.zeros((total, 4), np.int32)
    for r, off in chain:
        seg = np.asarray(reads[r], np.uint8)
        cols = np.arange(off, off + len(seg))
        real = seg <= 3
        np.add.at(counts, (cols[real], seg[real].astype(np.int64)), 1)
        unwritten = base[cols] == 255
        base[cols[unwritten]] = seg[unwritten]
    maj = counts.argmax(axis=1).astype(np.uint8)
    maj_cnt = counts.max(axis=1)
    base_real = base <= 3
    base_cnt = np.where(
        base_real,
        counts[np.arange(total), np.minimum(base, 3).astype(np.int64)],
        0,
    )
    return np.where(maj_cnt > base_cnt, maj, base).astype(np.uint8)
