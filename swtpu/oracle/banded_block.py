"""Block-adaptive banded X-drop semi-global oracle — the round-4 tier.

The per-round adaptive band (oracle/semiglobal.py::banded_xdrop ≙
source.cpp:1836-1976) decides direction / rescales / X-drops EVERY
anti-diagonal round; its TPU kernels are therefore permute-bound (~15
lane-motion ops per 32-cell round, README "Hardware notes") and run 80x
below the fixed-band rowscan ceiling. This tier amortizes ALL adaptive
work over a block of K rows so the inner loop is the fixed-corridor
rowscan schedule (zero lane motion):

- The band is a diagonal CORRIDOR of ``width`` consecutive columns that
  slides right one column per row (following the main diagonal); its
  per-block base is re-centered once per block from the carried row's
  argmax (clipped to ±dmax) — the block analog of the reference's
  per-round right/down decision (source.cpp:1891-1912).
- X-drop (zero cells below max - X) and the dead-band termination test
  run once per block on the carried boundary row, not per round
  (source.cpp:1933-1941's contract at block granularity). Interior
  cells below the cutoff survive to the block end — the block tier
  prunes strictly less than the per-round tier inside a block.
- Values carry the +X offset with 0 = dead, exactly the family
  convention: any cell value <= 0 is dead, dead diag never resurrects
  (guarded), dead up/left decay below the 0 floor by themselves.

This oracle IS the contract for the block kernels (the reference's own
oracle-tiering lesson: band-clipped tiers get band-clipped oracles,
full-matrix comparison is statistical only — source.cpp:2773-2784).
Scores cross-check statistically against the per-round oracle on
mutation-model pairs in tests/test_banded_block.py.

Coordinate/semantics spec (shared verbatim by the XLA and Pallas
engines):

- blocks b = 0, 1, ...; block b processes rows y = b*K+1 .. b*K+K;
  row y's band covers columns j in [base_b + r, base_b + r + width)
  where r = (y-1) - b*K (the corridor slides +1 per row inside the
  block; slot k holds column j = base_b + r + k).
- base_0 = 1 - width//2 (band initially centered on the origin);
  base_{b+1} = base_b + K + delta_b with
  delta_b = clip(first_argmax(carried) - width//2, -dmax, +dmax).
- recurrence for cell (y, j) at slot k (after the previous row is
  aligned so prev[k] = H(y-1, j-1)):
      diag = prev[k] > 0 ? prev[k] + s(y, j)   : dead
      up   = prev[k+1] > 0 ? prev[k+1] - gap   : dead   (k = W-1: dead)
      left = H[k-1] > 0 ? H[k-1] - gap         : dead   (k = 0: see pin)
      H[k] = max(diag, up, left, 0)
  s(y, j) = match/-mismatch (or matrix[q, t]); any pad involvement
  (j < 1, j > m, y > len, pad codes) scores -mismatch (matrix.min()).
- column-0 boundary: a slot holding j == 0 is PINNED to the gap chain
  max(X - y*gap, 0) after the recurrence; when slot 0's left neighbor
  is column 0 (base_b + r == 1), left reads the chain value directly.
  Row 0 (the initial carried row) is the top chain H(0, j) = X - j*gap.
- endpoint = first (row-major: max H, then min y, then min j) cell over
  all in-band cells of all rows; score = H(endpoint) - X. Traceback
  from the endpoint over the stored band history, tie-break
  diag -> up -> left (the family order, source.cpp:1558-1567).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np

MINUS_INF = -(2**30)


@dataclasses.dataclass
class BandedBlockResult:
    """Forward state for kernel parity tests and the traceback walker.

    band_history[y-1] holds row y's band values at slots 0..width-1
    (slot k <-> column base_of_row(y) + k); row_base[y-1] = that base
    = base_b + r. n_rows = rows actually computed (done may cut early,
    always a multiple of K except at y = n).
    """

    score: int
    path: List[Tuple[int, int]]
    end: Tuple[int, int]
    band_history: np.ndarray  # [n_rows, width] int64
    row_base: np.ndarray  # [n_rows] int64
    n_rows: int
    bases: np.ndarray  # [n_blocks] int64 base_b
    deltas: np.ndarray  # [n_blocks] int64 delta_b


def walk_block_history(
    hist: np.ndarray,
    row_base: np.ndarray,
    end: Tuple[int, int],
    q: np.ndarray,
    t: np.ndarray,
    match: int = 1,
    mismatch: int = 1,
    gap: int = 1,
    x_threshold: int = 70,
    matrix: Optional[np.ndarray] = None,
) -> List[Tuple[int, int]]:
    """Traceback over a stored block-tier band history.

    Shared by the scalar oracle and the batch engines (the engines' host
    walk fetches ``hist[:n_rows]`` / ``row_base[:n_rows]`` and calls
    this). ``end`` is the 1-based (y, j) endpoint; values in ``hist``
    carry the +x_threshold offset with 0 = dead. Walk order is the family
    tie-break diag -> up -> left (source.cpp:1558-1567). Returns the
    1-based (y, j) path origin -> endpoint; an all-dead endpoint (0, 0)
    returns [(0, 0)].
    """
    q = np.asarray(q, dtype=np.int64)
    t = np.asarray(t, dtype=np.int64)
    n_rows = len(hist)
    W = hist.shape[1] if n_rows else 0
    m = len(t)
    X = int(x_threshold)
    g = int(gap)
    mat = None if matrix is None else np.asarray(matrix, dtype=np.int64)
    pad_sc = -int(mismatch) if mat is None else int(mat.min())
    max_y, max_j = end

    def get(y: int, j: int) -> int:
        if y == 0:
            v = X - j * g if j >= 0 else MINUS_INF
            return int(v) if v > 0 or (j == 0) else MINUS_INF
        if y < 1 or y > n_rows:
            return MINUS_INF
        if j == 0:
            v = X - y * g
            # the pinned column-0 chain is only reachable while stored
            k = j - row_base[y - 1]
            if 0 <= k < W:
                vv = hist[y - 1, k]
                return MINUS_INF if vv == 0 else int(vv)
            return int(v) if v > 0 else MINUS_INF
        k = j - row_base[y - 1]
        if k < 0 or k >= W:
            return MINUS_INF
        v = hist[y - 1, k]
        return MINUS_INF if v == 0 else int(v)

    def sub(y: int, j: int) -> int:
        if j < 1 or j > m:
            return pad_sc
        if mat is not None:
            return int(mat[q[y - 1], t[j - 1]])
        return match if q[y - 1] == t[j - 1] else pad_sc

    if max_y == 0 and max_j == 0:
        return [(0, 0)]
    path = [(max_y, max_j)]
    i, j = max_y, max_j
    while i or j:
        v = get(i, j)
        if i and j and get(i - 1, j - 1) > MINUS_INF and v == get(
            i - 1, j - 1
        ) + sub(i, j):
            i, j = i - 1, j - 1
        elif i and get(i - 1, j) > MINUS_INF and v == get(i - 1, j) - g:
            i = i - 1
        elif j and get(i, j - 1) > MINUS_INF and v == get(i, j - 1) - g:
            j = j - 1
        else:  # pragma: no cover
            raise AssertionError("inconsistent block-banded traceback")
        path.append((i, j))
    path.reverse()
    return path


def banded_xdrop_block(
    q: np.ndarray,
    t: np.ndarray,
    match: int = 1,
    mismatch: int = 1,
    gap: int = 1,
    width: int = 64,
    block: int = 32,
    x_threshold: int = 70,
    dmax: Optional[int] = None,
    matrix: Optional[np.ndarray] = None,
    return_state: bool = False,
):
    """Scalar block-adaptive banded X-drop semi-global alignment.

    Returns (score, path) or a :class:`BandedBlockResult`. path is the
    1-based (y, j) DP coordinate list origin -> endpoint like the other
    semiglobal oracles; an all-dead start (nothing scored) returns
    score 0 with path [(0, 0)].
    """
    q = np.asarray(q, dtype=np.int64)
    t = np.asarray(t, dtype=np.int64)
    n, m = len(q), len(t)
    W = int(width)
    K = int(block)
    X = int(x_threshold)
    g = int(gap)
    D = min(K, W // 2) if dmax is None else int(dmax)
    mat = None if matrix is None else np.asarray(matrix, dtype=np.int64)
    pad_sc = -int(mismatch) if mat is None else int(mat.min())

    n_blocks = -(-n // K) if n else 0
    hist = np.zeros((n_blocks * K, W), dtype=np.int64)
    row_base = np.zeros(n_blocks * K, dtype=np.int64)
    bases = np.zeros(max(n_blocks, 1), dtype=np.int64)
    deltas = np.zeros(max(n_blocks, 1), dtype=np.int64)

    base = 1 - W // 2
    # initial carried row: prev[k] = H(0, base - 1 + k) = top gap chain
    j0 = base - 1 + np.arange(W)
    carried = np.where(j0 >= 0, X - j0 * g, 0)
    carried = np.where(carried > 0, carried, 0)

    max_score, max_y, max_j = X, 0, 0
    n_rows = 0
    ks = np.arange(W)

    def s_row(y, js):
        """Substitution scores for row y against columns js (1-based)."""
        qc = q[y - 1]
        in_t = (js >= 1) & (js <= m)
        tc = np.where(in_t, t[np.clip(js - 1, 0, max(m - 1, 0))], -1)
        if mat is not None:
            ok = (qc >= 0) & (tc >= 0) & (qc < mat.shape[0]) & (
                tc < mat.shape[1]
            )
            return np.where(ok, mat[min(max(qc, 0), mat.shape[0] - 1), np.clip(tc, 0, mat.shape[1] - 1)], pad_sc)
        return np.where((qc == tc) & (tc >= 0), match, pad_sc)

    done = False
    for b in range(n_blocks):
        if done:
            break
        bases[b] = base
        prev = carried
        for r in range(K):
            y = b * K + r + 1
            if y > n:
                # fake row (batch kernels compute it with pads; it can
                # never win the argmax — see module docstring); the
                # oracle simply stops storing
                break
            js = base + r + ks
            s = s_row(y, js)
            H = np.zeros(W, dtype=np.int64)
            chain = np.int64(X - y * g) if (base + r == 1) else np.int64(0)
            left = chain if chain > 0 else np.int64(0)
            for k in range(W):
                diag = prev[k] + s[k] if prev[k] > 0 else 0
                up = (
                    prev[k + 1] - g
                    if (k + 1 < W and prev[k + 1] > 0)
                    else 0
                )
                lf = left - g if left > 0 else 0
                v = max(diag, up, lf, 0)
                if js[k] == 0:
                    v = max(X - y * g, 0)
                H[k] = v
                left = v
            hist[y - 1] = H
            row_base[y - 1] = base + r
            n_rows = y
            # row-major first-max tracking (strict >)
            rm = int(H.max()) if W else 0
            if rm > max_score:
                max_score = rm
                max_y = y
                max_j = int(base + r + int(np.argmax(H == rm)))
            prev = H
        # block end: X-drop + re-center on the carried row
        carried_last = prev
        carried_last = np.where(carried_last < max_score - X, 0, carried_last)
        if n_rows >= 1:
            hist[n_rows - 1] = carried_last  # zeroing is part of history
        if not carried_last.any() or n_rows >= n:
            done = True
            deltas[b] = 0
            carried = carried_last
            continue
        km = int(np.argmax(carried_last))
        delta = int(np.clip(km - W // 2, -D, D))
        deltas[b] = delta
        new_base = base + K + delta
        # realign: carried[k] = carried_last[k + delta]
        src = ks + delta
        carried = np.where(
            (src >= 0) & (src < W), carried_last[np.clip(src, 0, W - 1)], 0
        )
        base = new_base

    score = max_score - X

    path = walk_block_history(
        hist[:n_rows],
        row_base[:n_rows],
        (max_y, max_j),
        q,
        t,
        match=match,
        mismatch=mismatch,
        gap=g,
        x_threshold=X,
        matrix=mat,
    )

    if return_state:
        return BandedBlockResult(
            score=score,
            path=path,
            end=(max_y, max_j),
            band_history=hist[:n_rows],
            row_base=row_base[:n_rows],
            n_rows=n_rows,
            bases=bases[: b + 1] if n_blocks else bases[:0],
            deltas=deltas[: b + 1] if n_blocks else deltas[:0],
        )
    return score, path
