"""Length-bucketing streaming engine for variable-length pair batches.

The reference operates on fixed 128-mers; a production engine sees mixed
lengths. Under jit every distinct (n, m) shape is a separate compile, so
pairs are grouped into geometric buckets (each dimension rounded up to the
next bucket edge), each bucket runs as one padded batch through the chosen
engine, and results scatter back to input order. Pad chars carry the usual
guarantee (pads only lose), so bucket padding never changes a score.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import numpy as np

from swtpu.core.scoring import ScoringParams

Q_PAD = 4
T_PAD = 5


def bucket_edges(max_len: int, min_edge: int = 32, factor: float = 1.5):
    """Geometric bucket edges up to max_len."""
    edges = [min_edge]
    while edges[-1] < max_len:
        edges.append(
            min(int(np.ceil(edges[-1] * factor)), max_len)
        )
    return edges


def _edge_for(L: int, edges: Sequence[int]) -> int:
    for e in edges:
        if L <= e:
            return e
    return edges[-1]


def sw_scores_bucketed(
    pairs: Sequence,
    params: ScoringParams,
    engine: Optional[Callable] = None,
    min_edge: int = 32,
    factor: float = 1.5,
) -> np.ndarray:
    """Scores for a list of (q, t) variable-length pairs.

    pairs: sequence of (q: [n_i] uint8, t: [m_i] uint8). Returns [len(pairs)]
    int32 scores in input order. Compiles one kernel per occupied bucket.
    """
    if engine is None:
        from swtpu.ops.variants import best_engine

        engine = best_engine(params)

    n_max = max(len(q) for q, _ in pairs)
    m_max = max(len(t) for _, t in pairs)
    eq = bucket_edges(n_max, min_edge, factor)
    et = bucket_edges(m_max, min_edge, factor)

    buckets = {}
    for idx, (q, t) in enumerate(pairs):
        key = (_edge_for(len(q), eq), _edge_for(len(t), et))
        buckets.setdefault(key, []).append(idx)

    out = np.zeros(len(pairs), np.int32)
    for (bn, bm), idxs in sorted(buckets.items()):
        qs = np.full((len(idxs), bn), Q_PAD, np.uint8)
        ts = np.full((len(idxs), bm), T_PAD, np.uint8)
        for row, idx in enumerate(idxs):
            q, t = pairs[idx]
            qs[row, : len(q)] = q
            ts[row, : len(t)] = t
        scores = np.asarray(engine(qs, ts))
        out[np.asarray(idxs)] = scores
    return out
