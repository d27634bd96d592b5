"""Alignment-with-traceback engines: device forward pass + host traceback.

The reference's split for its banded family (source.cpp:1978-2162): the
vectorized forward pass fills a band history; a scalar pass walks it
backwards. Here: the TPU computes scores / endpoints / band history in
batch; the host walks paths (numpy now, C++ walker in swtpu.native for the
hot path). All tie-breaks mirror the reference: diag → up → left
(source.cpp:1558-1567, 2149-2158), argmax = first maximum in row-major
scan order.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from swtpu.core.scoring import ScoringParams
from swtpu.oracle.semiglobal import MINUS_INF


def sw_align_batch(
    qs: np.ndarray,
    ts: np.ndarray,
    params: ScoringParams,
    engine=None,
) -> List[Tuple[int, List[Tuple[int, int]]]]:
    """Batched local alignment with traceback.

    Device computes all scores; the host recomputes the DP per pair to walk
    the path (≙ SmithWaterman_111_long semantics, source.cpp:1526-1576).
    Returns [(score, path)] per pair.
    """
    from swtpu import native
    from swtpu.oracle.sw import sw_traceback

    if engine is None:
        from swtpu.kernels.xla import sw_batch_diag

        engine = lambda q, t: sw_batch_diag(q, t, params)
    scores = np.asarray(engine(qs, ts))
    use_native = native.available()
    out = []
    for b in range(qs.shape[0]):
        if use_native:
            sc, path = native.sw_traceback(
                qs[b], ts[b], params.matrix, params.gap
            )
        else:
            sc, path = sw_traceback(qs[b], ts[b], params)
        assert sc == scores[b], (
            f"device/host score mismatch at pair {b}: {scores[b]} vs {sc}"
        )
        out.append((sc, path))
    return out


def semiglobal_align_batch(
    qs: np.ndarray,
    ts: np.ndarray,
    match: int = 1,
    mismatch: int = 1,
    gap: int = 1,
) -> List[Tuple[int, List[Tuple[int, int]]]]:
    """Batched semi-global alignment with traceback (full matrix).

    Device computes scores + endpoints; host walks each path.
    """
    import jax

    from swtpu import native
    from swtpu.kernels.xla.semiglobal_scan import semiglobal_batch_diag
    from swtpu.oracle.semiglobal import semiglobal_full

    B, n = qs.shape
    m = ts.shape[1]
    from swtpu.kernels.pallas.semiglobal_batch import (
        CHUNK as SG_CHUNK,
        ROWS as SG_ROWS,
        TILE_PAIRS as SG_TILE,
        semiglobal_batch_pallas,
    )

    use_pallas = (
        jax.devices()[0].platform == "tpu"
        and B % SG_TILE == 0
        and n % SG_ROWS == 0
        and m % SG_CHUNK == 0
    )
    if use_pallas:

        fwd = semiglobal_batch_pallas(qs, ts, match, mismatch, gap)
    else:
        fwd = semiglobal_batch_diag(qs, ts, match, mismatch, gap)
    score, ei, ej = (np.asarray(x) for x in fwd)
    walker = (
        (lambda q, t: native.semiglobal_traceback(q, t, match, mismatch, gap))
        if native.available()
        else (lambda q, t: semiglobal_full(q, t, match, mismatch, gap))
    )
    out = []
    for b in range(qs.shape[0]):
        sc, path = walker(qs[b], ts[b])
        assert sc == score[b] and path[-1] == (ei[b], ej[b])
        out.append((sc, path))
    return out


def banded_traceback(
    q: np.ndarray,
    t: np.ndarray,
    band_history: np.ndarray,
    pos_y: np.ndarray,
    n_rounds: int,
    max_round: int,
    max_score_off: int,
    match: int = 1,
    mismatch: int = 1,
    gap: int = 1,
    bandwidth: int = 32,
) -> List[Tuple[int, int]]:
    """Walk one alignment's path from its band history.

    Mirrors the reference's traceback over the stored band
    (source.cpp:1944-1973): Get(y, x) reconstructs a cell from
    (band_history, pos_y); dead/out-of-band cells read as -inf; the start
    cell is the top-right-most cell of the best round holding the max;
    moves tie-break diag → up → left. ``max_score_off`` is the
    offset-inclusive max (score + x_threshold).
    """
    n, m = len(q), len(t)
    W = bandwidth

    def get(y: int, x: int) -> int:
        if y < 0 or y > n or x < 0 or x > m:
            return MINUS_INF
        r = y + x
        if r >= n_rounds:
            return MINUS_INF
        k = (W - 1) - (y - pos_y[r])
        if k < 0 or k >= W:
            return MINUS_INF
        v = band_history[r, k]
        return MINUS_INF if v == 0 else int(v)

    my = int(pos_y[max_round])
    mx = int(max_round - my)  # unpadded x: y + x == round
    while get(my, mx) != max_score_off:
        my += 1
        mx -= 1

    path = [(my, mx)]
    i, j = my, mx
    while i or j:
        v = get(i, j)
        if (
            i
            and j
            and v == get(i - 1, j - 1) + (match if q[i - 1] == t[j - 1] else -mismatch)
        ):
            i, j = i - 1, j - 1
        elif i and v == get(i - 1, j) - gap:
            i -= 1
        elif j and v == get(i, j - 1) - gap:
            j -= 1
        else:  # pragma: no cover
            raise AssertionError("inconsistent banded traceback")
        path.append((i, j))
    path.reverse()
    return path


def banded_align_batch(
    qs: np.ndarray,
    ts: np.ndarray,
    lens_q: Optional[Sequence[int]] = None,
    lens_t: Optional[Sequence[int]] = None,
    match: int = 1,
    mismatch: int = 1,
    gap: int = 1,
    bandwidth: int = 32,
    x_threshold: int = 70,
    compress_history: bool = False,
) -> List[Tuple[int, List[Tuple[int, int]]]]:
    """Batched adaptive-banded X-drop alignment with traceback.

    Device forward pass (band history on device, one anti-diagonal per
    round), host walks paths from the history. Output per pair is
    bit-identical to swtpu.oracle.banded_xdrop.
    """
    import jax

    from swtpu.kernels.xla.banded_scan import banded_xdrop_batch

    on_tpu = jax.devices()[0].platform == "tpu"
    if on_tpu and bandwidth in (32, 64):
        from swtpu.kernels.pallas.banded_packed import (
            banded_xdrop_batch_packed as forward,
        )
    elif on_tpu and bandwidth <= 96:
        from swtpu.kernels.pallas.banded_batch import (
            banded_xdrop_batch_pallas as forward,
        )
    else:
        forward = banded_xdrop_batch
    res = forward(
        qs,
        ts,
        lens_q,
        lens_t,
        match,
        mismatch,
        gap,
        bandwidth,
        x_threshold,
        compress_history=compress_history,
    )
    from swtpu import native

    B = qs.shape[0]
    lens_q = [qs.shape[1]] * B if lens_q is None else list(lens_q)
    lens_t = [ts.shape[1]] * B if lens_t is None else list(lens_t)
    walker = native.banded_traceback if native.available() else banded_traceback
    out = []
    for b in range(B):
        path = walker(
            qs[b, : lens_q[b]],
            ts[b, : lens_t[b]],
            res.history_for(b),
            res.pos_y[:, b],
            int(res.n_rounds[b]),
            int(res.max_round[b]),
            int(res.score[b]) + x_threshold,
            match,
            mismatch,
            gap,
            bandwidth,
        )
        out.append((int(res.score[b]), path))
    return out
