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

    affine = not params.is_linear
    ends = None
    if engine is None:
        from swtpu.ops.variants import best_ends_engine

        engine = best_ends_engine(params)
        scores, ei, ej = (np.asarray(x) for x in engine(qs, ts))
        ends = (ei, ej)
    else:
        scores = np.asarray(engine(qs, ts))
    use_native = native.available()
    if affine:
        from swtpu.oracle.affine import sw_affine_traceback

        if use_native:
            walker = lambda q, t: native.sw_affine_traceback(
                q, t, params.matrix, params.gap_open, params.gap_extend
            )
        else:
            walker = lambda q, t: sw_affine_traceback(q, t, params)
    elif use_native:
        walker = lambda q, t: native.sw_traceback(
            q, t, params.matrix, params.gap
        )
    else:
        walker = lambda q, t: sw_traceback(q, t, params)
    out = []
    for b in range(qs.shape[0]):
        if ends is not None:
            # endpoint-bounded walk (the reference's device-forward/
            # host-walk split, source.cpp:1526-1576 / 2130-2162): the
            # device argmax (ei, ej) is the row-major-first max, so the
            # DP over the [0..ei, 0..ej] prefix has its own row-major-
            # first argmax AT (ei, ej) and an identical path — the walker
            # recomputes only ei*ej cells instead of n*m.
            bi, bj = int(ends[0][b]), int(ends[1][b])
            sc, path = walker(qs[b][:bi], ts[b][:bj])
            assert path[-1] == (bi, bj) or sc == 0, (
                f"device/host endpoint mismatch at pair {b}: "
                f"({bi},{bj}) vs {path[-1]}"
            )
        else:
            sc, path = walker(qs[b], ts[b])
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
    gap_open: Optional[int] = None,
    gap_extend: Optional[int] = None,
    params: Optional[ScoringParams] = None,
    lens_q: Optional[Sequence[int]] = None,
    lens_t: Optional[Sequence[int]] = None,
    pin_end: bool = False,
) -> List[Tuple[int, List[Tuple[int, int]]]]:
    """Batched semi-global alignment with traceback (full matrix),
    linear or affine (gap_open != gap_extend) gaps.

    Device computes scores + endpoints; host walks each path. Passing
    ``params`` selects the general-substitution-matrix mode (DNA 4x4 or
    protein/BLOSUM62; match/mismatch/gap args are then ignored).
    ``lens_q`` / ``lens_t`` give per-pair real lengths (varlen batches:
    the XLA engine masks each pair's argmax to its real region; the
    fixed-shape Pallas fast path applies only to uniform-length batches).
    ``pin_end`` pins every endpoint at each pair's (lq, lt) corner —
    GLOBAL (Needleman-Wunsch) alignment; see nw_align_batch.
    """
    import jax

    from swtpu import native
    from swtpu.kernels.xla.semiglobal_scan import semiglobal_batch_diag
    from swtpu.oracle.semiglobal import semiglobal_affine_full, semiglobal_full

    if params is not None:
        return _semiglobal_align_batch_general(
            qs, ts, params, lens_q=lens_q, lens_t=lens_t, pin_end=pin_end
        )
    if gap_open is not None and gap_open == gap_extend:
        gap, gap_open, gap_extend = gap_open, None, None
    affine = gap_open is not None
    B, n = qs.shape
    m = ts.shape[1]
    varlen = lens_q is not None or lens_t is not None
    lq = np.full(B, n) if lens_q is None else np.asarray(lens_q)
    lt = np.full(B, m) if lens_t is None else np.asarray(lens_t)
    from swtpu.kernels.pallas.semiglobal_batch import (
        CHUNK as SG_CHUNK,
        ROWS as SG_ROWS,
        semiglobal_batch_pallas,
    )

    # (no batch-size gate: the Pallas wrapper self-pads B to its tile;
    # pinned-end/global mode rides the XLA engine — the Pallas kernel
    # tracks the argmax, not the corner)
    use_pallas = (
        not varlen
        and not pin_end
        and jax.devices()[0].platform == "tpu"
        and n % SG_ROWS == 0
        and m % SG_CHUNK == 0
    )
    if use_pallas:
        fwd = semiglobal_batch_pallas(
            qs, ts, match, mismatch, gap,
            gap_open=gap_open, gap_extend=gap_extend,
        )
    elif affine:
        fwd = semiglobal_batch_diag(
            qs, ts, match, mismatch, gap_open=gap_open,
            gap_extend=gap_extend, lens_q=lq, lens_t=lt, pin_end=pin_end,
        )
    else:
        fwd = semiglobal_batch_diag(
            qs, ts, match, mismatch, gap, lens_q=lq, lens_t=lt,
            pin_end=pin_end,
        )
    score, ei, ej = (np.asarray(x) for x in fwd)
    end_of = (lambda q, t: (len(q), len(t))) if pin_end else (
        lambda q, t: None
    )
    if affine:
        walker = lambda q, t: semiglobal_affine_full(
            q, t, match, mismatch, gap_open, gap_extend,
            endpoint=end_of(q, t),
        )
    elif native.available():
        walker = lambda q, t: native.semiglobal_traceback(
            q, t, match, mismatch, gap, pin_end=pin_end
        )
    else:
        walker = lambda q, t: semiglobal_full(
            q, t, match, mismatch, gap, endpoint=end_of(q, t)
        )
    out = []
    for b in range(qs.shape[0]):
        sc, path = walker(qs[b, : lq[b]], ts[b, : lt[b]])
        assert sc == score[b] and path[-1] == (ei[b], ej[b])
        out.append((sc, path))
    return out


def nw_align_batch(
    qs: np.ndarray,
    ts: np.ndarray,
    match: int = 1,
    mismatch: int = 1,
    gap: int = 1,
    gap_open: Optional[int] = None,
    gap_extend: Optional[int] = None,
    params: Optional[ScoringParams] = None,
    lens_q: Optional[Sequence[int]] = None,
    lens_t: Optional[Sequence[int]] = None,
) -> List[Tuple[int, List[Tuple[int, int]]]]:
    """Batched GLOBAL (Needleman-Wunsch) alignment with traceback.

    Extension beyond the reference (which stops at semi-global,
    source.cpp:1776-1834): the semi-global forward pass is already
    origin-anchored with penalized boundary gap chains, so global
    alignment is the same device scan + host walk with the endpoint
    pinned at each pair's (lq, lt) corner instead of the argmax. Same
    argument surface as semiglobal_align_batch; matches oracle nw_full /
    nw_affine_full (tie-breaks included)."""
    return semiglobal_align_batch(
        qs, ts, match, mismatch, gap, gap_open=gap_open,
        gap_extend=gap_extend, params=params, lens_q=lens_q,
        lens_t=lens_t, pin_end=True,
    )


def _semiglobal_align_batch_general(
    qs: np.ndarray,
    ts: np.ndarray,
    params: ScoringParams,
    lens_q: Optional[Sequence[int]] = None,
    lens_t: Optional[Sequence[int]] = None,
    pin_end: bool = False,
) -> List[Tuple[int, List[Tuple[int, int]]]]:
    """General-matrix semi-global with traceback: device forward (Pallas
    packed-profile kernel on TPU when the tile shape allows, else the XLA
    table engine), matrix-scored host walk (C++ twin preferred)."""
    import jax

    from swtpu import native
    from swtpu.kernels.xla.semiglobal_scan import semiglobal_batch_general
    from swtpu.oracle.semiglobal import semiglobal_affine_full, semiglobal_full

    B, n = qs.shape
    m = ts.shape[1]
    varlen = lens_q is not None or lens_t is not None
    lq = np.full(B, n) if lens_q is None else np.asarray(lens_q)
    lt = np.full(B, m) if lens_t is None else np.asarray(lens_t)
    planes = -(-(params.alphabet_size + 2) // 4)
    if (
        not varlen
        and not pin_end  # global mode reads the corner: XLA engine only
        and jax.devices()[0].platform == "tpu"
        and n % 8 == 0 and m % 16 == 0
        # the Pallas kernel keeps the whole packed profile + two m-sized
        # boundary buffers VMEM-resident and packs scores into int8 —
        # outside these bounds the XLA table engine handles it
        and n * planes <= 896 and m <= 512
        and params.matrix.min() >= -127 and params.matrix.max() <= 127
        and (params.is_linear and params.gap > 0
             or not params.is_linear and params.gap_extend > 0)
    ):
        from swtpu.kernels.pallas.semiglobal_profile import (
            semiglobal_batch_profile_pallas,
        )

        fwd = semiglobal_batch_profile_pallas(qs, ts, params)
    else:
        fwd = semiglobal_batch_general(
            qs, ts, params, lens_q=lq, lens_t=lt, pin_end=pin_end
        )
    score, ei, ej = (np.asarray(x) for x in fwd)
    use_native = native.available()
    end_of = (lambda q, t: (len(q), len(t))) if pin_end else (
        lambda q, t: None
    )
    if params.is_linear:
        if use_native:
            walker = lambda q, t: native.semiglobal_traceback_matrix(
                q, t, params.matrix, params.gap, pin_end=pin_end
            )
        else:
            walker = lambda q, t: semiglobal_full(
                q, t, gap=params.gap, matrix=params.matrix,
                endpoint=end_of(q, t),
            )
    elif use_native:
        walker = lambda q, t: native.semiglobal_affine_traceback(
            q, t, params.matrix, params.gap_open, params.gap_extend,
            pin_end=pin_end,
        )
    else:
        walker = lambda q, t: semiglobal_affine_full(
            q,
            t,
            gap_open=params.gap_open,
            gap_extend=params.gap_extend,
            matrix=params.matrix,
            endpoint=end_of(q, t),
        )
    out = []
    for b in range(qs.shape[0]):
        sc, path = walker(qs[b, : lq[b]], ts[b, : lt[b]])
        assert sc == score[b] and path[-1] == (ei[b], ej[b]), (
            f"device/host semiglobal mismatch at pair {b}: "
            f"{score[b]}@({ei[b]},{ej[b]}) vs {sc}@{path[-1]}"
        )
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
    matrix: Optional[np.ndarray] = None,
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
        # mirror the C++ twin's guard (swnative.cpp): inconsistent device
        # history must fail loudly, not hang the walker
        if my > n + W:
            raise AssertionError(
                "banded_traceback: max cell not found in band history "
                f"(round {max_round}, expected {max_score_off})")

    mat = None if matrix is None else np.asarray(matrix)

    def sub(i: int, j: int) -> int:
        if mat is not None:
            return int(mat[q[i - 1], t[j - 1]])
        return match if q[i - 1] == t[j - 1] else -mismatch

    path = [(my, mx)]
    i, j = my, mx
    while i or j:
        v = get(i, j)
        if i and j and v == get(i - 1, j - 1) + sub(i, j):
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


def banded_static_align_batch(
    qs: np.ndarray,
    ts: np.ndarray,
    params,
    bandwidth: int = 32,
) -> List[Tuple[int, List[Tuple[int, int]]]]:
    """Batched fixed-band alignment with traceback (|i - j| <= W).

    Device computes the scores (issue-bound fixed-band kernel on TPU);
    the host recomputes the corridor per pair to walk the path (C++ when
    available). Output bit-equal to
    swtpu.oracle.banded_static.sw_banded_static_traceback.
    """
    import jax

    from swtpu import native
    from swtpu.oracle.banded_static import (
        sw_banded_static_score_batch,
        sw_banded_static_traceback,
    )

    if jax.devices()[0].platform == "tpu":
        from swtpu.kernels.pallas.sw_batch import _uniform_match_mismatch
        from swtpu.kernels.pallas.sw_banded import (
            sw_banded_profile_pallas,
            sw_banded_static_pallas,
        )

        fwd = (
            sw_banded_static_pallas
            if _uniform_match_mismatch(params) is not None
            else sw_banded_profile_pallas
        )
        scores = np.asarray(fwd(qs, ts, params, bandwidth))
    else:
        scores = sw_banded_static_score_batch(qs, ts, params, bandwidth)
    if native.available():
        walker = lambda q, t: native.banded_static_traceback(
            q, t, params.matrix, params.gap_open, params.gap_extend,
            bandwidth,
        )
    else:
        walker = lambda q, t: sw_banded_static_traceback(
            q, t, params, bandwidth
        )
    out = []
    for b in range(qs.shape[0]):
        sc, path = walker(qs[b], ts[b])
        assert sc == scores[b], (
            f"device/host score mismatch at pair {b}: {scores[b]} vs {sc}"
        )
        out.append((sc, path))
    return out


def reconstruct_affine_bands(
    band_history: np.ndarray,
    pos_y: np.ndarray,
    n_rounds: int,
    gap_open: int,
    gap_extend: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Rebuild the Gotoh E/F band histories from the H band history.

    The E/F recurrences (oracle/banded_affine.py) depend only on the H
    band, the previous E/F bands, and the per-round direction — never on
    the substitution score — and the direction is recoverable from pos_y
    (a round moved down iff pos_y advanced). So the device kernels return
    the same H-only history as the linear family and the host replays E/F
    exactly, round by round: e[r]/f[r] here are bit-equal to the oracle's
    e_hist/f_hist (tested).
    """
    from swtpu.oracle.banded_affine import EF_DEAD

    MINF = MINUS_INF
    W = band_history.shape[1]
    go, ge = int(gap_open), int(gap_extend)
    e_hist = np.full((n_rounds, W), EF_DEAD, dtype=np.int64)
    f_hist = np.full((n_rounds, W), EF_DEAD, dtype=np.int64)
    result = band_history[0].astype(np.int64)
    e_band = np.full(W, EF_DEAD, dtype=np.int64)
    f_band = np.full(W, EF_DEAD, dtype=np.int64)
    for r in range(1, n_rounds):
        if pos_y[r] == pos_y[r - 1]:  # moved right
            horizontal = result
            he = e_band
            vf = np.concatenate([f_band[1:], [EF_DEAD]])
            vertical = np.concatenate([result[1:], [0]])
        else:  # moved down
            vertical = result
            vf = f_band
            he = np.concatenate([[EF_DEAD], e_band[:-1]])
            horizontal = np.concatenate([[0], result[:-1]])
        e_new = np.maximum(
            np.where(he > EF_DEAD // 2, he - ge, MINF),
            np.where(horizontal != 0, horizontal - go, MINF),
        )
        f_new = np.maximum(
            np.where(vf > EF_DEAD // 2, vf - ge, MINF),
            np.where(vertical != 0, vertical - go, MINF),
        )
        result = band_history[r].astype(np.int64)
        e_band = np.where(result == 0, EF_DEAD, e_new)
        f_band = np.where(result == 0, EF_DEAD, f_new)
        e_hist[r] = e_band
        f_hist[r] = f_band
    return e_hist, f_hist


def banded_affine_traceback(
    q: np.ndarray,
    t: np.ndarray,
    band_history: np.ndarray,
    pos_y: np.ndarray,
    n_rounds: int,
    max_round: int,
    max_score_off: int,
    match: int,
    mismatch: int,
    gap_open: int,
    gap_extend: int,
    bandwidth: int = 32,
    matrix: Optional[np.ndarray] = None,
) -> List[Tuple[int, int]]:
    """Gotoh three-state walk over a device band history (affine gaps).

    E/F bands are reconstructed from the H history (see
    reconstruct_affine_bands); the walk itself mirrors the affine oracle:
    H-state move preference diag → F (up) → E (left), matching the linear
    family's diag → up → left order.
    """
    n, m = len(q), len(t)
    W = bandwidth
    e_hist, f_hist = reconstruct_affine_bands(
        band_history, pos_y, n_rounds, gap_open, gap_extend
    )

    def get(arr, y: int, x: int, dead_zero: bool) -> int:
        if y < 0 or y > n or x < 0 or x > m:
            return MINUS_INF
        r = y + x
        if r >= n_rounds:
            return MINUS_INF
        k = (W - 1) - (y - pos_y[r])
        if k < 0 or k >= W:
            return MINUS_INF
        v = int(arr[r, k])
        return MINUS_INF if (dead_zero and v == 0) else v

    get_h = lambda y, x: get(band_history, y, x, True)
    get_e = lambda y, x: get(e_hist, y, x, False)
    get_f = lambda y, x: get(f_hist, y, x, False)

    my = int(pos_y[max_round])
    mx = int(max_round - my)
    while get_h(my, mx) != max_score_off:
        my += 1
        mx -= 1
        if my > n + W:
            raise AssertionError(
                "banded_affine_traceback: max cell not found in band history "
                f"(round {max_round}, expected {max_score_off})")

    mat = None if matrix is None else np.asarray(matrix)
    path = [(my, mx)]
    i, j, st = my, mx, 0
    while i or j:
        if st == 0:
            v = get_h(i, j)
            if not (i and j):
                s = MINUS_INF
            elif mat is not None:
                s = int(mat[q[i - 1], t[j - 1]])
            else:
                s = match if q[i - 1] == t[j - 1] else -mismatch
            if i and j and v == get_h(i - 1, j - 1) + s:
                i, j = i - 1, j - 1
                path.append((i, j))
            elif v == get_f(i, j):
                st = 2
            elif v == get_e(i, j):
                st = 1
            else:  # pragma: no cover
                raise AssertionError("inconsistent affine banded traceback H")
        elif st == 1:  # E: gap moves left
            v = get_e(i, j)
            if j and v == get_h(i, j - 1) - gap_open:
                j -= 1
                st = 0
            elif j and v == get_e(i, j - 1) - gap_extend:
                j -= 1
            else:  # pragma: no cover
                raise AssertionError("inconsistent affine banded traceback E")
            path.append((i, j))
        else:  # F: gap moves up
            v = get_f(i, j)
            if i and v == get_h(i - 1, j) - gap_open:
                i -= 1
                st = 0
            elif i and v == get_f(i - 1, j) - gap_extend:
                i -= 1
            else:  # pragma: no cover
                raise AssertionError("inconsistent affine banded traceback F")
            path.append((i, j))
    path.reverse()
    return path


def banded_forward_batch(
    qs: np.ndarray,
    ts: np.ndarray,
    lens_q: Optional[Sequence[int]] = None,
    lens_t: Optional[Sequence[int]] = None,
    match: int = 1,
    mismatch: int = 1,
    gap: int = 1,
    bandwidth: int = 32,
    x_threshold: int = 70,
    compress_history: Optional[bool] = None,
    gap_open: Optional[int] = None,
    gap_extend: Optional[int] = None,
    matrix: Optional[np.ndarray] = None,
):
    """Adaptive-banded X-drop forward pass on the best engine for this
    backend/geometry, history included (the device half of
    banded_align_batch). Returns a BandedBatchResult (host arrays).

    ``compress_history=None`` (default) auto-selects the reference's
    8-bit offset-rebias wire format (source.cpp:2105-2119) whenever the
    int32 history would exceed ~8 MB and x_threshold fits in a byte —
    at 16K-mer geometry this cuts the device->host fetch 4x.
    """
    import jax

    from swtpu.kernels.xla.banded_scan import banded_xdrop_batch

    if gap_open is not None and gap_open == gap_extend:
        gap, gap_open, gap_extend = gap_open, None, None  # exactly linear
    on_tpu = jax.devices()[0].platform == "tpu"
    # the Pallas banded kernels keep the whole band history VMEM-resident
    # (~2.3 KB/round/grid-step measured): ~4K rounds (2048-mers) fits,
    # 16K-mers (32769 rounds, 74 MB) does not — reference-scale geometry
    # rides the XLA forward, whose history streams to HBM
    if qs.shape[1] + ts.shape[1] + 1 > 6000:
        on_tpu = False
    if compress_history is None:
        R_cap = (max(qs.shape[1], ts.shape[1]) + 1) * 2 - 1
        compress_history = (
            x_threshold <= 254
            and R_cap * qs.shape[0] * bandwidth * 4 > 8 * 2**20
        )
    kw = {}
    if matrix is not None:
        # general matrices: same Pallas tiering as uniform scoring (the
        # baked-table lookup rides both kernels), XLA table engine off-TPU
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
        kw["matrix"] = matrix
    elif on_tpu and bandwidth in (32, 64):
        from swtpu.kernels.pallas.banded_packed import (
            banded_xdrop_batch_packed as forward,
        )
    elif on_tpu and bandwidth <= 96:
        from swtpu.kernels.pallas.banded_batch import (
            banded_xdrop_batch_pallas as forward,
        )
    else:
        forward = banded_xdrop_batch
    return forward(
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
        gap_open=gap_open,
        gap_extend=gap_extend,
        **kw,
    )


def banded_walk_batch(
    qs: np.ndarray,
    ts: np.ndarray,
    res,
    lens_q: Optional[Sequence[int]] = None,
    lens_t: Optional[Sequence[int]] = None,
    match: int = 1,
    mismatch: int = 1,
    gap: int = 1,
    bandwidth: int = 32,
    x_threshold: int = 70,
    gap_open: Optional[int] = None,
    gap_extend: Optional[int] = None,
    matrix: Optional[np.ndarray] = None,
) -> List[Tuple[int, List[Tuple[int, int]]]]:
    """Host half of banded_align_batch: walk every pair's path from a
    fetched BandedBatchResult (the device forward's history)."""
    from swtpu import native

    if gap_open is not None and gap_open == gap_extend:
        gap, gap_open, gap_extend = gap_open, None, None
    affine = gap_open is not None
    B = qs.shape[0]
    lens_q = [qs.shape[1]] * B if lens_q is None else list(lens_q)
    lens_t = [ts.shape[1]] * B if lens_t is None else list(lens_t)
    if affine:
        aff_walker = (
            native.banded_affine_traceback
            if native.available()
            else banded_affine_traceback
        )
        walker = lambda q, t, *a: aff_walker(
            q, t, *a[:5], match, mismatch, gap_open, gap_extend, bandwidth,
            matrix=matrix,
        )
    elif native.available():
        walker = lambda q, t, *a: native.banded_traceback(
            q, t, *a, match, mismatch, gap, bandwidth, matrix=matrix
        )
    else:
        walker = lambda q, t, *a: banded_traceback(
            q, t, *a, match, mismatch, gap, bandwidth, matrix=matrix
        )
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
        )
        out.append((int(res.score[b]), path))
    return out


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
    compress_history: Optional[bool] = None,
    gap_open: Optional[int] = None,
    gap_extend: Optional[int] = None,
    matrix: Optional[np.ndarray] = None,
) -> List[Tuple[int, List[Tuple[int, int]]]]:
    """Batched adaptive-banded X-drop alignment with traceback.

    Device forward pass (band history on device, one anti-diagonal per
    round), host walks paths from the history. Output per pair is
    bit-identical to swtpu.oracle.banded_xdrop (linear gaps) /
    swtpu.oracle.banded_affine.banded_affine_xdrop (gap_open != gap_extend).
    ``matrix`` selects the general-substitution-matrix / protein mode
    (match/mismatch ignored; forward pass on the Pallas baked-table
    kernels on TPU, the XLA table engine elsewhere). Composition of
    banded_forward_batch (device) + banded_walk_batch (host).
    """
    import jax

    if gap_open is not None and gap_open == gap_extend:
        gap, gap_open, gap_extend = gap_open, None, None
    # reference-scale geometry, linear gaps: walk ON DEVICE — the
    # device->host link runs ~25 MB/s, so fetching a 16K-geometry band
    # history costs ~4x the whole forward; the device walker ships only
    # move strings (see banded_scan._banded_fwd_walk_impl). Affine keeps
    # the host walk (E/F reconstruction lives there).
    if (
        gap_open is None
        and qs.shape[1] + ts.shape[1] + 1 > 6000
        and jax.devices()[0].platform == "tpu"
    ):
        from swtpu.kernels.xla.banded_scan import banded_xdrop_align_device

        return banded_xdrop_align_device(
            qs, ts, lens_q, lens_t, match, mismatch, gap, bandwidth,
            x_threshold, matrix=matrix,
        )
    res = banded_forward_batch(
        qs, ts, lens_q, lens_t, match, mismatch, gap, bandwidth,
        x_threshold, compress_history=compress_history, gap_open=gap_open,
        gap_extend=gap_extend, matrix=matrix,
    )
    return banded_walk_batch(
        qs, ts, res, lens_q, lens_t, match, mismatch, gap, bandwidth,
        x_threshold, gap_open=gap_open, gap_extend=gap_extend,
        matrix=matrix,
    )
