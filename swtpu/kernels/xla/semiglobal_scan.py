"""XLA batched semi-global alignment: scores + argmax endpoints.

Semantics ≙ ``SemiGlobal_111`` (source.cpp:1776-1834) generalized: no zero
floor, alignment anchored at the top-left corner, score/endpoint at the
matrix-wide maximum. The device pass returns (score, end_i, end_j); the
traceback walk itself is a host-side pass (see swtpu.batch.traceback) —
the same forward/traceback split the reference uses for its banded family
(SIMD forward, scalar traceback, source.cpp:2130-2162).

Anti-diagonal schedule over slot vectors indexed by DP row i (0..n):
diagonal d holds cells (i, d-i). Boundary cells (row 0 / col 0) are gap
chains written by masks each step; phantom slots start at -inf and can only
decay. Argmax endpoint reproduces the reference's exact tie-break (first
maximum in row-major scan order with strict '<' update, source.cpp:1804):
per-slot (i) we track the best value and its smallest j (strict-> update as
d ascends); the final cross-slot reduction prefers the smallest i on ties.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from swtpu.kernels.xla.sw_scan import _prof_scores

Q_PAD = 4
T_PAD = 5
_NEG = -(2**20)
MINUS_INF = -(2**30)


def _track_best(cur, best_v, best_j, iota, j_of, lq, lt, pin_end):
    """Per-step endpoint tracking. Default: masked argmax over each
    pair's real [0..lq] x [0..lt] region (varlen: real cells never read
    padded cells, so the padded DP is exact and only the tracking needs
    masking). With ``pin_end`` the "argmax" degenerates to reading the
    single (lq, lt) corner cell — GLOBAL (Needleman-Wunsch) alignment,
    which shares this origin-anchored forward pass (the reference's
    semi-global init, source.cpp:1789-1792) and differs only in where
    the score is read."""
    if pin_end:
        upd = (cur > best_v) & (iota == lq) & (j_of == lt)
    else:
        upd = (cur > best_v) & (iota <= lq) & (j_of <= lt) & (j_of >= 0)
    return jnp.where(upd, cur, best_v), jnp.where(upd, j_of, best_j)


def _best_init(iota, lq, lt, B, pin_end):
    """best_v at d=0: slot 0 holds H[0,0] = 0 — an eligible endpoint for
    the argmax always, but for a pinned end only when (lq, lt) == (0, 0)
    (the empty pair)."""
    cond = (iota == 0) & (lq == 0) & (lt == 0) if pin_end else iota == 0
    return jnp.where(cond, 0, MINUS_INF) * jnp.ones((B, 1), jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("match", "mismatch", "gap", "pin_end")
)
def _semiglobal_impl(qs, ts, lq, lt, match, mismatch, gap, pin_end=False):
    B, n = qs.shape
    m = ts.shape[1]
    qs = qs.astype(jnp.int32)
    ts = ts.astype(jnp.int32)

    q_slot = jnp.pad(qs, ((0, 0), (1, 0)), constant_values=Q_PAD)
    ts_rev_pad = jnp.pad(
        ts[:, ::-1], ((0, 0), (n + 1, n + 1)), constant_values=T_PAD
    )

    iota = jnp.arange(n + 1)[None, :]  # slot index == DP row i

    minus_inf = jnp.int32(MINUS_INF)

    def step(carry, d):
        prev1, prev2, best_v, best_j = carry
        off = m - d + n + 1
        t_diag = jax.lax.dynamic_slice_in_dim(ts_rev_pad, off, n + 1, axis=1)
        # mismatch is a penalty (positive), scored as -mismatch, matching
        # the oracle / reference (source.cpp:1801, 1919-1920)
        valid_chars = (q_slot < 4) & (t_diag < 4)
        s = jnp.where(
            valid_chars & (q_slot == t_diag), match, -mismatch
        ).astype(jnp.int32)
        shift1 = lambda x: jnp.pad(
            x, ((0, 0), (1, 0)), constant_values=MINUS_INF
        )[:, :-1]
        cur = jnp.maximum(
            jnp.maximum(shift1(prev2) + s, shift1(prev1) - gap),
            prev1 - gap,
        )
        # boundary gap chains: H[0, d] = H[d, 0] = -d*gap (while in range)
        cur = jnp.where(iota == 0, jnp.where(d <= m, -d * gap, minus_inf), cur)
        cur = jnp.where(iota == d, jnp.where(d <= n, -d * gap, cur), cur)
        # clamp phantoms (j < 0 or j > m) hard to -inf
        j_of = d - iota
        cur = jnp.where((j_of < 0) | (j_of > m), minus_inf, cur)
        best_v, best_j = _track_best(
            cur, best_v, best_j, iota, j_of, lq, lt, pin_end
        )
        return (cur, prev1, best_v, best_j), None

    prev_init = jnp.full((B, n + 1), MINUS_INF, jnp.int32)
    d0 = jnp.zeros((B, n + 1), jnp.int32)
    d0 = jnp.where(iota == 0, 0, MINUS_INF) * jnp.ones((B, 1), jnp.int32)
    best_v0 = _best_init(iota, lq, lt, B, pin_end)
    best_j0 = jnp.zeros((B, n + 1), jnp.int32)
    ds = jnp.arange(1, n + m + 1)
    (p1, p2, best_v, best_j), _ = jax.lax.scan(
        step, (d0, prev_init, best_v0, best_j0), ds
    )
    # cross-slot reduction: max value, ties -> smallest i (slot index)
    score = best_v.max(axis=1)
    is_max = best_v == score[:, None]
    big = jnp.int32(n + m + 2)
    slot_key = jnp.where(is_max, jnp.arange(n + 1)[None, :], big)
    end_i = slot_key.min(axis=1)
    end_j = jnp.take_along_axis(best_j, end_i[:, None], axis=1)[:, 0]
    return score, end_i, end_j


@functools.partial(
    jax.jit, static_argnames=("match", "mismatch", "go", "ge", "pin_end")
)
def _semiglobal_affine_impl(
    qs, ts, lq, lt, match, mismatch, go, ge, pin_end=False
):
    B, n = qs.shape
    m = ts.shape[1]
    qs = qs.astype(jnp.int32)
    ts = ts.astype(jnp.int32)

    q_slot = jnp.pad(qs, ((0, 0), (1, 0)), constant_values=Q_PAD)
    ts_rev_pad = jnp.pad(
        ts[:, ::-1], ((0, 0), (n + 1, n + 1)), constant_values=T_PAD
    )
    iota = jnp.arange(n + 1)[None, :]
    minus_inf = jnp.int32(MINUS_INF)

    def step(carry, d):
        h1, h2, e1, f1, best_v, best_j = carry
        off = m - d + n + 1
        t_diag = jax.lax.dynamic_slice_in_dim(ts_rev_pad, off, n + 1, axis=1)
        valid_chars = (q_slot < 4) & (t_diag < 4)
        s = jnp.where(
            valid_chars & (q_slot == t_diag), match, -mismatch
        ).astype(jnp.int32)
        shift1 = lambda x: jnp.pad(
            x, ((0, 0), (1, 0)), constant_values=MINUS_INF
        )[:, :-1]
        # Gotoh on anti-diagonals: E's predecessors (i, j-1) sit at the
        # same slot of d-1; F's (i-1, j) one slot down of d-1
        e_cur = jnp.maximum(e1 - ge, h1 - go)
        f_cur = jnp.maximum(shift1(f1) - ge, shift1(h1) - go)
        cur = jnp.maximum(shift1(h2) + s, jnp.maximum(e_cur, f_cur))
        # boundary gap chains: open + (d-1) extends
        bnd = -go - (d - 1) * ge
        cur = jnp.where(iota == 0, jnp.where(d <= m, bnd, minus_inf), cur)
        e_cur = jnp.where(iota == 0, jnp.where(d <= m, bnd, minus_inf), e_cur)
        cur = jnp.where(iota == d, jnp.where(d <= n, bnd, cur), cur)
        f_cur = jnp.where(iota == d, jnp.where(d <= n, bnd, f_cur), f_cur)
        j_of = d - iota
        phantom = (j_of < 0) | (j_of > m)
        cur = jnp.where(phantom, minus_inf, cur)
        e_cur = jnp.where(phantom, minus_inf, e_cur)
        f_cur = jnp.where(phantom, minus_inf, f_cur)
        best_v, best_j = _track_best(
            cur, best_v, best_j, iota, j_of, lq, lt, pin_end
        )
        return (cur, h1, e_cur, f_cur, best_v, best_j), None

    prev_init = jnp.full((B, n + 1), MINUS_INF, jnp.int32)
    d0 = jnp.where(iota == 0, 0, MINUS_INF) * jnp.ones((B, 1), jnp.int32)
    best_v0 = _best_init(iota, lq, lt, B, pin_end)
    best_j0 = jnp.zeros((B, n + 1), jnp.int32)
    ds = jnp.arange(1, n + m + 1)
    (h1, h2, e1, f1, best_v, best_j), _ = jax.lax.scan(
        step, (d0, prev_init, prev_init, prev_init, best_v0, best_j0), ds
    )
    score = best_v.max(axis=1)
    is_max = best_v == score[:, None]
    big = jnp.int32(n + m + 2)
    slot_key = jnp.where(is_max, jnp.arange(n + 1)[None, :], big)
    end_i = slot_key.min(axis=1)
    end_j = jnp.take_along_axis(best_j, end_i[:, None], axis=1)[:, 0]
    return score, end_i, end_j


@functools.partial(jax.jit, static_argnames=("gap", "n_codes", "pin_end"))
def _semiglobal_table_impl(
    qs, ts, lq, lt, table, gap, n_codes=8, pin_end=False
):
    """Linear-gap semi-global with a general substitution table (the
    general-matrix / protein mode; scoring via flat-table gather like
    sw_scan/colscan instead of the uniform match/mismatch compare)."""
    B, n = qs.shape
    m = ts.shape[1]
    stride = table.shape[0]
    q_pad, t_pad = stride - 2, stride - 1
    qs = jnp.minimum(qs.astype(jnp.int32), q_pad)
    ts = jnp.minimum(ts.astype(jnp.int32), t_pad)
    q_slot = jnp.pad(qs, ((0, 0), (1, 0)), constant_values=q_pad)
    prof = table[q_slot]  # [B, n+1, stride] per-slot profile
    ts_rev_pad = jnp.pad(
        ts[:, ::-1], ((0, 0), (n + 1, n + 1)), constant_values=t_pad
    )
    iota = jnp.arange(n + 1)[None, :]
    minus_inf = jnp.int32(MINUS_INF)

    def step(carry, d):
        prev1, prev2, best_v, best_j = carry
        off = m - d + n + 1
        t_diag = jax.lax.dynamic_slice_in_dim(ts_rev_pad, off, n + 1, axis=1)
        # pad chars hit the table's _NEG rows/cols; those cells are always
        # boundary-overwritten or phantom-clamped below, and
        # MINUS_INF + _NEG stays well inside int32
        s = _prof_scores(prof, t_diag, n_codes)
        shift1 = lambda x: jnp.pad(
            x, ((0, 0), (1, 0)), constant_values=MINUS_INF
        )[:, :-1]
        cur = jnp.maximum(
            jnp.maximum(shift1(prev2) + s, shift1(prev1) - gap),
            prev1 - gap,
        )
        cur = jnp.where(iota == 0, jnp.where(d <= m, -d * gap, minus_inf), cur)
        cur = jnp.where(iota == d, jnp.where(d <= n, -d * gap, cur), cur)
        j_of = d - iota
        cur = jnp.where((j_of < 0) | (j_of > m), minus_inf, cur)
        best_v, best_j = _track_best(
            cur, best_v, best_j, iota, j_of, lq, lt, pin_end
        )
        return (cur, prev1, best_v, best_j), None

    prev_init = jnp.full((B, n + 1), MINUS_INF, jnp.int32)
    d0 = jnp.where(iota == 0, 0, MINUS_INF) * jnp.ones((B, 1), jnp.int32)
    best_v0 = _best_init(iota, lq, lt, B, pin_end)
    best_j0 = jnp.zeros((B, n + 1), jnp.int32)
    ds = jnp.arange(1, n + m + 1)
    (p1, p2, best_v, best_j), _ = jax.lax.scan(
        step, (d0, prev_init, best_v0, best_j0), ds
    )
    score = best_v.max(axis=1)
    is_max = best_v == score[:, None]
    big = jnp.int32(n + m + 2)
    slot_key = jnp.where(is_max, jnp.arange(n + 1)[None, :], big)
    end_i = slot_key.min(axis=1)
    end_j = jnp.take_along_axis(best_j, end_i[:, None], axis=1)[:, 0]
    return score, end_i, end_j


@functools.partial(
    jax.jit, static_argnames=("go", "ge", "n_codes", "pin_end")
)
def _semiglobal_affine_table_impl(
    qs, ts, lq, lt, table, go, ge, n_codes=8, pin_end=False
):
    """Gotoh semi-global with a general substitution table."""
    B, n = qs.shape
    m = ts.shape[1]
    stride = table.shape[0]
    q_pad, t_pad = stride - 2, stride - 1
    qs = jnp.minimum(qs.astype(jnp.int32), q_pad)
    ts = jnp.minimum(ts.astype(jnp.int32), t_pad)
    q_slot = jnp.pad(qs, ((0, 0), (1, 0)), constant_values=q_pad)
    prof = table[q_slot]
    ts_rev_pad = jnp.pad(
        ts[:, ::-1], ((0, 0), (n + 1, n + 1)), constant_values=t_pad
    )
    iota = jnp.arange(n + 1)[None, :]
    minus_inf = jnp.int32(MINUS_INF)

    def step(carry, d):
        h1, h2, e1, f1, best_v, best_j = carry
        off = m - d + n + 1
        t_diag = jax.lax.dynamic_slice_in_dim(ts_rev_pad, off, n + 1, axis=1)
        s = _prof_scores(prof, t_diag, n_codes)
        shift1 = lambda x: jnp.pad(
            x, ((0, 0), (1, 0)), constant_values=MINUS_INF
        )[:, :-1]
        e_cur = jnp.maximum(e1 - ge, h1 - go)
        f_cur = jnp.maximum(shift1(f1) - ge, shift1(h1) - go)
        cur = jnp.maximum(shift1(h2) + s, jnp.maximum(e_cur, f_cur))
        bnd = -go - (d - 1) * ge
        cur = jnp.where(iota == 0, jnp.where(d <= m, bnd, minus_inf), cur)
        e_cur = jnp.where(iota == 0, jnp.where(d <= m, bnd, minus_inf), e_cur)
        cur = jnp.where(iota == d, jnp.where(d <= n, bnd, cur), cur)
        f_cur = jnp.where(iota == d, jnp.where(d <= n, bnd, f_cur), f_cur)
        j_of = d - iota
        phantom = (j_of < 0) | (j_of > m)
        cur = jnp.where(phantom, minus_inf, cur)
        e_cur = jnp.where(phantom, minus_inf, e_cur)
        f_cur = jnp.where(phantom, minus_inf, f_cur)
        best_v, best_j = _track_best(
            cur, best_v, best_j, iota, j_of, lq, lt, pin_end
        )
        return (cur, h1, e_cur, f_cur, best_v, best_j), None

    prev_init = jnp.full((B, n + 1), MINUS_INF, jnp.int32)
    d0 = jnp.where(iota == 0, 0, MINUS_INF) * jnp.ones((B, 1), jnp.int32)
    best_v0 = _best_init(iota, lq, lt, B, pin_end)
    best_j0 = jnp.zeros((B, n + 1), jnp.int32)
    ds = jnp.arange(1, n + m + 1)
    (h1, h2, e1, f1, best_v, best_j), _ = jax.lax.scan(
        step, (d0, prev_init, prev_init, prev_init, best_v0, best_j0), ds
    )
    score = best_v.max(axis=1)
    is_max = best_v == score[:, None]
    big = jnp.int32(n + m + 2)
    slot_key = jnp.where(is_max, jnp.arange(n + 1)[None, :], big)
    end_i = slot_key.min(axis=1)
    end_j = jnp.take_along_axis(best_j, end_i[:, None], axis=1)[:, 0]
    return score, end_i, end_j


def _lens_cols(qs, ts, lens_q, lens_t):
    """[B, 1] int32 per-pair real lengths (defaults: full widths).
    Shape-only on qs/ts, so traced arrays (callers wrapped in an outer
    jit, e.g. the salted timing chain) work too."""
    B, n = qs.shape
    m = ts.shape[1]
    lq = np.full(B, n) if lens_q is None else lens_q
    lt = np.full(B, m) if lens_t is None else lens_t
    return (
        jnp.asarray(lq, jnp.int32)[:, None],
        jnp.asarray(lt, jnp.int32)[:, None],
    )


def semiglobal_batch_general(
    qs, ts, params, lens_q=None, lens_t=None, pin_end=False
):
    """Batched semi-global scores + endpoints for a general substitution
    matrix (DNA 4x4 or protein/BLOSUM62), linear or affine gaps.

    Same contract as semiglobal_batch_diag but scoring comes from
    ``params.matrix`` (signed scores); matches the generalized oracles
    semiglobal_full / semiglobal_affine_full with ``matrix=``.
    """
    from swtpu.kernels.xla.sw_scan import _extended_table

    table = jnp.asarray(_extended_table(params))
    lq, lt = _lens_cols(qs, ts, lens_q, lens_t)
    n_codes = params.alphabet_size + 2
    if params.is_linear:
        return _semiglobal_table_impl(
            jnp.asarray(qs), jnp.asarray(ts), lq, lt, table,
            int(params.gap), n_codes=n_codes, pin_end=pin_end,
        )
    return _semiglobal_affine_table_impl(
        jnp.asarray(qs),
        jnp.asarray(ts),
        lq,
        lt,
        table,
        int(params.gap_open),
        int(params.gap_extend),
        n_codes=n_codes,
        pin_end=pin_end,
    )


def semiglobal_batch_diag(
    qs, ts, match=1, mismatch=1, gap=1, gap_open=None, gap_extend=None,
    lens_q=None, lens_t=None, pin_end=False,
):
    """Batched semi-global scores + argmax endpoints.

    qs: [B, n] uint8, ts: [B, m] uint8; per-pair real lengths via
    ``lens_q`` / ``lens_t`` (semi-global boundaries are length-dependent,
    so varlen rides a masked argmax over each pair's real region — the
    padded DP itself is exact because real cells never read padded
    cells). Returns (score, end_i, end_j) int32 arrays, matching
    swtpu.oracle.semiglobal_full's (linear) / semiglobal_affine_full's
    (gap_open != gap_extend) score and argmax cell (1-based DP coords)
    on each pair's unpadded lengths.
    """
    lq, lt = _lens_cols(qs, ts, lens_q, lens_t)
    if gap_open is not None and gap_open != gap_extend:
        return _semiglobal_affine_impl(
            jnp.asarray(qs), jnp.asarray(ts), lq, lt, int(match),
            int(mismatch), int(gap_open), int(gap_extend), pin_end=pin_end,
        )
    if gap_open is not None:
        gap = gap_open
    return _semiglobal_impl(
        jnp.asarray(qs), jnp.asarray(ts), lq, lt, int(match),
        int(mismatch), int(gap), pin_end=pin_end,
    )


def nw_batch_diag(
    qs, ts, match=1, mismatch=1, gap=1, gap_open=None, gap_extend=None,
    lens_q=None, lens_t=None,
):
    """Batched GLOBAL (Needleman-Wunsch) scores: [B] int32.

    Extension beyond the reference: its semi-global forward pass is
    already origin-anchored with penalized boundary gap chains
    (source.cpp:1789-1792), so global alignment is the identical scan
    reading each pair's (lq, lt) corner instead of the argmax. Matches
    oracle nw_full / nw_affine_full on the unpadded lengths."""
    score, _, _ = semiglobal_batch_diag(
        qs, ts, match, mismatch, gap, gap_open=gap_open,
        gap_extend=gap_extend, lens_q=lens_q, lens_t=lens_t, pin_end=True,
    )
    return score


def nw_batch_general(qs, ts, params, lens_q=None, lens_t=None):
    """Batched GLOBAL scores for a general substitution matrix (DNA 4x4
    or protein/BLOSUM62), linear or affine gaps — see nw_batch_diag."""
    score, _, _ = semiglobal_batch_general(
        qs, ts, params, lens_q=lens_q, lens_t=lens_t, pin_end=True
    )
    return score
