"""XLA batched affine-gap (Gotoh) Smith-Waterman — anti-diagonal scan.

Same schedule as sw_scan.py with two extra carried diagonals (E, F). The
pad-char design (q:4 / t:5 score NEG) again makes phantom and padded cells
unable to beat any real cell, so variable lengths come free.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from swtpu.core.scoring import ScoringParams
from swtpu.kernels.xla.sw_scan import Q_PAD, T_PAD, _extended_table, _prof_scores

NEG_EF = -(2**29)


@functools.partial(
    jax.jit, static_argnames=("gap_open", "gap_extend", "n_codes")
)
def _sw_affine_impl(qs, ts, table, gap_open, gap_extend, n_codes=8):
    B, n = qs.shape
    m = ts.shape[1]
    stride = table.shape[0]
    q_pad, t_pad = stride - 2, stride - 1
    qs = jnp.minimum(qs.astype(jnp.int32), q_pad)
    ts = jnp.minimum(ts.astype(jnp.int32), t_pad)
    q_slot = jnp.pad(qs, ((0, 0), (1, 0)), constant_values=q_pad)
    ts_rev_pad = jnp.pad(
        ts[:, ::-1], ((0, 0), (n + 1, n + 1)), constant_values=t_pad
    )
    prof = table[q_slot]
    neg = jnp.int32(NEG_EF)

    def step(carry, d):
        h1, h2, e1, f1, best = carry
        off = m - d + n + 1
        t_diag = jax.lax.dynamic_slice_in_dim(ts_rev_pad, off, n + 1, axis=1)
        s = _prof_scores(prof, t_diag, n_codes)
        shift1 = lambda x: jnp.pad(x, ((0, 0), (1, 0)), constant_values=NEG_EF)[
            :, :-1
        ]
        e = jnp.maximum(e1 - gap_extend, h1 - gap_open)
        f = jnp.maximum(shift1(f1) - gap_extend, shift1(h1) - gap_open)
        h = jnp.maximum(
            jnp.maximum(shift1(h2) + s, 0), jnp.maximum(e, f)
        )
        best = jnp.maximum(best, h.max(axis=1))
        return (h, h1, e, f, best), None

    zero = jnp.zeros((B, n + 1), jnp.int32)
    negs = jnp.full((B, n + 1), NEG_EF, jnp.int32)
    ds = jnp.arange(2, n + m + 1)
    (h, _, _, _, best), _ = jax.lax.scan(
        step, (zero, zero, negs, negs, jnp.zeros((B,), jnp.int32)), ds
    )
    return best


@functools.partial(
    jax.jit, static_argnames=("gap_open", "gap_extend", "n_codes")
)
def _sw_affine_ends_impl(qs, ts, table, gap_open, gap_extend, n_codes=8):
    B, n = qs.shape
    m = ts.shape[1]
    stride = table.shape[0]
    q_pad, t_pad = stride - 2, stride - 1
    qs = jnp.minimum(qs.astype(jnp.int32), q_pad)
    ts = jnp.minimum(ts.astype(jnp.int32), t_pad)
    q_slot = jnp.pad(qs, ((0, 0), (1, 0)), constant_values=q_pad)
    ts_rev_pad = jnp.pad(
        ts[:, ::-1], ((0, 0), (n + 1, n + 1)), constant_values=t_pad
    )
    prof = table[q_slot]
    rows = jnp.arange(n + 1, dtype=jnp.int32)[None, :]
    big = jnp.int32(1 << 30)

    def step(carry, d):
        h1, h2, e1, f1, best, bi, bj = carry
        off = m - d + n + 1
        t_diag = jax.lax.dynamic_slice_in_dim(ts_rev_pad, off, n + 1, axis=1)
        s = _prof_scores(prof, t_diag, n_codes)
        shift1 = lambda x: jnp.pad(x, ((0, 0), (1, 0)), constant_values=NEG_EF)[
            :, :-1
        ]
        e = jnp.maximum(e1 - gap_extend, h1 - gap_open)
        f = jnp.maximum(shift1(f1) - gap_extend, shift1(h1) - gap_open)
        h = jnp.maximum(jnp.maximum(shift1(h2) + s, 0), jnp.maximum(e, f))
        # same row-major-first endpoint rule as the linear engine
        vmax = h.max(axis=1)
        i_at = jnp.where(h == vmax[:, None], rows, big).min(axis=1)
        upd = (vmax > best) | ((vmax == best) & (i_at < bi))
        best = jnp.where(upd, vmax, best)
        bi = jnp.where(upd, i_at, bi)
        bj = jnp.where(upd, d - i_at, bj)
        return (h, h1, e, f, best, bi, bj), None

    zero = jnp.zeros((B, n + 1), jnp.int32)
    negs = jnp.full((B, n + 1), NEG_EF, jnp.int32)
    zero1 = jnp.zeros((B,), jnp.int32)
    ds = jnp.arange(2, n + m + 1)
    (h, _, _, _, best, bi, bj), _ = jax.lax.scan(
        step, (zero, zero, negs, negs, zero1, zero1, zero1), ds
    )
    pos = best > 0
    return best, jnp.where(pos, bi, 0), jnp.where(pos, bj, 0)


def sw_affine_batch_diag_ends(qs, ts, params: ScoringParams):
    """Batched affine-gap local scores + argmax endpoints.

    Returns (score, end_i, end_j) int32 [B] with the row-major-first
    argmax tie-break of ``oracle.affine.sw_affine_traceback``. Score 0
    maps to (0, 0).
    """
    table = jnp.asarray(_extended_table(params))
    return _sw_affine_ends_impl(
        jnp.asarray(qs),
        jnp.asarray(ts),
        table,
        int(params.gap_open),
        int(params.gap_extend),
        n_codes=params.alphabet_size + 2,
    )


def sw_affine_batch_diag(qs, ts, params: ScoringParams):
    """Batched affine-gap local-alignment scores on device.

    qs: [B, n] uint8 (pad 4), ts: [B, m] uint8 (pad 5) → [B] int32, equal
    to swtpu.oracle.affine.sw_affine_score per pair. With
    gap_open == gap_extend, equal to the linear-gap engines.
    """
    table = jnp.asarray(_extended_table(params))
    return _sw_affine_impl(
        jnp.asarray(qs),
        jnp.asarray(ts),
        table,
        int(params.gap_open),
        int(params.gap_extend),
        n_codes=params.alphabet_size + 2,
    )
