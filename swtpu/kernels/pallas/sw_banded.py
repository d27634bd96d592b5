"""Pallas fixed-band batched Smith-Waterman row-scan — the issue-bound
banded engine (BASELINE configs 1-2: "batch of 1M random pairs at the
same fixed band").

The adaptive X-drop kernels (banded_batch/banded_packed) pay ~15 lane
permutes per 32-cell round (~120 ns each on v5e — measured; gathers,
rolls and static shuffles all cost within 25% of each other), so they are
permute-bound at ~1.4 us/round. A *fixed* diagonal band |i - j| <= W
needs no data motion at all in the flagship's inter-pair layout: batch on
the (8,128) tile, row scan over a column window that slides with the row
group. Everything stays ALU ops (~8/cell, the flagship's schedule):

- Window coords: row group ig covers rows ia..ia+7 and columns
  [ia - W, ia + W + ROWS); in-group position k maps to column
  j = ia - W + k, and cell (r, k) is in-band iff 0 <= k - r <= 2W — a
  STATIC condition, so the band mask costs nothing (the column-chunk loop
  is unrolled; out-of-band chain slots are pinned to the dead value 0).
- The window slides by ROWS per group, paid by a lagged boundary buffer:
  the row boundary (yoko) is written at current-window coords k and read
  at k + ROWS (the previous group's coords). Reads stay ahead of writes,
  so no shifting, no copies.
- Dead cells ARE 0: with mismatch < 0 < gap, a zero-floored SW cell
  bounded by the final score can only decay through pads/out-of-band
  slots, so the matrix boundary (j <= 0 phantom columns stay exactly 0)
  and both band edges are handled by value, not control flow.
- diag of an in-band cell is always in-band; only `up` can read an
  out-of-band slot, and its contribution (0 - gap < 0) is exactly the
  dead semantics.

Contract: score == swtpu.oracle.banded_static.sw_banded_static_score
(local alignment restricted to |i - j| <= W). The reference's adaptive
banded family is a different contract (its band follows the alignment);
this engine is the fixed-geometry counterpart that BASELINE prescribes,
at full-matrix-rowscan efficiency (measured 435-470 GCUPS of band cells
vs ~11 for the adaptive kernel — the adaptive kernel's value is
robustness to indels that walk off a fixed corridor).

Three score modes share the schedule: uniform match/mismatch (the
compare-select flagship path), affine/Gotoh (F chunk-wide, E in the
serial chain, ~307 band GCUPS), and general matrices via the packed
query profile (sw_profile.py's plane-select lookup — BLOSUM62 protein
with Gotoh gaps measures ~102 band GCUPS).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from swtpu.core.scoring import ScoringParams
from swtpu.kernels.pallas.sw_batch import (
    CHUNK,
    LANE,
    Q_PAD,
    ROWS,
    SUB,
    TILE_PAIRS,
    T_PAD,
    _at,
    _last,
    _shift_down,
    _uniform_match_mismatch,
)


NEG_EF = -(2**29)  # dead E/F for the affine chain


def _kernel(q_ref, t_ref, out_ref, yoko_ref, *rest, n, W, WCOLS, match,
            mismatch, gap, go=None, ge=None, planes=None):
    affine = go is not None
    profile = planes is not None
    if affine:
        (yf_ref,) = rest
        go32, ge32 = jnp.int32(go), jnp.int32(ge)
        negs = jnp.full((SUB, LANE), NEG_EF, jnp.int32)
        yf_ref[:] = jnp.full((WCOLS + ROWS, SUB, LANE), NEG_EF, jnp.int32)
    zero = jnp.zeros((SUB, LANE), jnp.int32)
    zero_c = jnp.zeros((CHUNK, SUB, LANE), jnp.int32)
    gap32 = jnp.int32(gap)
    match32 = jnp.int32(match)
    mm32 = jnp.int32(mismatch)

    yoko_ref[:] = jnp.zeros((WCOLS + ROWS, SUB, LANE), jnp.int32)

    n_chunks = WCOLS // CHUNK
    n_rowgrps = n // ROWS
    # chunk-position iota for the static band mask (constant-folded:
    # j0 and r are unrolled, so each compare is a compile-time vector)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, SUB, LANE), 0)

    def lookup(planes_vals, bits, sh):
        # packed-plane select tree + byte extract (see sw_profile.py)
        vals = list(planes_vals)
        level = 0
        while len(vals) > 1:
            b = bits[level]
            nxt = []
            for j in range(0, len(vals) - 1, 2):
                nxt.append(jnp.where(b, vals[j + 1], vals[j]))
            if len(vals) % 2:
                nxt.append(vals[-1])
            vals = nxt
            level += 1
        v = jax.lax.shift_right_logical(vals[0], sh)
        return ((v & 0xFF) ^ 0x80) - 0x80

    def row_body(ig, best_c):
        ia = ig * ROWS
        if profile:
            qrow = [
                [q_ref[ia + r, g][None] for g in range(planes)]
                for r in range(ROWS)
            ]
        else:
            qrow = [q_ref[ia + r][None] for r in range(ROWS)]

        # static unroll over chunks: the band mask is static in (r, k)
        hl = [zero] * ROWS
        el = [negs] * ROWS if affine else None
        din = [zero] * ROWS
        # Row r=0's left-band-edge diagonal is the PREVIOUS group's last
        # row at old window coord ROWS-1 — one slot before the first
        # up-read — not the dead 0 the other rows get (their left-edge
        # diagonal is the masked out-of-band slot of row r-1). Missing
        # this drops paths that hug the left band edge across a row-group
        # boundary (caught by a protein-scoring parity test).
        din[0] = yoko_ref[ROWS - 1]
        for jc in range(n_chunks):
            j0 = jc * CHUNK
            # t chars for columns [ia - W + j0, +CHUNK): padded t row x
            # holds t[x - W], so the slice starts at ia + j0
            t = t_ref[pl.ds(ia + j0, CHUNK)]
            if profile:
                sh = (t & 3) << 3
                tpb = t >> 2
                n_bits = max(1, (planes - 1).bit_length())
                bits = [(tpb & (1 << k)) != 0 for k in range(n_bits)]
            # lagged boundary read: previous group's window coords
            prev = yoko_ref[pl.ds(j0 + ROWS, CHUNK)]
            if affine:
                prev_f = yf_ref[pl.ds(j0 + ROWS, CHUNK)]

            pres = []
            for r in range(ROWS):
                diag = _shift_down(prev, din[r])
                if profile:
                    s = lookup(qrow[r], bits, sh)
                else:
                    s = jnp.where(qrow[r] == t, match32, mm32)
                if affine:
                    # Gotoh: F chunk-wide off the previous row, E in the
                    # serial chain. Dead slots hold h = 0 / f <= -go /
                    # phantom e <= -go, all strictly below any live
                    # candidate, so the band mask on h alone is exact
                    # (same pad-decay argument as the linear form).
                    f = jnp.maximum(prev_f - ge32, prev - go32)
                    pre = jnp.maximum(jnp.maximum(diag + s, f), 0)
                    h, e = hl[r], el[r]
                    hs = []
                    for k in range(CHUNK):
                        e = jnp.maximum(e - ge32, h - go32)
                        if 0 <= (j0 + k) - r <= 2 * W:
                            h = jnp.maximum(_at(pre, k), e)
                        else:
                            h = zero
                        hs.append(h)
                    hl[r], el[r] = h, e
                    prev_f = f
                else:
                    pre = jnp.maximum(diag + s, 0)
                    h = hl[r]
                    hs = []
                    for k in range(CHUNK):
                        if 0 <= (j0 + k) - r <= 2 * W:  # static band test
                            h = jnp.maximum(
                                _at(pre, k),
                                jnp.maximum(_at(prev, k), h) - gap32,
                            )
                        else:
                            h = zero  # dead slot: exact out-of-band value
                        hs.append(h)
                    hl[r] = h
                # best tracking on pre, in-band slots only (out-of-band
                # pre can be positive via a real diag + match)
                in_band = [
                    0 <= (j0 + k) - r <= 2 * W for k in range(CHUNK)
                ]
                if all(in_band):
                    pres.append(pre)
                elif any(in_band):
                    d = iota_c + (j0 - r)
                    pres.append(
                        jnp.where((d >= 0) & (d <= 2 * W), pre, 0)
                    )
                din[r] = _last(prev)
                prev = jnp.stack(hs)

            yoko_ref[pl.ds(j0, CHUNK)] = prev
            if affine:
                yf_ref[pl.ds(j0, CHUNK)] = prev_f
            if pres:
                acc = pres[0]
                for p in pres[1:]:
                    acc = jnp.maximum(acc, p)
                best_c = jnp.maximum(best_c, acc)
        return best_c

    best_c = jax.lax.fori_loop(0, n_rowgrps, row_body, zero_c)
    out_ref[0] = best_c.max(axis=0)


@functools.partial(
    jax.jit, static_argnames=("n", "TL", "W", "WCOLS", "match", "mismatch",
                              "gap", "go", "ge", "planes")
)
def _sw_banded_impl(qsT, tsT, n, TL, W, WCOLS, match, mismatch, gap,
                    go=None, ge=None, planes=None):
    T = tsT.shape[0] // TL
    scratch = [pltpu.VMEM((WCOLS + ROWS, SUB, LANE), jnp.int32)]
    if go is not None:
        scratch.append(pltpu.VMEM((WCOLS + ROWS, SUB, LANE), jnp.int32))
    q_spec = (
        pl.BlockSpec(
            (n, planes, SUB, LANE), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        if planes is not None
        else pl.BlockSpec(
            (n, SUB, LANE), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        )
    )
    return pl.pallas_call(
        functools.partial(
            _kernel, n=n, W=W, WCOLS=WCOLS, match=match,
            mismatch=mismatch, gap=gap, go=go, ge=ge, planes=planes,
        ),
        out_shape=jax.ShapeDtypeStruct((T, SUB, LANE), jnp.int32),
        grid=(T,),
        in_specs=[
            q_spec,
            pl.BlockSpec(
                (TL, SUB, LANE), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, SUB, LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=scratch,
    )(qsT, tsT)


@functools.partial(jax.jit, static_argnames=("n", "TL"))
def _prepare_banded(qs, tp, n, TL):
    B = qs.shape[0]
    T = B // TILE_PAIRS
    qsT = qs.reshape(T, SUB, LANE, n).transpose(0, 3, 1, 2).astype(jnp.int32)
    qsT = qsT.reshape(T * n, SUB, LANE)
    tsT = tp.reshape(T, SUB, LANE, TL).transpose(0, 3, 1, 2).astype(jnp.int32)
    tsT = tsT.reshape(T * TL, SUB, LANE)
    return qsT, tsT


def _apply_lens(qs, ts, lens_q, lens_t, q_pad, t_pad):
    """Overwrite positions past each pair's length with pad codes
    (pads only lose, so variable-length batches need nothing else).
    Vectorized jnp (a per-row Python loop dominated wall time at
    mapper-extension batch sizes, and jnp keeps the wrapper traceable
    so callers can fuse it under their own jit — e.g. the mapper's
    packed-wire extension)."""
    if lens_q is not None:
        qs = jnp.asarray(qs)
        mask = (
            jnp.arange(qs.shape[1])[None, :]
            < jnp.asarray(lens_q)[:, None]
        )
        qs = jnp.where(mask, qs, qs.dtype.type(q_pad))
    if lens_t is not None:
        ts = jnp.asarray(ts)
        mask = (
            jnp.arange(ts.shape[1])[None, :]
            < jnp.asarray(lens_t)[:, None]
        )
        ts = jnp.where(mask, ts, ts.dtype.type(t_pad))
    return qs, ts


def sw_banded_static_pallas(
    qs, ts, params: ScoringParams, bandwidth=32, lens_q=None, lens_t=None
):
    """Batched fixed-band local-alignment scores (|i - j| <= bandwidth).

    qs: [B, n] uint8 (0-3, pad 4), ts: [B, m] uint8 (pad 5); optional
    per-pair lengths apply the pad codes for you. Uniform match/mismatch
    scoring, linear or affine (mismatch < 0 < gap_extend). Returns [B]
    int32 == swtpu.oracle.banded_static.sw_banded_static_score per pair.
    """
    qs, ts = _apply_lens(qs, ts, lens_q, lens_t, Q_PAD, T_PAD)
    affine = not params.is_linear
    mm = _uniform_match_mismatch(params)
    if mm is None:
        raise NotImplementedError("fixed-band kernel needs uniform scoring")
    match, mismatch = mm
    gap = int(params.gap_extend if affine else params.gap)
    if mismatch >= 0 or gap <= 0:
        raise NotImplementedError("dead-is-zero layout needs mismatch < 0 < gap")
    W = int(bandwidth)
    B, n = qs.shape
    m = ts.shape[1]
    qs = jnp.asarray(qs)
    ts = jnp.asarray(ts)
    if n % ROWS:
        qs = jnp.concatenate(
            [qs, jnp.full((B, ROWS - n % ROWS), Q_PAD, qs.dtype)], axis=1
        )
        n = qs.shape[1]
    WCOLS = -(-(2 * W + ROWS) // CHUNK) * CHUNK
    TL = n + WCOLS  # padded-t rows: row x holds t[x - W]
    usable = min(m, TL - W)  # columns beyond n-1+W are out-of-band anyway
    tp = jnp.concatenate(
        [
            jnp.full((B, W), T_PAD, ts.dtype),
            ts[:, :usable],
            jnp.full((B, TL - W - usable), T_PAD, ts.dtype),
        ],
        axis=1,
    )
    Bp = -(-B // TILE_PAIRS) * TILE_PAIRS
    if Bp != B:
        qs = jnp.concatenate([qs, jnp.full((Bp - B, n), Q_PAD, qs.dtype)])
        tp = jnp.concatenate([tp, jnp.full((Bp - B, TL), T_PAD, tp.dtype)])
    qsT, tsT = _prepare_banded(qs, tp, n, TL)
    out = _sw_banded_impl(
        qsT, tsT, n, TL, W, WCOLS, match, mismatch, gap,
        go=int(params.gap_open) if affine else None,
        ge=int(params.gap_extend) if affine else None,
    )
    return out.reshape(Bp)[:B]


@functools.partial(jax.jit, static_argnames=("n", "TL", "planes"))
def _prepare_banded_profile(qs, tp, packed_tab, n, TL, planes):
    """Packed query profile (sw_profile idiom) + banded t layout."""
    B = qs.shape[0]
    T = B // TILE_PAIRS
    q32 = qs.astype(jnp.int32)[..., None]
    prof = jnp.zeros((B, n, planes), jnp.int32)
    for a in range(packed_tab.shape[0]):
        prof = jnp.where(q32 == a, packed_tab[a], prof)
    profT = (
        prof.reshape(T, SUB, LANE, n, planes)
        .transpose(0, 3, 4, 1, 2)
        .reshape(T * n, planes, SUB, LANE)
    )
    tsT = (
        tp.reshape(T, SUB, LANE, TL)
        .transpose(0, 3, 1, 2)
        .astype(jnp.int32)
        .reshape(T * TL, SUB, LANE)
    )
    return profT, tsT


def sw_banded_profile_pallas(
    qs, ts, params: ScoringParams, bandwidth=32, lens_q=None, lens_t=None
):
    """Batched fixed-band scores for GENERAL substitution matrices
    (protein/BLOSUM62, non-uniform DNA), linear or affine gaps.

    Same corridor contract as sw_banded_static_pallas; the score lookup
    is the packed-profile idiom from sw_profile.py (plane select tree +
    variable byte shift — still zero lane permutes). qs codes 0..A-1
    (pad A), ts (pad A+1), A = params.alphabet_size; optional per-pair
    lengths apply the pad codes for you.
    """
    from swtpu.kernels.pallas.sw_profile import _packed_table

    qs, ts = _apply_lens(
        qs, ts, lens_q, lens_t, params.alphabet_size,
        params.alphabet_size + 1,
    )

    affine = not params.is_linear
    gap = int(params.gap_extend if affine else params.gap)
    if gap <= 0:
        raise NotImplementedError("dead-is-zero layout needs gap > 0")
    packed_tab = _packed_table(params)
    planes = packed_tab.shape[1]
    A = params.alphabet_size
    q_pad, t_pad = A, A + 1
    W = int(bandwidth)
    B, n = qs.shape
    m = ts.shape[1]
    qs = jnp.asarray(qs)
    ts = jnp.asarray(ts)
    if n % ROWS:
        qs = jnp.concatenate(
            [qs, jnp.full((B, ROWS - n % ROWS), q_pad, qs.dtype)], axis=1
        )
        n = qs.shape[1]
    WCOLS = -(-(2 * W + ROWS) // CHUNK) * CHUNK
    TL = n + WCOLS
    usable = min(m, TL - W)
    tp = jnp.concatenate(
        [
            jnp.full((B, W), t_pad, ts.dtype),
            ts[:, :usable],
            jnp.full((B, TL - W - usable), t_pad, ts.dtype),
        ],
        axis=1,
    )
    Bp = -(-B // TILE_PAIRS) * TILE_PAIRS
    if Bp != B:
        qs = jnp.concatenate([qs, jnp.full((Bp - B, n), q_pad, qs.dtype)])
        tp = jnp.concatenate([tp, jnp.full((Bp - B, TL), t_pad, tp.dtype)])
    profT, tsT = _prepare_banded_profile(
        qs, tp, jnp.asarray(packed_tab), n, TL, planes
    )
    out = _sw_banded_impl(
        profT, tsT, n, TL, W, WCOLS, 0, 0, gap,
        go=int(params.gap_open) if affine else None,
        ge=int(params.gap_extend) if affine else None,
        planes=planes,
    )
    return out.reshape(Bp)[:B]
