"""Pallas batched semi-global alignment: scores + argmax endpoints.

Same inter-pair row-scan schedule as the flagship local kernel
(sw_batch.py): 1024 pairs per (8,128) tile, chunked columns, fused serial
chain, 8-row unroll. Differences for semi-global (≙ SemiGlobal_111
semantics, source.cpp:1776-1834): no zero floor, gap-chain boundaries
(H[0,j] = -j*gap, H[i,0] = -i*gap), and argmax endpoint tracking with the
reference's exact tie-break (first maximum in row-major scan order):
per-COLUMN best/argrow arrays updated with strict '>' during the scan (on
the chunk-wide pre values — see track()). Each column sees its cells in
ascending-row order (chunks partition columns, so the chunk-major sweep
never interleaves a column with itself), hence strict '>' records the
smallest row per column; the final cross-column reduction picks max
value, then min row, then min column — exactly row-major-first. (A
previous scheme tracked per column-residue slot k = (j-1) % CHUNK, which
shares a slot across chunks and visits chunks before rows — a deeper-row
cell in an earlier chunk could beat the row-major-first cell; caught by
a randomized tie search, ~1/1500 pairs at (2,-1,1) scoring.)

Fixed-length batches only (semi-global boundaries are length-dependent, so
pad-char tricks don't apply; use bucketing for mixed lengths).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from swtpu.kernels.pallas.sw_batch import (
    CHUNK,
    LANE,
    SUB,
    TILE_PAIRS,
    _at,
    _last,
    _prepare,
    _shift_down,
)

ROWS = 8  # row unroll (matches the flagship's measured optimum)

MINF = -(2**29)


def _kernel(q_ref, t_ref, bv_ref, bi_ref, yoko_ref, *rest, n, m,
            match, mismatch, gap, go=None, ge=None):
    affine = go is not None
    gap32 = jnp.int32(gap)
    match32, mm32 = jnp.int32(match), jnp.int32(mismatch)

    col1 = jax.lax.broadcasted_iota(jnp.int32, (m, SUB, LANE), 0) + 1
    bv_ref[0] = jnp.full((m, SUB, LANE), MINF, jnp.int32)
    bi_ref[0] = jnp.zeros((m, SUB, LANE), jnp.int32)
    if affine:
        (yf_ref,) = rest
        go32, ge32 = jnp.int32(go), jnp.int32(ge)
        # boundary row: H[0, j] = -(go + (j-1)*ge); F[0, j] = -inf
        yoko_ref[:] = -go32 - (col1 - 1) * ge32
        yf_ref[:] = jnp.full((m, SUB, LANE), MINF, jnp.int32)
    else:
        # boundary row: H[0, j] = -j * gap (column j is buffer index j-1)
        yoko_ref[:] = -col1 * gap32

    n_chunks = m // CHUNK
    n_rowgrps = n // ROWS

    def track(best, pre, row_1b):
        # endpoint tracking on the chunk-wide pre values (diag + s): every
        # global-max cell satisfies H == pre there (an H from up-gap or
        # left-gap implies a strictly larger predecessor), so max/argfirst
        # over pre equals max/argfirst over H — and pre needs no serial
        # chain.
        bv, bi = best
        upd = pre > bv
        bv = jnp.where(upd, pre, bv)
        bi = jnp.where(upd, row_1b, bi)
        return (bv, bi)

    def row_body(ig, _):
        ia = ig * ROWS
        qrow = [q_ref[ia + r][None] for r in range(ROWS)]

        def chunk_body(jc, carry):
            if affine:
                hl, el, din = carry
                hl, el, din = list(hl), list(el), list(din)
            else:
                hl, din = carry
                hl, din = list(hl), list(din)
            j0 = jc * CHUNK
            t = t_ref[pl.ds(j0, CHUNK)]
            prev = yoko_ref[pl.ds(j0, CHUNK)]
            best = (bv_ref[0, pl.ds(j0, CHUNK)], bi_ref[0, pl.ds(j0, CHUNK)])
            if affine:
                prev_f = yf_ref[pl.ds(j0, CHUNK)]

            for r in range(ROWS):
                diag = _shift_down(prev, din[r])
                s = jnp.where(qrow[r] == t, match32, mm32)
                pre = diag + s
                h = hl[r]
                hs = []
                if affine:
                    # Gotoh: F chunk-wide, E in the serial chain. Endpoint
                    # tracking stays on pre: an E/F-derived H is strictly
                    # below its predecessor (go, ge > 0), so the global
                    # max sits at a cell where H == diag + s.
                    f = jnp.maximum(prev_f - ge32, prev - go32)
                    pre2 = jnp.maximum(pre, f)
                    e = el[r]
                    for k in range(CHUNK):
                        e = jnp.maximum(e - ge32, h - go32)
                        h = jnp.maximum(_at(pre2, k), e)
                        hs.append(h)
                    el[r] = e
                else:
                    # fused serial chain (vertical gap rides in the chain)
                    for k in range(CHUNK):
                        h = jnp.maximum(
                            _at(pre, k),
                            jnp.maximum(_at(prev, k), h) - gap32,
                        )
                        hs.append(h)
                hl[r] = h
                best = track(best, pre, ia + r + 1)
                din[r] = _last(prev)
                prev = jnp.stack(hs)
                if affine:
                    prev_f = f

            yoko_ref[pl.ds(j0, CHUNK)] = prev
            bv_ref[0, pl.ds(j0, CHUNK)] = best[0]
            bi_ref[0, pl.ds(j0, CHUNK)] = best[1]
            if affine:
                yf_ref[pl.ds(j0, CHUNK)] = prev_f
                return (tuple(hl), tuple(el), tuple(din))
            return (tuple(hl), tuple(din))

        # column-0 boundary values for this row group (1-based row ia+r+1)
        if affine:
            hl0 = tuple(
                jnp.full((SUB, LANE), -go, jnp.int32)
                - (ia + r) * jnp.int32(ge)
                for r in range(ROWS)
            )
            el0 = tuple(
                jnp.full((SUB, LANE), MINF, jnp.int32) for _ in range(ROWS)
            )
            # diag head = H[ia+r, 0]: 0 for the origin, else the gap chain
            din0 = tuple(
                jnp.full((SUB, LANE), 1, jnp.int32)
                * jnp.where(
                    ia + r == 0,
                    0,
                    -jnp.int32(go) - (ia + r - 1) * jnp.int32(ge),
                )
                for r in range(ROWS)
            )
            jax.lax.fori_loop(0, n_chunks, chunk_body, (hl0, el0, din0))
            return 0
        hl0 = tuple(
            jnp.full((SUB, LANE), -(ia + r + 1) * gap, jnp.int32)
            for r in range(ROWS)
        )
        din0 = tuple(
            jnp.full((SUB, LANE), -(ia + r) * gap, jnp.int32)
            for r in range(ROWS)
        )
        jax.lax.fori_loop(0, n_chunks, chunk_body, (hl0, din0))
        return 0

    jax.lax.fori_loop(0, n_rowgrps, row_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("n", "m", "match", "mismatch", "gap", "go", "ge"),
)
def _semiglobal_pallas_impl(qsT, tsT, n, m, match, mismatch, gap,
                            go=None, ge=None):
    T = qsT.shape[0] // n
    shp = jax.ShapeDtypeStruct((T, m, SUB, LANE), jnp.int32)
    spec = pl.BlockSpec(
        (1, m, SUB, LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    scratch = [pltpu.VMEM((m, SUB, LANE), jnp.int32)]
    if go is not None:
        scratch.append(pltpu.VMEM((m, SUB, LANE), jnp.int32))
    return pl.pallas_call(
        functools.partial(
            _kernel, n=n, m=m, match=match, mismatch=mismatch, gap=gap,
            go=go, ge=ge,
        ),
        out_shape=(shp, shp),
        grid=(T,),
        in_specs=[
            pl.BlockSpec(
                (n, SUB, LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (m, SUB, LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(spec, spec),
        scratch_shapes=scratch,
    )(qsT, tsT)


@functools.partial(jax.jit, static_argnames=("n", "m"))
def _reduce_endpoints(bv, bi, n, m):
    """Cross-column reduction with the row-major-first tie rule: max
    value, then min row (each column's bi is already the min row for its
    best value), then min column."""
    T = bv.shape[0]
    bj = jnp.arange(m, dtype=jnp.int32)[None, :, None, None] + 1
    vmax = bv.max(axis=1, keepdims=True)
    big = jnp.int32(1 << 30)
    i_cand = jnp.where(bv == vmax, bi, big)
    imin = i_cand.min(axis=1, keepdims=True)
    j_cand = jnp.where((bv == vmax) & (bi == imin), bj, big)
    jmin = j_cand.min(axis=1)
    return (
        vmax[:, 0].reshape(T * SUB * LANE),
        imin[:, 0].reshape(T * SUB * LANE),
        jmin.reshape(T * SUB * LANE),
    )


def semiglobal_batch_pallas(
    qs, ts, match=1, mismatch=1, gap=1, gap_open=None, gap_extend=None
):
    """Batched semi-global scores + endpoints (Pallas fast path),
    linear or affine (gap_open != gap_extend) gaps.

    qs: [B, n], ts: [B, m] uint8, fixed lengths (n % 8 == 0, m % 16 == 0
    — use the XLA engine or bucketing otherwise; the batch axis self-pads
    to the 1024-pair tile, padded pairs are computed and discarded).
    Returns (score, end_i, end_j) int32 [B], identical to
    swtpu.kernels.xla.semiglobal_scan.semiglobal_batch_diag. `mismatch`
    is a positive penalty (scored as -mismatch).
    """
    if gap_open is not None and gap_open == gap_extend:
        gap, gap_open, gap_extend = gap_open, None, None
    affine = gap_open is not None
    B, n = qs.shape
    m = ts.shape[1]
    if n % ROWS or m % CHUNK:
        raise ValueError(
            f"need n%{ROWS}==0, m%{CHUNK}==0; "
            f"got n={n}, m={m} (route to the XLA engine)"
        )
    qs, ts = jnp.asarray(qs), jnp.asarray(ts)
    Bp = -(-B // TILE_PAIRS) * TILE_PAIRS
    if Bp != B:
        qs = jnp.concatenate(
            [qs, jnp.zeros((Bp - B, n), qs.dtype)], axis=0
        )
        ts = jnp.concatenate(
            [ts, jnp.zeros((Bp - B, m), ts.dtype)], axis=0
        )
    qsT, tsT = _prepare(qs, ts, n, m)
    bv, bi = _semiglobal_pallas_impl(
        qsT, tsT, n, m, int(match), -int(mismatch), int(gap),
        go=int(gap_open) if affine else None,
        ge=int(gap_extend) if affine else None,
    )
    score, ei, ej = _reduce_endpoints(bv, bi, n, m)
    # the H[0,0] = 0 start cell wins unless an interior cell STRICTLY
    # exceeds 0 (the reference's strict-'<' update, source.cpp:1804)
    zero_beats = score[:B] <= 0
    return (
        jnp.where(zero_beats, 0, score[:B]),
        jnp.where(zero_beats, 0, ei[:B]),
        jnp.where(zero_beats, 0, ej[:B]),
    )
