"""Pallas batched affine-gap (Gotoh) Smith-Waterman row-scan.

Same TPU schedule as the linear flagship (swtpu.kernels.pallas.sw_batch):
batch on a (8,128) int32 tile, chunked columns, 8-row unroll. The affine
extension adds the Gotoh E/F recurrences: F (vertical gap) depends only on
the previous row, so it is chunk-wide; E (horizontal gap) joins H in the
serial left-to-right chain:
    e_k = max(e_{k-1} - ext, h_{k-1} - open)
    h_k = max(pre_k, e_k),  pre = max(diag + s, F, 0) (chunk-wide)
max/sub chains remain reassociable, so the compiler can still collapse the
serial chain to log depth. VMEM cost: one extra row buffer for F.

Reference linkage: the reference is linear-gap only (source.cpp:69);
affine is the BASELINE-mandated extension, and gap_open == gap_extend
degenerates bit-exactly to the linear kernels (tested).
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
    SUB,
    TILE_PAIRS,
    Q_PAD,
    T_PAD,
    _at,
    _last,
    _prepare,
    _shift_down,
    _uniform_match_mismatch,
)

ROWS = 8  # row unroll (matches the flagship's measured optimum)

NEG_EF = -(2**29)


def _kernel(
    q_ref, t_ref, out_ref, yh_ref, yf_ref, *, n, m, match, mismatch, go, ge,
    rowbits=None,
):
    """rowbits=None: out_ref[0] is the [SUB, LANE] best score. rowbits set:
    out_ref[0] is a per-column [m, SUB, LANE] packed endpoint buffer
    ``comb = pre * 2^rowbits - row`` (see sw_batch._kernel_ends)."""
    ends = rowbits is not None
    zero = jnp.zeros((SUB, LANE), jnp.int32)
    zero_c = jnp.zeros((CHUNK, SUB, LANE), jnp.int32)
    negs = jnp.full((SUB, LANE), NEG_EF, jnp.int32)
    go32, ge32 = jnp.int32(go), jnp.int32(ge)
    match32, mm32 = jnp.int32(match), jnp.int32(mismatch)
    if ends:
        K = jnp.int32(1 << rowbits)
        out_ref[0] = jnp.full((m, SUB, LANE), NEG_EF, jnp.int32)

    yh_ref[:] = jnp.zeros((m, SUB, LANE), jnp.int32)
    yf_ref[:] = jnp.full((m, SUB, LANE), NEG_EF, jnp.int32)

    n_chunks = m // CHUNK
    n_rowgrps = n // ROWS

    def score(t, q_col):
        return jnp.where((q_col ^ t) == 0, match32, mm32)

    def serial_chain(pre, h_left, e_left):
        hs = []
        h, e = h_left, e_left
        for k in range(CHUNK):
            e = jnp.maximum(e - ge32, h - go32)
            h = jnp.maximum(_at(pre, k), e)
            hs.append(h)
        return jnp.stack(hs), h, e

    def row_body(ig, best_c):
        ia = ig * ROWS
        qrow = [q_ref[ia + r][None] for r in range(ROWS)]

        def chunk_body(jc, carry):
            hl, el, din, best_c = carry
            hl, el, din = list(hl), list(el), list(din)
            j0 = jc * CHUNK
            t = t_ref[pl.ds(j0, CHUNK)]
            prev_h = yh_ref[pl.ds(j0, CHUNK)]  # H of row ia-1
            prev_f = yf_ref[pl.ds(j0, CHUNK)]  # F of row ia-1
            if ends:
                bc = out_ref[0, pl.ds(j0, CHUNK)]

            pres = []
            for r in range(ROWS):
                f = jnp.maximum(prev_f - ge32, prev_h - go32)
                diag = _shift_down(prev_h, din[r])
                pre = jnp.maximum(
                    jnp.maximum(diag + score(t, qrow[r]), f), 0
                )
                new, hl[r], el[r] = serial_chain(pre, hl[r], el[r])
                if ends:
                    # an F/E-derived max implies a strictly larger
                    # predecessor (go, ge > 0), so every global-max cell
                    # still satisfies H == pre
                    bc = jnp.maximum(bc, pre * K - jnp.int32(ia + r + 1))
                else:
                    pres.append(pre)
                din[r] = _last(prev_h)
                prev_h, prev_f = new, f

            yh_ref[pl.ds(j0, CHUNK)] = prev_h
            yf_ref[pl.ds(j0, CHUNK)] = prev_f
            if ends:
                out_ref[0, pl.ds(j0, CHUNK)] = bc
                return (tuple(hl), tuple(el), tuple(din), best_c)
            # best tracking on pre only: H = max(pre, E) and any E term
            # implies a strictly larger earlier H, so max(H) == max(pre)
            acc = pres[0]
            for r in range(1, ROWS):
                acc = jnp.maximum(acc, pres[r])
            best_c = jnp.maximum(best_c, acc)
            return (tuple(hl), tuple(el), tuple(din), best_c)

        zeros = tuple(zero for _ in range(ROWS))
        negss = tuple(negs for _ in range(ROWS))
        out = jax.lax.fori_loop(
            0, n_chunks, chunk_body, (zeros, negss, zeros, best_c)
        )
        return out[-1]

    best_c = jax.lax.fori_loop(0, n_rowgrps, row_body, zero_c)
    if not ends:
        out_ref[0] = best_c.max(axis=0)


@functools.partial(
    jax.jit, static_argnames=("n", "m", "match", "mismatch", "go", "ge")
)
def _sw_affine_pallas_impl(qsT, tsT, n, m, match, mismatch, go, ge):
    T = qsT.shape[0] // n
    return pl.pallas_call(
        functools.partial(
            _kernel, n=n, m=m, match=match, mismatch=mismatch, go=go, ge=ge
        ),
        out_shape=jax.ShapeDtypeStruct((T, SUB, LANE), jnp.int32),
        grid=(T,),
        in_specs=[
            pl.BlockSpec(
                (n, SUB, LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (m, SUB, LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, SUB, LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((m, SUB, LANE), jnp.int32),
            pltpu.VMEM((m, SUB, LANE), jnp.int32),
        ],
    )(qsT, tsT)


@functools.partial(
    jax.jit,
    static_argnames=("n", "m", "match", "mismatch", "go", "ge", "rowbits"),
)
def _sw_affine_ends_impl(qsT, tsT, n, m, match, mismatch, go, ge, rowbits):
    T = qsT.shape[0] // n
    return pl.pallas_call(
        functools.partial(
            _kernel, n=n, m=m, match=match, mismatch=mismatch, go=go, ge=ge,
            rowbits=rowbits,
        ),
        out_shape=jax.ShapeDtypeStruct((T, m, SUB, LANE), jnp.int32),
        grid=(T,),
        in_specs=[
            pl.BlockSpec(
                (n, SUB, LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (m, SUB, LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, m, SUB, LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((m, SUB, LANE), jnp.int32),
            pltpu.VMEM((m, SUB, LANE), jnp.int32),
        ],
    )(qsT, tsT)


def sw_affine_pallas_ends(qs, ts, params: ScoringParams):
    """Batched affine-gap scores + argmax endpoints (Pallas row-scan).

    Returns (score, end_i, end_j) int32 [B] with the row-major-first
    argmax rule of ``oracle.affine.sw_affine_traceback``; score 0 maps to
    (0, 0). No transpose swap (would change the tie-break scan order).
    """
    from swtpu.kernels.pallas.sw_batch import _reduce_comb

    mm = _uniform_match_mismatch(params)
    if mm is None:
        raise NotImplementedError("general matrices: use the profile kernel")
    match, mismatch = mm
    if mismatch >= 0 or params.gap_extend <= 0 or params.gap_open <= 0:
        raise NotImplementedError("pad-decay layout needs mismatch < 0 < gap")
    B, n = qs.shape
    m = ts.shape[1]
    qs = jnp.asarray(qs)
    ts = jnp.asarray(ts)
    if n % ROWS:
        qs = jnp.concatenate(
            [qs, jnp.full((B, ROWS - n % ROWS), Q_PAD, qs.dtype)], axis=1
        )
        n = qs.shape[1]
    mp = -(-m // CHUNK) * CHUNK
    if mp != m:
        ts = jnp.concatenate(
            [ts, jnp.full((B, mp - m), T_PAD, ts.dtype)], axis=1
        )
        m = mp
    rowbits = n.bit_length()
    if max(match, 1) * min(n, m) >= (1 << (31 - rowbits)):
        raise NotImplementedError(
            "packed (value,row) tracking would overflow int32; route to "
            "the XLA ends engine"
        )
    if n + 4 * m > 4096:  # VMEM budget (q + t/yh/yf/bc tiles)
        raise NotImplementedError("shape exceeds the ends kernel's VMEM")
    Bp = -(-B // TILE_PAIRS) * TILE_PAIRS
    if Bp != B:
        qs = jnp.concatenate([qs, jnp.full((Bp - B, n), Q_PAD, qs.dtype)])
        ts = jnp.concatenate([ts, jnp.full((Bp - B, m), T_PAD, ts.dtype)])
    qsT, tsT = _prepare(qs, ts, n, m)
    bc = _sw_affine_ends_impl(
        qsT, tsT, n, m, match, mismatch,
        int(params.gap_open), int(params.gap_extend), rowbits,
    )
    score, ei, ej = _reduce_comb(bc, rowbits)
    return score[:B], ei[:B], ej[:B]


def sw_affine_pallas(qs, ts, params: ScoringParams):
    """Batched affine-gap scores via the Pallas row-scan kernel.

    Same layout/padding contract as sw_batch_pallas. Returns [B] int32 ==
    swtpu.oracle.affine.sw_affine_score per pair.
    """
    mm = _uniform_match_mismatch(params)
    if mm is None:
        raise NotImplementedError(
            "general matrices route to the XLA affine engine"
        )
    match, mismatch = mm
    B, n = qs.shape
    m = ts.shape[1]
    qs = jnp.asarray(qs)
    ts = jnp.asarray(ts)
    if n % ROWS:
        qs = jnp.concatenate(
            [qs, jnp.full((B, ROWS - n % ROWS), Q_PAD, qs.dtype)], axis=1
        )
        n = qs.shape[1]
    mp = -(-m // CHUNK) * CHUNK
    if mp != m:
        ts = jnp.concatenate(
            [ts, jnp.full((B, mp - m), T_PAD, ts.dtype)], axis=1
        )
        m = mp
    Bp = -(-B // TILE_PAIRS) * TILE_PAIRS
    if Bp != B:
        qs = jnp.concatenate([qs, jnp.full((Bp - B, n), Q_PAD, qs.dtype)])
        ts = jnp.concatenate([ts, jnp.full((Bp - B, m), T_PAD, ts.dtype)])
    qsT, tsT = _prepare(qs, ts, n, m)
    out = _sw_affine_pallas_impl(
        qsT, tsT, n, m, match, mismatch,
        int(params.gap_open), int(params.gap_extend),
    )
    return out.reshape(Bp)[:B]
