"""Pallas batched semi-global alignment: scores + argmax endpoints.

Same inter-pair row-scan schedule as the flagship local kernel
(sw_batch.py): 1024 pairs per (8,128) tile, chunked columns, two-row
unroll. Differences for semi-global (≙ SemiGlobal_111 semantics,
source.cpp:1776-1834): no zero floor, gap-chain boundaries
(H[0,j] = -j*gap, H[i,0] = -i*gap), and per-cell argmax endpoint tracking
with the reference's exact tie-break (first maximum in row-major scan
order): strict '>' updates per column-residue slot during the scan, and a
final cross-slot reduction preferring smaller i then smaller j.

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

ROWS = 2  # this kernel's own row unroll (decoupled from the flagship's)

MINF = -(2**29)


def _kernel(q_ref, t_ref, bv_ref, bi_ref, bj_ref, yoko_ref, *, n, m, match,
            mismatch, gap):
    gap32 = jnp.int32(gap)
    match32, mm32 = jnp.int32(match), jnp.int32(mismatch)

    # boundary row: H[0, j] = -j * gap (column j is buffer index j-1)
    col1 = jax.lax.broadcasted_iota(jnp.int32, (m, SUB, LANE), 0) + 1
    yoko_ref[:] = -col1 * gap32

    n_chunks = m // CHUNK
    n_rowpairs = n // ROWS

    def score(t, q_col):
        return jnp.where((q_col ^ t) == 0, match32, mm32)

    def serial_chain(pre, h_left):
        hs = []
        h = h_left
        for k in range(CHUNK):
            h = jnp.maximum(_at(pre, k), h - gap32)
            hs.append(h)
        return jnp.stack(hs), h

    def track(best, new, row_1b, j0):
        bv, bi, bj0 = best
        upd = new > bv
        bv = jnp.where(upd, new, bv)
        bi = jnp.where(upd, row_1b, bi)
        bj0 = jnp.where(upd, j0, bj0)
        return (bv, bi, bj0)

    def row_body(i2, best):
        ia = i2 * ROWS
        qa = q_ref[ia][None]
        qb = q_ref[ia + 1][None]
        row_a = ia + 1  # 1-based
        row_b = ia + 2

        def chunk_body(jc, carry):
            hla, hlb, dina, dinb, best = carry
            j0 = jc * CHUNK
            t = t_ref[pl.ds(j0, CHUNK)]
            up = yoko_ref[pl.ds(j0, CHUNK)]

            diag_a = _shift_down(up, dina)
            pre_a = jnp.maximum(diag_a + score(t, qa), up - gap32)
            new_a, hla = serial_chain(pre_a, hla)

            diag_b = _shift_down(new_a, dinb)
            pre_b = jnp.maximum(diag_b + score(t, qb), new_a - gap32)
            new_b, hlb = serial_chain(pre_b, hlb)

            yoko_ref[pl.ds(j0, CHUNK)] = new_b
            best = track(best, new_a, row_a, j0)
            best = track(best, new_b, row_b, j0)
            return (hla, hlb, _last(up), _last(new_a), best)

        # column-0 boundary values for this row pair
        hla0 = jnp.full((SUB, LANE), -row_a * gap, jnp.int32)
        hlb0 = jnp.full((SUB, LANE), -row_b * gap, jnp.int32)
        dina0 = jnp.full((SUB, LANE), -(row_a - 1) * gap, jnp.int32)
        dinb0 = hla0
        out = jax.lax.fori_loop(
            0, n_chunks, chunk_body, (hla0, hlb0, dina0, dinb0, best)
        )
        return out[-1]

    zero_c = jnp.zeros((CHUNK, SUB, LANE), jnp.int32)
    best0 = (zero_c + MINF, zero_c, zero_c)
    bv, bi, bj0 = jax.lax.fori_loop(0, n_rowpairs, row_body, best0)
    bv_ref[0] = bv
    bi_ref[0] = bi
    bj_ref[0] = bj0


@functools.partial(
    jax.jit, static_argnames=("n", "m", "match", "mismatch", "gap")
)
def _semiglobal_pallas_impl(qsT, tsT, n, m, match, mismatch, gap):
    T = qsT.shape[0] // n
    shp = jax.ShapeDtypeStruct((T, CHUNK, SUB, LANE), jnp.int32)
    spec = pl.BlockSpec(
        (1, CHUNK, SUB, LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(
            _kernel, n=n, m=m, match=match, mismatch=mismatch, gap=gap
        ),
        out_shape=(shp, shp, shp),
        grid=(T,),
        in_specs=[
            pl.BlockSpec(
                (n, SUB, LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (m, SUB, LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(spec, spec, spec),
        scratch_shapes=[pltpu.VMEM((m, SUB, LANE), jnp.int32)],
    )(qsT, tsT)


@functools.partial(jax.jit, static_argnames=("n", "m"))
def _reduce_endpoints(bv, bi, bj0, n, m):
    """Cross-slot reduction with the row-major-first tie rule."""
    T = bv.shape[0]
    k = jnp.arange(CHUNK, dtype=jnp.int32)[None, :, None, None]
    bj = bj0 + k + 1  # 1-based column
    # order slots by (-v, i, j): encode as a single sortable key is risky;
    # do it in two passes: max value, then mask and pick min i, then min j.
    v = bv
    vmax = v.max(axis=1, keepdims=True)
    big = jnp.int32(1 << 30)
    i_cand = jnp.where(v == vmax, bi, big)
    imin = i_cand.min(axis=1, keepdims=True)
    j_cand = jnp.where((v == vmax) & (bi == imin), bj, big)
    jmin = j_cand.min(axis=1)
    return (
        vmax[:, 0].reshape(T * SUB * LANE),
        imin[:, 0].reshape(T * SUB * LANE),
        jmin.reshape(T * SUB * LANE),
    )


def semiglobal_batch_pallas(qs, ts, match=1, mismatch=1, gap=1):
    """Batched semi-global scores + endpoints (Pallas fast path).

    qs: [B, n], ts: [B, m] uint8, fixed lengths (n even, m % 16 == 0,
    B % 1024 == 0 — use the XLA engine or bucketing otherwise).
    Returns (score, end_i, end_j) int32 [B], identical to
    swtpu.kernels.xla.semiglobal_scan.semiglobal_batch_diag. `mismatch`
    is a positive penalty (scored as -mismatch).
    """
    B, n = qs.shape
    m = ts.shape[1]
    if B % TILE_PAIRS or n % ROWS or m % CHUNK:
        raise ValueError(
            f"need B%{TILE_PAIRS}==0, n%{ROWS}==0, m%{CHUNK}==0; "
            f"got B={B}, n={n}, m={m} (route to the XLA engine)"
        )
    qsT, tsT = _prepare(jnp.asarray(qs), jnp.asarray(ts), n, m)
    bv, bi, bj0 = _semiglobal_pallas_impl(
        qsT, tsT, n, m, int(match), -int(mismatch), int(gap)
    )
    score, ei, ej = _reduce_endpoints(bv, bi, bj0, n, m)
    # the H[0,0] = 0 start cell wins unless an interior cell STRICTLY
    # exceeds 0 (the reference's strict-'<' update, source.cpp:1804)
    zero_beats = score[:B] <= 0
    return (
        jnp.where(zero_beats, 0, score[:B]),
        jnp.where(zero_beats, 0, ei[:B]),
        jnp.where(zero_beats, 0, ej[:B]),
    )
