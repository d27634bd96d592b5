"""Pallas batched semi-global alignment for GENERAL substitution matrices
(protein/BLOSUM62, arbitrary DNA matrices): scores + argmax endpoints.

Composition of two existing designs:

- the packed-query-profile lookup of sw_profile.py (Farrar-style profile
  precompute, README.md:15 citation; 4 int8 scores per int32 plane,
  log-depth plane select + variable vector shift — the TPU rebuild of the
  reference's ``pshufb`` LUT idiom, source.cpp:119-121);
- the semi-global boundaries + endpoint tracking of semiglobal_batch.py
  (≙ SemiGlobal_111 semantics, source.cpp:1776-1834: no zero floor,
  gap-chain boundaries, argmax endpoint with the reference's row-major
  first-max tie-break).

Endpoint tracking stays on the chunk-wide ``pre = diag + s`` values: with
gap/gap_extend > 0 any H derived from a gap move (or from Gotoh E/F) has a
strictly larger predecessor, so the global max sits at a cell where
H == pre — for ANY substitution matrix, positive entries included.

Fixed-length batches only (semi-global boundaries are length-dependent);
whole query resident per tile (typical protein queries are short — route
long pairs to the XLA table engine).
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
    _at,
    _last,
    _shift_down,
)
from swtpu.kernels.pallas.semiglobal_batch import (
    MINF,
    ROWS,
    _reduce_endpoints,
)
from swtpu.kernels.pallas.sw_profile import (
    VMEM_LIMIT,
    _packed_table,
    _prepare_profile,
    plane_lookup,
)


def _kernel(prof_ref, t_ref, bv_ref, bi_ref, yoko_ref, *rest,
            n, m, planes, gap, go=None, ge=None):
    affine = go is not None
    gap32 = jnp.int32(gap)

    col1 = jax.lax.broadcasted_iota(jnp.int32, (m, SUB, LANE), 0) + 1
    bv_ref[0] = jnp.full((m, SUB, LANE), MINF, jnp.int32)
    bi_ref[0] = jnp.zeros((m, SUB, LANE), jnp.int32)
    if affine:
        (yf_ref,) = rest
        go32, ge32 = jnp.int32(go), jnp.int32(ge)
        yoko_ref[:] = -go32 - (col1 - 1) * ge32
        yf_ref[:] = jnp.full((m, SUB, LANE), MINF, jnp.int32)
    else:
        yoko_ref[:] = -col1 * gap32

    n_chunks = m // CHUNK
    n_rowgrps = n // ROWS

    lookup = plane_lookup

    def track(best, pre, row_1b):
        # per-COLUMN best/argrow with strict '>': columns see their cells
        # in ascending-row order, so ties keep the smallest row; the
        # cross-column reduce finishes the row-major-first rule (see
        # semiglobal_batch.py's module docstring for the tie-break story)
        bv, bi = best
        upd = pre > bv
        bv = jnp.where(upd, pre, bv)
        bi = jnp.where(upd, row_1b, bi)
        return (bv, bi)

    def row_body(ig, _):
        ia = ig * ROWS
        prow = [
            [prof_ref[ia + r, g][None] for g in range(planes)]
            for r in range(ROWS)
        ]

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

            sh = (t & 3) << 3
            tp = t >> 2
            n_bits = max(1, (planes - 1).bit_length())
            bits = [(tp & (1 << k)) != 0 for k in range(n_bits)]

            for r in range(ROWS):
                diag = _shift_down(prev, din[r])
                s = lookup(prow[r], bits, sh)
                pre = diag + s
                h = hl[r]
                hs = []
                if affine:
                    f = jnp.maximum(prev_f - ge32, prev - go32)
                    pre2 = jnp.maximum(pre, f)
                    e = el[r]
                    for k in range(CHUNK):
                        e = jnp.maximum(e - ge32, h - go32)
                        h = jnp.maximum(_at(pre2, k), e)
                        hs.append(h)
                    el[r] = e
                else:
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

        if affine:
            hl0 = tuple(
                jnp.full((SUB, LANE), -go, jnp.int32)
                - (ia + r) * jnp.int32(ge)
                for r in range(ROWS)
            )
            el0 = tuple(
                jnp.full((SUB, LANE), MINF, jnp.int32) for _ in range(ROWS)
            )
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
    jax.jit, static_argnames=("n", "m", "planes", "gap", "go", "ge")
)
def _semiglobal_profile_impl(profT, tsT, n, m, planes, gap, go=None,
                             ge=None):
    T = tsT.shape[0] // m
    shp = jax.ShapeDtypeStruct((T, m, SUB, LANE), jnp.int32)
    spec = pl.BlockSpec(
        (1, m, SUB, LANE), lambda i: (i, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    scratch = [pltpu.VMEM((m, SUB, LANE), jnp.int32)]
    if go is not None:
        scratch.append(pltpu.VMEM((m, SUB, LANE), jnp.int32))
    return pl.pallas_call(
        functools.partial(
            _kernel, n=n, m=m, planes=planes, gap=gap, go=go, ge=ge
        ),
        out_shape=(shp, shp),
        grid=(T,),
        in_specs=[
            pl.BlockSpec(
                (n, planes, SUB, LANE), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (m, SUB, LANE), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(spec, spec),
        scratch_shapes=scratch,
        # scratch + double-buffered m-scaled blocks pass 16 MB on long
        # targets; raise the scoped-VMEM limit (see sw_profile.VMEM_LIMIT)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT
        ),
    )(profT, tsT)


def semiglobal_batch_profile_pallas(qs, ts, params: ScoringParams):
    """Batched semi-global scores + endpoints with a general substitution
    matrix (Pallas fast path; BLOSUM62 + open/extend runs here).

    qs: [B, n], ts: [B, m] uint8 codes 0..A-1, fixed lengths
    (n % 8 == 0, m % 16 == 0 — lengths are semantic for semi-global, so
    they never pad; the batch axis pads itself to the 1024-pair tile).
    Returns (score, end_i, end_j) int32 [B], identical to
    kernels.xla.semiglobal_scan.semiglobal_batch_general.
    """
    affine = not params.is_linear
    gap = int(params.gap_extend if affine else params.gap)
    if gap <= 0:
        raise NotImplementedError("endpoint-on-pre tracking needs gap > 0")
    qs = np.asarray(qs)
    ts = np.asarray(ts)
    B, n = qs.shape
    m = ts.shape[1]
    if n % ROWS or m % CHUNK:
        # sequence lengths are semantic for semi-global (boundary gap
        # chains) — only the batch axis can pad
        raise ValueError(
            f"need n%{ROWS}==0, m%{CHUNK}==0; got n={n}, m={m} "
            f"(route to the XLA engine)"
        )
    Bp = -(-B // TILE_PAIRS) * TILE_PAIRS
    if Bp != B:
        qs = np.concatenate([qs, np.broadcast_to(qs[:1], (Bp - B, n))])
        ts = np.concatenate([ts, np.broadcast_to(ts[:1], (Bp - B, m))])
    packed_tab = _packed_table(params)
    planes = packed_tab.shape[1]
    profT, tsT = _prepare_profile(
        jnp.asarray(qs), jnp.asarray(ts), jnp.asarray(packed_tab), n, m,
        planes,
    )
    bv, bi = _semiglobal_profile_impl(
        profT, tsT, n, m, planes, gap,
        go=int(params.gap_open) if affine else None,
        ge=int(params.gap_extend) if affine else None,
    )
    score, ei, ej = _reduce_endpoints(bv, bi, n, m)
    zero_beats = score[:B] <= 0
    return (
        jnp.where(zero_beats, 0, score[:B]),
        jnp.where(zero_beats, 0, ei[:B]),
        jnp.where(zero_beats, 0, ej[:B]),
    )
