"""Pallas flagship kernel: inter-pair batched Smith-Waterman row-scan.

TPU-native redesign of the reference's fastest family, the batch-of-32
inter-sequence kernels (``SmithWaterman_8b111x32mark1/2/3``,
source.cpp:1227-1522). The insight carried over (source.cpp:1232-1236): make
the *batch* the vector axis so every lane computes an independent alignment
— no shuffles, no anti-diagonal overhang. On TPU the vector axis is a whole
(S, 128) VPU tile: S*128 pairs advance together through a row-major scan of
the DP matrix; the previous-row boundary (the reference's ``yoko``) lives in
VMEM scratch.

Score lookup: instead of the reference's ``pshufb`` LUT (source.cpp:119-121)
we precompute a Farrar-style *query profile* outside the kernel:
``prof[i, c] = S[q[i], c]`` for each query position i and target char c,
then select among the 4 profile rows with the 2 bits of the target char
(3 vector selects + a pad mask). Pad chars (q:4, t:5) score -1024, which
keeps padded/phantom cells strictly below any real cell's value, so
variable-length batches need no masking (same argument as the XLA engine).

dtype tier: int32 lanes (S=8 sublanes, 1024 pairs/tile). v5e Mosaic only
supports vector compares at 32-bit, so narrower tiers would pay relayout
casts on every select; int32 is the native fast path. The reference's
8-bit saturating tier (offset-DP, source.cpp:985-994) is a planned
addition for hardware with native narrow compares.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from swtpu.core.scoring import ScoringParams

Q_PAD = 4
T_PAD = 5
NEG = -(2**20)  # pad substitution score; << any real matrix entry

SUB = 8  # int32 sublanes
LANE = 128
TILE_PAIRS = SUB * LANE  # 1024 pairs per grid step


def _kernel(prof_ref, t_ref, out_ref, yoko_ref, *, n, m, gap):
    zero = jnp.zeros((SUB, LANE), jnp.int32)

    # clear the row boundary (previous row = boundary row 0 = all zeros)
    yoko_ref[:] = jnp.zeros((m, SUB, LANE), jnp.int32)

    def row_body(i, best):
        p0 = prof_ref[0, i, 0]
        p1 = prof_ref[0, i, 1]
        p2 = prof_ref[0, i, 2]
        p3 = prof_ref[0, i, 3]

        def col_body(j, carry):
            diag, h_left, best = carry
            t = t_ref[0, j]
            b0 = (t & 1) > 0
            b1 = (t & 2) > 0
            s01 = jnp.where(b0, p1, p0)
            s23 = jnp.where(b0, p3, p2)
            s = jnp.where(b1, s23, s01)
            s = jnp.where(t >= 4, jnp.int32(NEG), s)
            up = yoko_ref[j]
            h = jnp.maximum(
                jnp.maximum(diag + s, up - jnp.int32(gap)),
                jnp.maximum(h_left - jnp.int32(gap), zero),
            )
            yoko_ref[j] = h
            best = jnp.maximum(best, h)
            return (up, h, best)

        _, _, best = jax.lax.fori_loop(0, m, col_body, (zero, zero, best))
        return best

    best = jax.lax.fori_loop(0, n, row_body, zero)
    out_ref[0] = best


@functools.partial(jax.jit, static_argnames=("n", "m", "gap"))
def _sw_batch_pallas_impl(profT, tsT, n, m, gap):
    T = profT.shape[0]
    return pl.pallas_call(
        functools.partial(_kernel, n=n, m=m, gap=gap),
        out_shape=jax.ShapeDtypeStruct((T, SUB, LANE), jnp.int32),
        grid=(T,),
        in_specs=[
            pl.BlockSpec(
                (1, n, 4, SUB, LANE),
                lambda i: (i, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, m, SUB, LANE),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, SUB, LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((m, SUB, LANE), jnp.int32)],
    )(profT, tsT)


@functools.partial(jax.jit, static_argnames=("n", "m", "gap"))
def _prepare(qs, ts, table, n, m, gap):
    """Build the tiled query profile and target layout on device."""
    B = qs.shape[0]
    T = B // TILE_PAIRS
    # query profile: prof[b, i, c] = table[qs[b,i], c]
    prof = table[qs.astype(jnp.int32)]  # [B, n, 4] int32
    # tile layout [T, n, 4, SUB, LANE]: pair b = (tile, sub, lane)
    profT = (
        prof.reshape(T, SUB, LANE, n, 4).transpose(0, 3, 4, 1, 2)
    )
    tsT = ts.reshape(T, SUB, LANE, m).transpose(0, 3, 1, 2).astype(jnp.int32)
    return profT, tsT


def _profile_table(params: ScoringParams) -> np.ndarray:
    """[5, 4] int32: rows = query char (incl. pad 4), cols = target char."""
    tab = np.full((5, 4), NEG, dtype=np.int32)
    tab[:4, :4] = params.matrix.astype(np.int32)
    return tab


def sw_batch_pallas(qs, ts, params: ScoringParams):
    """Batched local-alignment scores via the Pallas row-scan kernel.

    qs: [B, n] uint8 (values 0-3, pad 4), ts: [B, m] uint8 (pad 5).
    B is padded up to a multiple of 2048 internally.
    Returns [B] int32 scores == swtpu.oracle.sw_score per unpadded pair.
    """
    if not params.is_linear:
        raise NotImplementedError("affine tier not yet wired into pallas")
    B, n = qs.shape
    m = ts.shape[1]
    Bp = -(-B // TILE_PAIRS) * TILE_PAIRS
    if Bp != B:
        qs = jnp.concatenate(
            [jnp.asarray(qs), jnp.full((Bp - B, n), Q_PAD, jnp.uint8)]
        )
        ts = jnp.concatenate(
            [jnp.asarray(ts), jnp.full((Bp - B, m), T_PAD, jnp.uint8)]
        )
    table = jnp.asarray(_profile_table(params))
    profT, tsT = _prepare(qs, ts, table, n, m, int(params.gap))
    out = _sw_batch_pallas_impl(profT, tsT, n, m, int(params.gap))
    return out.reshape(Bp).astype(jnp.int32)[:B]
