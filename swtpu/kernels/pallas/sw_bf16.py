"""Pallas bfloat16 reduced-precision Smith-Waterman tier.

The TPU-native answer to the reference's 8-bit kernel family
(``SmithWaterman_8bit111simd`` / ``8b111x32mark*``, source.cpp:1105-1522):
narrow the DP values to double the vector width. v5e Mosaic has no 8/16-bit
integer vector ops (probed: cmpi/max/mul all rejected), but it DOES have
full-rate bfloat16 arithmetic on (16,128) tiles — twice the lanes of the
int32 (8,128) tile — and bf16 represents every integer of magnitude <= 256
exactly.

Scoring therefore rescales by g = gcd(match, mismatch, gap) and requires
n * match/g <= 256 (the reference's 8-bit kernels impose the analogous
saturation bound, source.cpp:1109-1138): every DP value is then an exact
small integer in bf16 and scores are bit-exact after the final
multiply-back. The reference's "(1,1,1)" workload (source.cpp:3189) and
the headline (10,-30,15) = 5x(2,-6,3) both qualify at n = 128.

The match/mismatch select would need a 32-bit compare (unsupported mask
relayout at 16-bit), so the score is computed arithmetically instead:

    d = q - t;  s = match - (match - mm) * min(d*d, 1)

exact in bf16 for codes 0..5 (pads 4/5 never equal a real base, keeping
the pads-only-lose property). Everything else is the flagship's fused
schedule (sw_batch.py) in bf16: chunked columns, fused serial chain,
8-row unroll, best tracked on pre.

**Measured result: ~213 GCUPS vs the int32 flagship's ~441 on the same
workload** — v5e's VPU does not run (16,128) bf16 ops at one op per
cycle-equivalent, so the 2x-lanes hypothesis fails on this chip. The
kernel is kept, scores bit-exact, as the ladder's documented
precision-tier data point (the reference keeps its slower schedule
variants for the same reason, e.g. simd5, source.cpp:580); on VPUs with
native-rate bf16 it would become the fast tier for short reads.
"""

from __future__ import annotations

import functools
import math

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
    T_PAD,
    _at,
    _last,
    _shift_down,
    _uniform_match_mismatch,
)

SUB16 = 16  # bf16 sublanes
TILE_PAIRS_16 = SUB16 * LANE  # 2048 pairs per grid step
MAX_EXACT = 256  # bf16 represents |int| <= 256 exactly


def _kernel(q_ref, t_ref, out_ref, yoko_ref, *, n, m, match, mismatch, gap):
    bf = jnp.bfloat16
    zero = jnp.zeros((SUB16, LANE), bf)
    zero_c = jnp.zeros((CHUNK, SUB16, LANE), bf)
    gapb = bf(gap)
    matchb = bf(match)
    diffb = bf(match - mismatch)
    oneb = bf(1)

    yoko_ref[:] = jnp.zeros((m, SUB16, LANE), bf)

    n_chunks = m // CHUNK
    n_rowgrps = n // ROWS

    def row_body(ig, best_c):
        ia = ig * ROWS
        qrow = [q_ref[ia + r][None] for r in range(ROWS)]

        def chunk_body(jc, carry):
            hl, din, best_c = carry
            hl, din = list(hl), list(din)
            j0 = jc * CHUNK
            t = t_ref[pl.ds(j0, CHUNK)]
            prev = yoko_ref[pl.ds(j0, CHUNK)]

            pres = []
            for r in range(ROWS):
                diag = _shift_down(prev, din[r])
                # arithmetic match test (see module docstring): d*d is 0
                # iff q == t, and min(d*d, 1) clamps every mismatch to 1
                d = qrow[r] - t
                s = matchb - diffb * jnp.minimum(d * d, oneb)
                pre = jnp.maximum(diag + s, zero_c)
                h = hl[r]
                hs = []
                for k in range(CHUNK):
                    h = jnp.maximum(
                        _at(pre, k),
                        jnp.maximum(_at(prev, k), h) - gapb,
                    )
                    hs.append(h)
                hl[r] = h
                pres.append(pre)
                din[r] = _last(prev)
                prev = jnp.stack(hs)

            yoko_ref[pl.ds(j0, CHUNK)] = prev
            acc = pres[0]
            for r in range(1, ROWS):
                acc = jnp.maximum(acc, pres[r])
            best_c = jnp.maximum(best_c, acc)
            return (tuple(hl), tuple(din), best_c)

        zeros = tuple(zero for _ in range(ROWS))
        _, _, best_c = jax.lax.fori_loop(
            0, n_chunks, chunk_body, (zeros, zeros, best_c)
        )
        return best_c

    best_c = jax.lax.fori_loop(0, n_rowgrps, row_body, zero_c)
    out_ref[0] = best_c.max(axis=0).astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("n", "m", "match", "mismatch", "gap")
)
def _sw_bf16_impl(qsT, tsT, n, m, match, mismatch, gap):
    T = qsT.shape[0] // n
    return pl.pallas_call(
        functools.partial(
            _kernel, n=n, m=m, match=match, mismatch=mismatch, gap=gap
        ),
        out_shape=jax.ShapeDtypeStruct((T, SUB16, LANE), jnp.int32),
        grid=(T,),
        in_specs=[
            pl.BlockSpec(
                (n, SUB16, LANE),
                lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (m, SUB16, LANE),
                lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, SUB16, LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((m, SUB16, LANE), jnp.bfloat16)],
    )(qsT, tsT)


@functools.partial(jax.jit, static_argnames=("n", "m"))
def _prepare_bf16(qs, ts, n, m):
    B = qs.shape[0]
    T = B // TILE_PAIRS_16
    qsT = (
        qs.reshape(T, SUB16, LANE, n)
        .transpose(0, 3, 1, 2)
        .astype(jnp.bfloat16)
        .reshape(T * n, SUB16, LANE)
    )
    tsT = (
        ts.reshape(T, SUB16, LANE, m)
        .transpose(0, 3, 1, 2)
        .astype(jnp.bfloat16)
        .reshape(T * m, SUB16, LANE)
    )
    return qsT, tsT


def bf16_tier_supported(params: ScoringParams, n: int) -> bool:
    """True iff this scoring/length fits the exact-bf16 range."""
    if not params.is_linear or params.gap <= 0:
        return False
    mm = _uniform_match_mismatch(params)
    if mm is None or mm[1] >= 0:
        return False
    match, mismatch = mm
    g = math.gcd(math.gcd(abs(match), abs(mismatch)), abs(int(params.gap)))
    return n * (match // g) <= MAX_EXACT


def sw_batch_bf16_pallas(qs, ts, params: ScoringParams, allow_overflow=False):
    """Batched local-alignment scores via the bf16 reduced-precision tier.

    Same contract as sw_batch_pallas (uniform match/mismatch, mismatch <
    0 < gap) plus the range bound n * match/gcd <= 256. Returns [B] int32
    scores == swtpu.oracle.sw_score per pair.

    allow_overflow=True skips the static worst-case range check (the
    promotion driver's mode, swtpu.batch.sw_scores_promoted): a returned
    score below (MAX_EXACT - 1) * gcd is still guaranteed exact — in
    zero-floored SW every DP cell is bounded by the final score, bf16
    arithmetic below MAX_EXACT is exact, and rounding drift only ever
    accrues to cells whose true value crossed MAX_EXACT — so scores >=
    that threshold (and only those) must be recomputed at int32.
    """
    B, n = qs.shape
    m = ts.shape[1]
    if not bf16_tier_supported(params, n + (-n) % ROWS):
        mm = _uniform_match_mismatch(params)
        ok_shape = (
            params.is_linear
            and params.gap > 0
            and mm is not None
            and mm[1] < 0
        )
        if not (allow_overflow and ok_shape):
            raise NotImplementedError(
                "bf16 tier needs uniform scoring with n*match/gcd <= 256; "
                "route to sw_batch_pallas"
            )
    match, mismatch = _uniform_match_mismatch(params)
    g = math.gcd(math.gcd(abs(match), abs(mismatch)), abs(int(params.gap)))
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
    Bp = -(-B // TILE_PAIRS_16) * TILE_PAIRS_16
    if Bp != B:
        qs = jnp.concatenate([qs, jnp.full((Bp - B, n), Q_PAD, qs.dtype)])
        ts = jnp.concatenate([ts, jnp.full((Bp - B, m), T_PAD, ts.dtype)])
    qsT, tsT = _prepare_bf16(qs, ts, n, m)
    out = _sw_bf16_impl(
        qsT, tsT, n, m, match // g, mismatch // g, int(params.gap) // g
    )
    return out.reshape(Bp)[:B] * g
