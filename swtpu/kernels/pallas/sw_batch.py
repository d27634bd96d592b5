"""Pallas flagship kernel: inter-pair batched Smith-Waterman row-scan.

TPU-native redesign of the reference's fastest family, the batch-of-32
inter-sequence kernels (``SmithWaterman_8b111x32mark1/2/3``,
source.cpp:1227-1522). The insight carried over (source.cpp:1232-1236): make
the *batch* the vector axis so every lane computes an independent alignment
— no shuffles, no anti-diagonal overhang. On TPU the vector axis is a whole
(8, 128) VPU tile: 1024 pairs advance together through a row-major scan of
the DP matrix; the previous-row boundary (the reference's ``yoko``,
source.cpp:1255) lives in VMEM scratch.

Schedule (measured on v5e; see git history for the ladder):
- The column loop runs in chunks of CHUNK=16 cells. The recurrence is
  *fused* so only the chunk-wide pre-value needs the score select:

      pre[k] = max(diag[k] + s[k], 0)              (chunk-wide)
      H[k]   = max(pre[k], max(up[k], H[k-1]) - gap)   (serial in k)

  i.e. the vertical-gap term rides inside the left-to-right chain instead
  of being materialized chunk-wide — one fewer vector op per cell. Since
  max/sub chains are reassociable (max(a,b)-g = max(a-g,b-g)) the compiler
  is free to trade critical path against op count either way; measured,
  the fused form wins. (The reference plays the same games: max-tree
  re-association at source.cpp:859-860/921-926, offset DP at :985-994.)
- The global best needs no per-cell H tracking: every H value is either a
  ``pre`` value or an older H minus gap penalties, so max(H) == max(pre).
  Best is accumulated over the pre tensors only.
- EIGHT query rows advance per chunk iteration (the reference mark2's
  vertical unroll taken further, source.cpp:1304-1306): row r+1 consumes
  row r's freshly computed values straight from registers, cutting VMEM
  row-boundary traffic 8x and giving the VLIW scheduler 8 independent
  serial chains to interleave.

Pads: q:4, t:5 never match anything, so padded cells score ``mismatch``;
with mismatch < 0 < gap (enforced below) padded/phantom cells can only
decay from real cells and never raise the max, so variable-length batches
need no extra masking.

dtype tier: int32 lanes (8 sublanes, 1024 pairs/tile). v5e Mosaic only
supports vector compares at 32-bit; narrower tiers would pay relayout casts
on every select.
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

SUB = 8  # int32 sublanes
LANE = 128
TILE_PAIRS = SUB * LANE  # 1024 pairs per grid step
CHUNK = 16  # columns per inner-loop iteration
ROWS = 8  # query rows per inner-loop iteration


def _last(x):
    """x[-1] via static slice (Mosaic cannot lower value dynamic_slice)."""
    return jax.lax.squeeze(
        jax.lax.slice_in_dim(x, x.shape[0] - 1, x.shape[0], axis=0), [0]
    )


def _at(x, k):
    return jax.lax.squeeze(jax.lax.slice_in_dim(x, k, k + 1, axis=0), [0])


def _shift_down(x, head):
    """[head, x[0], ..., x[-2]] along axis 0."""
    return jnp.concatenate(
        [head[None], jax.lax.slice_in_dim(x, 0, x.shape[0] - 1, axis=0)],
        axis=0,
    )


def _kernel(q_ref, t_ref, out_ref, yoko_ref, *, n, m, match, mismatch, gap):
    zero = jnp.zeros((SUB, LANE), jnp.int32)
    zero_c = jnp.zeros((CHUNK, SUB, LANE), jnp.int32)
    gap32 = jnp.int32(gap)
    match32 = jnp.int32(match)
    mm32 = jnp.int32(mismatch)

    yoko_ref[:] = jnp.zeros((m, SUB, LANE), jnp.int32)

    n_chunks = m // CHUNK
    n_rowgrps = n // ROWS

    def row_body(ig, best_c):
        ia = ig * ROWS
        qrow = [q_ref[ia + r][None] for r in range(ROWS)]  # [1, SUB, LANE]

        def chunk_body(jc, carry):
            hl, din, best_c = carry
            hl, din = list(hl), list(din)
            j0 = jc * CHUNK
            t = t_ref[pl.ds(j0, CHUNK)]  # [CHUNK, SUB, LANE]
            prev = yoko_ref[pl.ds(j0, CHUNK)]  # row ia-1 values

            pres = []
            for r in range(ROWS):
                diag = _shift_down(prev, din[r])
                # match/mismatch scoring without a profile (pads 4/5 never
                # equal anything -> mismatch; see module docstring)
                s = jnp.where(qrow[r] == t, match32, mm32)
                pre = jnp.maximum(diag + s, 0)
                # fused serial chain (vertical gap rides in the chain)
                h = hl[r]
                hs = []
                for k in range(CHUNK):
                    h = jnp.maximum(
                        _at(pre, k),
                        jnp.maximum(_at(prev, k), h) - gap32,
                    )
                    hs.append(h)
                hl[r] = h
                pres.append(pre)
                din[r] = _last(prev)  # next chunk's diag head, this row
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
    out_ref[0] = best_c.max(axis=0)


def _kernel_ends(q_ref, t_ref, bc_ref, yoko_ref, *, n, m, match, mismatch,
                 gap, rowbits):
    """Row-scan with endpoint tracking: per COLUMN keep one packed int32
    ``comb = pre * 2^rowbits - row`` (max comb == max pre with the
    smallest row — the per-column half of the row-major-first argmax
    rule; see semiglobal_batch.py's postmortem for why tracking must be
    per column). Columns are reduced on the XLA side: max comb, then min
    column. Packing halves the tracking VMEM and ops vs separate
    (value, row) buffers."""
    zero = jnp.zeros((SUB, LANE), jnp.int32)
    gap32 = jnp.int32(gap)
    match32 = jnp.int32(match)
    mm32 = jnp.int32(mismatch)
    K = jnp.int32(1 << rowbits)

    yoko_ref[:] = jnp.zeros((m, SUB, LANE), jnp.int32)
    bc_ref[0] = jnp.full((m, SUB, LANE), -(2**29), jnp.int32)

    n_chunks = m // CHUNK
    n_rowgrps = n // ROWS

    def row_body(ig, _):
        ia = ig * ROWS
        qrow = [q_ref[ia + r][None] for r in range(ROWS)]

        def chunk_body(jc, carry):
            hl, din = carry
            hl, din = list(hl), list(din)
            j0 = jc * CHUNK
            t = t_ref[pl.ds(j0, CHUNK)]
            prev = yoko_ref[pl.ds(j0, CHUNK)]
            bc = bc_ref[0, pl.ds(j0, CHUNK)]

            for r in range(ROWS):
                diag = _shift_down(prev, din[r])
                s = jnp.where(qrow[r] == t, match32, mm32)
                pre = jnp.maximum(diag + s, 0)
                h = hl[r]
                hs = []
                for k in range(CHUNK):
                    h = jnp.maximum(
                        _at(pre, k),
                        jnp.maximum(_at(prev, k), h) - gap32,
                    )
                    hs.append(h)
                hl[r] = h
                # every global-max cell satisfies H == pre (an H from a
                # gap implies a strictly larger predecessor), so argmax
                # over pre == argmax over H
                bc = jnp.maximum(bc, pre * K - jnp.int32(ia + r + 1))
                din[r] = _last(prev)
                prev = jnp.stack(hs)

            yoko_ref[pl.ds(j0, CHUNK)] = prev
            bc_ref[0, pl.ds(j0, CHUNK)] = bc
            return (tuple(hl), tuple(din))

        zeros = tuple(zero for _ in range(ROWS))
        jax.lax.fori_loop(0, n_chunks, chunk_body, (zeros, zeros))
        return 0

    jax.lax.fori_loop(0, n_rowgrps, row_body, 0)


@functools.partial(
    jax.jit, static_argnames=("n", "m", "match", "mismatch", "gap", "rowbits")
)
def _sw_batch_ends_impl(qsT, tsT, n, m, match, mismatch, gap, rowbits):
    T = qsT.shape[0] // n
    return pl.pallas_call(
        functools.partial(
            _kernel_ends, n=n, m=m, match=match, mismatch=mismatch, gap=gap,
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
        scratch_shapes=[pltpu.VMEM((m, SUB, LANE), jnp.int32)],
    )(qsT, tsT)


@functools.partial(jax.jit, static_argnames=("rowbits",))
def _reduce_comb(bc, rowbits):
    """[T, m, SUB, LANE] packed comb -> (score, end_i, end_j) [T*SUB*LANE]
    with the row-major-first rule: max value, then min row (packed), then
    min column (argmax of the first comb == vmax along the column axis)."""
    T, m = bc.shape[0], bc.shape[1]
    K = jnp.int32(1 << rowbits)
    vmax = bc.max(axis=1)
    jsel = jnp.argmax(bc == vmax[:, None], axis=1).astype(jnp.int32)
    pre = (vmax + K - 1) // K
    row = pre * K - vmax
    pos = pre > 0
    flat = lambda x: x.reshape(T * SUB * LANE)
    return (
        flat(jnp.maximum(pre, 0)),
        flat(jnp.where(pos, row, 0)),
        flat(jnp.where(pos, jsel + 1, 0)),
    )


def sw_batch_pallas_ends(qs, ts, params: ScoringParams):
    """Batched local scores + argmax endpoints (Pallas row-scan).

    Same contract as :func:`sw_batch_pallas` plus (end_i, end_j): the
    1-based coordinates of the first maximum in row-major scan order
    (≙ SmithWaterman_111_long's argmax, source.cpp:1545-1549); score 0
    maps to (0, 0). No transpose swap (it would change the scan order the
    tie-break is defined in), so n must satisfy the VMEM bound directly.
    """
    if not params.is_linear:
        raise NotImplementedError("affine tier: use sw_affine_pallas_ends")
    mm = _uniform_match_mismatch(params)
    if mm is None:
        raise NotImplementedError("general matrices: use the profile kernel")
    match, mismatch = mm
    if mismatch >= 0 or params.gap <= 0:
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
    rowbits = n.bit_length()  # 2^rowbits > n >= row index
    if max(match, 1) * min(n, m) >= (1 << (31 - rowbits)):
        raise NotImplementedError(
            "packed (value,row) tracking would overflow int32 at this "
            "score range; route to the XLA ends engine"
        )
    if n + 3 * m > 4096:
        # VMEM budget: q + (t, yoko, bc) tiles at 4 KB per unit length;
        # no transpose swap here (it would change the tie-break scan
        # order), so big shapes route to the XLA ends engine
        raise NotImplementedError("shape exceeds the ends kernel's VMEM")
    Bp = -(-B // TILE_PAIRS) * TILE_PAIRS
    if Bp != B:
        qs = jnp.concatenate([qs, jnp.full((Bp - B, n), Q_PAD, qs.dtype)])
        ts = jnp.concatenate([ts, jnp.full((Bp - B, m), T_PAD, ts.dtype)])
    qsT, tsT = _prepare(qs, ts, n, m)
    bc = _sw_batch_ends_impl(
        qsT, tsT, n, m, match, mismatch, int(params.gap), rowbits
    )
    score, ei, ej = _reduce_comb(bc, rowbits)
    return score[:B], ei[:B], ej[:B]


@functools.partial(
    jax.jit, static_argnames=("n", "m", "match", "mismatch", "gap")
)
def _sw_batch_pallas_impl(qsT, tsT, n, m, match, mismatch, gap):
    T = qsT.shape[0] // n
    return pl.pallas_call(
        functools.partial(
            _kernel, n=n, m=m, match=match, mismatch=mismatch, gap=gap
        ),
        out_shape=jax.ShapeDtypeStruct((T, SUB, LANE), jnp.int32),
        grid=(T,),
        in_specs=[
            pl.BlockSpec(
                (n, SUB, LANE),
                lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (m, SUB, LANE),
                lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, SUB, LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((m, SUB, LANE), jnp.int32)],
    )(qsT, tsT)


@functools.partial(jax.jit, static_argnames=("n", "m"))
def _prepare(qs, ts, n, m):
    """Build the tiled lane-major layouts on device."""
    B = qs.shape[0]
    T = B // TILE_PAIRS
    qsT = qs.reshape(T, SUB, LANE, n).transpose(0, 3, 1, 2).astype(jnp.int32)
    qsT = qsT.reshape(T * n, SUB, LANE)
    tsT = ts.reshape(T, SUB, LANE, m).transpose(0, 3, 1, 2).astype(jnp.int32)
    tsT = tsT.reshape(T * m, SUB, LANE)
    return qsT, tsT


def _uniform_match_mismatch(params: ScoringParams):
    """(match, mismatch) if the matrix is uniform, else None."""
    mat = params.matrix
    diag = np.diag(mat)
    off = mat[~np.eye(mat.shape[0], dtype=bool)]
    if (diag == diag[0]).all() and (off == off[0]).all():
        return int(diag[0]), int(off[0])
    return None


def sw_batch_pallas(qs, ts, params: ScoringParams):
    """Batched local-alignment scores via the Pallas row-scan kernel.

    qs: [B, n] uint8 (values 0-3, pad 4), ts: [B, m] uint8 (pad 5).
    Internally B pads to a multiple of 1024, n to a multiple of 8, m to a
    multiple of 16. Returns [B] int32 scores == swtpu.oracle.sw_score per
    pair.
    """
    if not params.is_linear:
        raise NotImplementedError("affine tier: use sw_affine_pallas")
    mm = _uniform_match_mismatch(params)
    if mm is None:
        raise NotImplementedError(
            "general 4x4 matrices currently route to the XLA engine"
        )
    match, mismatch = mm
    if mismatch >= 0 or params.gap <= 0:
        raise NotImplementedError(
            "pad-decay layout needs mismatch < 0 < gap; route to XLA engine"
        )
    B, n = qs.shape
    m = ts.shape[1]
    if m > 2048 >= n:
        # SW scores are symmetric under transposition (uniform matrix):
        # keep the VMEM-resident column axis on the shorter side. Pad
        # codes stay distinct after the swap (4 vs 5), so nothing else
        # changes.
        qs, ts = ts, qs
        n, m = m, n
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
    out = _sw_batch_pallas_impl(
        qsT, tsT, n, m, match, mismatch, int(params.gap)
    )
    return out.reshape(Bp)[:B]
