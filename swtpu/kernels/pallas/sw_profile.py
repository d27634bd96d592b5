"""Pallas batched Smith-Waterman with a packed query profile: the general-
matrix tier (arbitrary 4x4 DNA matrices, protein/BLOSUM62, any alphabet to
~30 letters).

The uniform-scoring flagship (sw_batch.py) scores with one compare+select;
a general substitution matrix needs a per-cell lookup s = M[q_i, t_j] — the
reference does this 16 cells at a time with ``pshufb`` on a bias-127 LUT
(source.cpp:119-121, 145-146). The TPU has no per-lane byte shuffle across
a table, so this kernel rebuilds the idiom from two TPU-native pieces:

1. **Query profile** (the Farrar idiom, README.md:15 citation): precompute
   prof[i] = M[q_i, :] per query row on the XLA side, so the kernel-side
   lookup is indexed by t only.
2. **Byte packing + variable shift**: the profile row is packed 4 int8
   scores per int32 "plane" (plane g holds scores for t in [4g, 4g+4)).
   Per cell the kernel selects the plane with a log-depth select tree on
   t>>2 (masks hoisted chunk-wide, shared across all 8 unrolled rows) and
   extracts the byte with a variable vector shift by (t&3)*8 — Mosaic
   lowers shift-by-vector natively on v5e (probed).

   DNA (6 codes incl. pads) = 2 planes -> 1 select; protein (26 codes) =
   7 planes -> 6 selects. Extraction is 4 ops (shift, mask, sign-extend).

Everything else (fused serial chain, max(H) == max(pre) best tracking,
8-row unroll, (8,128)-tile batch layout) matches sw_batch.py.

Pad scores are -128 (the int8 floor): with gap > 0, padded/phantom cells
can only decay from real cells and never raise the max — general matrices
with positive off-diagonal entries (BLOSUM) stay exact because the pad
argument only constrains pad-involved cells.
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
    ROWS,
    SUB,
    TILE_PAIRS,
    _at,
    _last,
    _shift_down,
)

PAD_SCORE = -128



def pack_score_rows(matrix, pad_score) -> np.ndarray:
    """[Ae, planes] int32: row q holds the extended substitution row for
    q, packed 4 int8 scores per int32 (little-endian byte b = t code
    4g+b). Ae = alphabet + 2 pad codes; pad rows/cols score pad_score.
    Shared by the profile kernels (pad_score=PAD_SCORE) and the banded
    baked-table mode (pad_score=matrix.min(), the banded pad contract)."""
    matrix = np.asarray(matrix, dtype=np.int32)
    if matrix.min() < -127 or matrix.max() > 127:
        raise NotImplementedError(
            "packed score tables need scores in [-127, 127]"
        )
    A = matrix.shape[0]
    Ae = A + 2
    planes = -(-Ae // 4)
    ext = np.full((Ae, planes * 4), int(pad_score), dtype=np.int32)
    ext[:A, :A] = matrix
    b = (ext & 0xFF).astype(np.uint32)
    packed = (
        b[:, 0::4] | (b[:, 1::4] << 8) | (b[:, 2::4] << 16)
        | (b[:, 3::4] << 24)
    )
    return packed.view(np.int32)


def _packed_table(params: ScoringParams) -> np.ndarray:
    return pack_score_rows(params.matrix, PAD_SCORE)


NEG_EF = -(2**29)  # E/F "minus infinity" for the affine chain


def plane_lookup(planes_vals, bits, sh):
    """Select the packed plane by the t>>2 bits (log-depth select tree,
    odd tails carried down a level), then extract byte (t&3) via a
    variable vector shift + sign-extend. Shared by every packed-profile
    kernel (local + semi-global)."""
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


def _kernel(
    prof_ref, t_ref, out_ref, yoko_ref, *rest, rg, m, planes, gap,
    go=None, ge=None, rowbits=None,
):
    affine = go is not None
    ends = rowbits is not None
    if affine:
        (yf_ref,) = rest
        go32, ge32 = jnp.int32(go), jnp.int32(ge)
        negs = jnp.full((SUB, LANE), NEG_EF, jnp.int32)
    zero = jnp.zeros((SUB, LANE), jnp.int32)
    zero_c = jnp.zeros((CHUNK, SUB, LANE), jnp.int32)
    gap32 = jnp.int32(gap)
    if ends:
        K = jnp.int32(1 << rowbits)

    # the row-group grid axis streams the profile: the row boundary
    # (yoko) and the running best persist in scratch/output across grid
    # steps of the same tile (TPU grids run sequentially, minor-most
    # axis fastest)
    g_id = pl.program_id(1)

    @pl.when(g_id == 0)
    def _():
        yoko_ref[:] = jnp.zeros((m, SUB, LANE), jnp.int32)
        if affine:
            yf_ref[:] = jnp.full((m, SUB, LANE), NEG_EF, jnp.int32)
        if ends:
            out_ref[0] = jnp.full((m, SUB, LANE), NEG_EF, jnp.int32)

    n_chunks = m // CHUNK
    n_rowgrps = rg // ROWS

    lookup = plane_lookup

    def serial_chain_affine(pre, h_left, e_left):
        # Gotoh E joins H in the serial chain (see sw_affine.py):
        #   e_k = max(e_{k-1} - ext, h_{k-1} - open); h_k = max(pre_k, e_k)
        hs = []
        h, e = h_left, e_left
        for k in range(CHUNK):
            e = jnp.maximum(e - ge32, h - go32)
            h = jnp.maximum(_at(pre, k), e)
            hs.append(h)
        return jnp.stack(hs), h, e

    def row_body(ig, carry):
        best_c = carry[0] if affine else carry
        ia = ig * ROWS
        prow = [
            [prof_ref[ia + r, g][None] for g in range(planes)]
            for r in range(ROWS)
        ]

        def chunk_body(jc, carry):
            if affine:
                hl, el, din, best_c = carry
                hl, el, din = list(hl), list(el), list(din)
            else:
                hl, din, best_c = carry
                hl, din = list(hl), list(din)
            j0 = jc * CHUNK
            t = t_ref[pl.ds(j0, CHUNK)]  # [CHUNK, SUB, LANE]
            prev = yoko_ref[pl.ds(j0, CHUNK)]
            if affine:
                prev_f = yf_ref[pl.ds(j0, CHUNK)]
            if ends:
                bc = out_ref[0, pl.ds(j0, CHUNK)]

            # hoisted once per chunk, shared by all ROWS rows
            sh = (t & 3) << 3
            tp = t >> 2
            n_bits = max(1, (planes - 1).bit_length())
            bits = [(tp & (1 << k)) != 0 for k in range(n_bits)]

            pres = []
            for r in range(ROWS):
                diag = _shift_down(prev, din[r])
                s = lookup(prow[r], bits, sh)
                if affine:
                    f = jnp.maximum(prev_f - ge32, prev - go32)
                    pre = jnp.maximum(jnp.maximum(diag + s, f), 0)
                    new, hl[r], el[r] = serial_chain_affine(
                        pre, hl[r], el[r]
                    )
                    din[r] = _last(prev)
                    prev, prev_f = new, f
                else:
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
                    din[r] = _last(prev)
                    prev = jnp.stack(hs)
                if ends:
                    # absolute row = streamed row-group base + local row;
                    # max-cell H == pre argument as in sw_batch/_affine
                    bc = jnp.maximum(
                        bc, pre * K - (g_id * rg + jnp.int32(ia + r + 1))
                    )
                else:
                    pres.append(pre)

            yoko_ref[pl.ds(j0, CHUNK)] = prev
            if affine:
                yf_ref[pl.ds(j0, CHUNK)] = prev_f
            if ends:
                out_ref[0, pl.ds(j0, CHUNK)] = bc
                if affine:
                    return (tuple(hl), tuple(el), tuple(din), best_c)
                return (tuple(hl), tuple(din), best_c)
            acc = pres[0]
            for r in range(1, ROWS):
                acc = jnp.maximum(acc, pres[r])
            best_c = jnp.maximum(best_c, acc)
            if affine:
                return (tuple(hl), tuple(el), tuple(din), best_c)
            return (tuple(hl), tuple(din), best_c)

        zeros = tuple(zero for _ in range(ROWS))
        if affine:
            negss = tuple(negs for _ in range(ROWS))
            out = jax.lax.fori_loop(
                0, n_chunks, chunk_body, (zeros, negss, zeros, best_c)
            )
            return (out[-1],)
        _, _, best_c = jax.lax.fori_loop(
            0, n_chunks, chunk_body, (zeros, zeros, best_c)
        )
        return best_c

    if affine:
        (best_c,) = jax.lax.fori_loop(0, n_rowgrps, row_body, (zero_c,))
    else:
        best_c = jax.lax.fori_loop(0, n_rowgrps, row_body, zero_c)
    if ends:
        return
    best = best_c.max(axis=0)

    @pl.when(g_id == 0)
    def _():
        out_ref[0] = best

    @pl.when(g_id != 0)
    def _():
        out_ref[0] = jnp.maximum(out_ref[0], best)


#: rows of profile resident per grid step; longer queries stream through
#: the row-group grid axis
ROW_GROUP = 64

#: raised scoped-VMEM limit (bytes). The row-boundary scratch and the
#: double-buffered ts/profile blocks all scale with m, so long targets
#: (e.g. the SwissProt workload's 800-residue proteins) brush past the
#: 16 MB default — observed as a compile-time "scoped vmem" OOM 8 KB
#: over the limit. v5e has 128 MB of physical VMEM; raising the limit
#: is free for shapes that fit the default (allocation is by need).
VMEM_LIMIT = 96 * 1024 * 1024


@functools.partial(
    jax.jit, static_argnames=("n", "m", "planes", "gap", "go", "ge")
)
def _sw_profile_impl(profT, tsT, n, m, planes, gap, go=None, ge=None):
    T = tsT.shape[0] // m
    rg = min(n, ROW_GROUP)
    G = n // rg
    scratch = [pltpu.VMEM((m, SUB, LANE), jnp.int32)]
    if go is not None:
        scratch.append(pltpu.VMEM((m, SUB, LANE), jnp.int32))  # F boundary
    return pl.pallas_call(
        functools.partial(
            _kernel, rg=rg, m=m, planes=planes, gap=gap, go=go, ge=ge
        ),
        out_shape=jax.ShapeDtypeStruct((T, SUB, LANE), jnp.int32),
        grid=(T, G),
        in_specs=[
            pl.BlockSpec(
                (rg, planes, SUB, LANE),
                lambda i, g: (i * (n // rg) + g, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (m, SUB, LANE),
                lambda i, g: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, SUB, LANE), lambda i, g: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
    )(profT, tsT)


@functools.partial(jax.jit, static_argnames=("n", "m", "planes"))
def _prepare_profile(qs, ts, packed_tab, n, m, planes):
    """Device-side profile build + tile layouts.

    The row lookup is a compare-select chain over the <=26 table rows, not
    a gather — TPU gathers of millions of indices from a tiny table are
    pathologically slow (measured 10+ ms for what the chain does in <1 ms).
    """
    B = qs.shape[0]
    T = B // TILE_PAIRS
    q32 = qs.astype(jnp.int32)[..., None]  # [B, n, 1]
    prof = jnp.zeros((B, n, planes), jnp.int32)
    for a in range(packed_tab.shape[0]):
        prof = jnp.where(q32 == a, packed_tab[a], prof)  # [B,n,planes]
    profT = (
        prof.reshape(T, SUB, LANE, n, planes)
        .transpose(0, 3, 4, 1, 2)
        .reshape(T * n, planes, SUB, LANE)
    )
    tsT = (
        ts.reshape(T, SUB, LANE, m)
        .transpose(0, 3, 1, 2)
        .astype(jnp.int32)
        .reshape(T * m, SUB, LANE)
    )
    return profT, tsT


@functools.partial(
    jax.jit,
    static_argnames=("n", "m", "planes", "gap", "go", "ge", "rowbits"),
)
def _sw_profile_ends_impl(profT, tsT, n, m, planes, gap, rowbits,
                          go=None, ge=None):
    T = tsT.shape[0] // m
    rg = min(n, ROW_GROUP)
    G = n // rg
    scratch = [pltpu.VMEM((m, SUB, LANE), jnp.int32)]
    if go is not None:
        scratch.append(pltpu.VMEM((m, SUB, LANE), jnp.int32))
    return pl.pallas_call(
        functools.partial(
            _kernel, rg=rg, m=m, planes=planes, gap=gap, go=go, ge=ge,
            rowbits=rowbits,
        ),
        out_shape=jax.ShapeDtypeStruct((T, m, SUB, LANE), jnp.int32),
        grid=(T, G),
        in_specs=[
            pl.BlockSpec(
                (rg, planes, SUB, LANE),
                lambda i, g: (i * (n // rg) + g, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (m, SUB, LANE),
                lambda i, g: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, m, SUB, LANE),
            lambda i, g: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
    )(profT, tsT)


def sw_batch_profile_pallas_ends(qs, ts, params: ScoringParams):
    """Batched general-matrix local scores + argmax endpoints (linear or
    affine). Same contract as :func:`sw_batch_profile_pallas` plus
    (end_i, end_j) under the row-major-first argmax rule; score 0 maps to
    (0, 0). No transpose swap (would change the tie-break scan order)."""
    from swtpu.kernels.pallas.sw_batch import _reduce_comb

    affine = not params.is_linear
    gap = int(params.gap_extend if affine else params.gap)
    if gap <= 0 or (affine and params.gap_open <= 0):
        raise NotImplementedError("pad-decay layout needs gap > 0")
    A = params.alphabet_size
    B, n = qs.shape
    m = ts.shape[1]
    packed_tab = _packed_table(params)
    planes = packed_tab.shape[1]
    q_pad, t_pad = A, A + 1
    qs = jnp.asarray(qs)
    ts = jnp.asarray(ts)
    step = ROWS if n <= ROW_GROUP else ROW_GROUP
    if n % step:
        qs = jnp.concatenate(
            [qs, jnp.full((B, step - n % step), q_pad, qs.dtype)], axis=1
        )
        n = qs.shape[1]
    mp = -(-m // CHUNK) * CHUNK
    if mp != m:
        ts = jnp.concatenate(
            [ts, jnp.full((B, mp - m), t_pad, ts.dtype)], axis=1
        )
        m = mp
    rowbits = n.bit_length()
    if max(int(params.matrix.max()), 1) * min(n, m) >= (1 << (31 - rowbits)):
        raise NotImplementedError(
            "packed (value,row) tracking would overflow int32; route to "
            "the XLA ends engine"
        )
    # VMEM budget: resident profile rows (planes per row) + t/yoko/bc
    # (+ yf when affine) m-sized tiles at 4 KB per unit length
    resident = min(n, ROW_GROUP) * planes
    if resident + (4 if affine else 3) * m > 4096:
        raise NotImplementedError("shape exceeds the ends kernel's VMEM")
    Bp = -(-B // TILE_PAIRS) * TILE_PAIRS
    if Bp != B:
        qs = jnp.concatenate([qs, jnp.full((Bp - B, n), q_pad, qs.dtype)])
        ts = jnp.concatenate([ts, jnp.full((Bp - B, m), t_pad, ts.dtype)])
    profT, tsT = _prepare_profile(
        qs, ts, jnp.asarray(packed_tab), n, m, planes
    )
    bc = _sw_profile_ends_impl(
        profT, tsT, n, m, planes, gap, rowbits,
        go=int(params.gap_open) if affine else None,
        ge=int(params.gap_extend) if affine else None,
    )
    score, ei, ej = _reduce_comb(bc, rowbits)
    return score[:B], ei[:B], ej[:B]


def sw_batch_profile_pallas(qs, ts, params: ScoringParams):
    """Batched local-alignment scores for general substitution matrices,
    linear or affine (Gotoh) gaps — the production protein configuration
    (BLOSUM62 + open/extend) runs here.

    qs: [B, n] uint8 codes 0..A-1 (pad A), ts: [B, m] uint8 (pad A+1),
    where A = params.alphabet_size (4 for DNA, 24 for protein). Internally
    B pads to a multiple of 1024, n to a multiple of 8 (64 when n > 64:
    long queries stream through a row-group grid so the resident profile
    stays small), m to a multiple of 16. Returns [B] int32 scores ==
    swtpu.oracle.sw_score (linear) / sw_affine_score (affine) per pair.
    """
    affine = not params.is_linear
    gap = int(params.gap_extend if affine else params.gap)
    if gap <= 0:
        raise NotImplementedError("pad-decay layout needs gap > 0")
    A = params.alphabet_size
    B, n = qs.shape
    m = ts.shape[1]
    if m > 2048 >= n:
        # symmetric under transposition with the transposed matrix (affine
        # included: transposing swaps the E/F roles but not the score);
        # keeps the VMEM-resident target/boundary buffers on the shorter
        # side. The packed table covers both pad codes, so swapped pads
        # (A+1 on the query side, A on the target side) still score
        # PAD_SCORE.
        return sw_batch_profile_pallas(
            ts,
            qs,
            ScoringParams(
                params.matrix.T,
                gap_open=params.gap_open,
                gap_extend=params.gap_extend,
            ),
        )
    packed_tab = _packed_table(params)
    planes = packed_tab.shape[1]
    q_pad, t_pad = A, A + 1
    qs = jnp.asarray(qs)
    ts = jnp.asarray(ts)
    step = ROWS if n <= ROW_GROUP else ROW_GROUP
    if n % step:
        qs = jnp.concatenate(
            [qs, jnp.full((B, step - n % step), q_pad, qs.dtype)], axis=1
        )
        n = qs.shape[1]
    mp = -(-m // CHUNK) * CHUNK
    if mp != m:
        ts = jnp.concatenate(
            [ts, jnp.full((B, mp - m), t_pad, ts.dtype)], axis=1
        )
        m = mp
    Bp = -(-B // TILE_PAIRS) * TILE_PAIRS
    if Bp != B:
        qs = jnp.concatenate([qs, jnp.full((Bp - B, n), q_pad, qs.dtype)])
        ts = jnp.concatenate([ts, jnp.full((Bp - B, m), t_pad, ts.dtype)])
    profT, tsT = _prepare_profile(
        qs, ts, jnp.asarray(packed_tab), n, m, planes
    )
    out = _sw_profile_impl(
        profT,
        tsT,
        n,
        m,
        planes,
        gap,
        go=int(params.gap_open) if affine else None,
        ge=int(params.gap_extend) if affine else None,
    )
    return out.reshape(Bp)[:B]
