"""XLA (lax.scan) batched Smith-Waterman — the portable reference engine.

TPU-first design notes
----------------------
The reference's fastest family is the *inter-sequence batch* kernel
(source.cpp:1227-1522): make the batch the vector axis so every lane does
useful work and no shuffles appear in the inner loop. This engine keeps that
insight but schedules the DP over **anti-diagonals** (no intra-step
dependency at all), which XLA compiles to a clean `scan` of full-width VPU
ops: carries are two [B, n+1] diagonals + the running best, all static
shapes, no data-dependent control flow.

Out-of-matrix ("phantom") cells are never masked: query is padded with char
4, target with char 5, and the extended substitution table scores any pad
involvement at -2^20, so phantom cells are always ≤ some real cell's value
and can never win the running max. This also gives variable-length batches
for free: pad each sequence to the block length and the result is exactly
the per-pair score of the unpadded problem.

Semantics ≙ ``SmithWaterman`` (source.cpp:35-60): linear gap, zero floor,
score = max over all cells.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from swtpu.core.scoring import ScoringParams

#: Pad codes: queries pad with alphabet_size, targets with alphabet_size+1
#: (DNA: 4/5, protein: 24/25) — never equal, and both outside the real
#: alphabet, so padded positions can only lose.
Q_PAD = 4
T_PAD = 5
_NEG = -(2**20)


def pad_codes(params: ScoringParams):
    """(query_pad, target_pad) for this alphabet."""
    A = params.alphabet_size
    return A, A + 1


def _extended_table(params: ScoringParams) -> np.ndarray:
    """[stride, stride] int32 substitution table; stride is 8 for DNA-sized
    alphabets, 32 for protein; any index ≥ alphabet scores _NEG."""
    A = params.alphabet_size
    stride = 8 if A <= 6 else 32
    if A + 2 > stride:
        raise NotImplementedError(f"alphabet of {A} letters unsupported")
    ext = np.full((stride, stride), _NEG, dtype=np.int32)
    ext[:A, :A] = params.matrix
    return ext


def select_scores(prof, codes, n_codes, init=None):
    """s[...] = prof[..., codes[...]] via an n_codes-way select tree.

    Gathers of ~1e5 indices from a tiny table are pathologically slow on
    TPU (the sw_profile.py finding; measured 2x whole-engine speedup over
    the flat-table gather); selects fuse into the surrounding DP. `codes`
    must broadcast against prof[..., c]; codes >= n_codes (clamped pads /
    ghost slots) fall through to `init` (default: all-NEG, exact whenever
    every extended-table column past the alphabet is all-NEG). Shared by
    the diag engines, colscan, and the longpair tile scan."""
    if init is None:
        shape = jnp.broadcast_shapes(codes.shape, prof.shape[:-1])
        init = jnp.full(shape, jnp.int32(_NEG))
    s = init
    for c in range(n_codes):
        s = jnp.where(codes == c, prof[..., c], s)
    return s


# historical name used by the diag engines ([B, n] codes shape)
_prof_scores = select_scores


@functools.partial(jax.jit, static_argnames=("gap", "n_codes"))
def _sw_batch_diag_impl(qs, ts, table, gap, n_codes=8):
    B, n = qs.shape
    m = ts.shape[1]
    stride = table.shape[0]
    q_pad, t_pad = stride - 2, stride - 1  # safe out-of-alphabet codes
    qs = jnp.minimum(qs.astype(jnp.int32), q_pad)
    ts = jnp.minimum(ts.astype(jnp.int32), t_pad)

    # q characters aligned with the diagonal vector index i in [0, n]:
    # slot i holds q[i-1]; slot 0 is pad (boundary row).
    q_slot = jnp.pad(qs, ((0, 0), (1, 0)), constant_values=q_pad)  # [B, n+1]
    # reversed target padded so that for diagonal d the chars t[d-i-1] for
    # i in [0, n] are the contiguous window ts_rev_pad[:, m - d + n + i - n]
    # → dynamic_slice at offset (m - d + n), length n+1, always in bounds.
    ts_rev = ts[:, ::-1]
    ts_rev_pad = jnp.pad(
        ts_rev, ((0, 0), (n + 1, n + 1)), constant_values=t_pad
    )  # [B, m + 2n + 2]

    prof = table[q_slot]  # [B, n+1, stride] per-slot profile

    def step(carry, d):
        prev1, prev2, best = carry
        # chars of t on diagonal d, aligned with slot i: t[d - i - 1]
        off = m - d + n + 1
        t_diag = jax.lax.dynamic_slice_in_dim(ts_rev_pad, off, n + 1, axis=1)
        s = _prof_scores(prof, t_diag, n_codes)
        shift1 = lambda x: jnp.pad(x, ((0, 0), (1, 0)))[:, :-1]
        cur = jnp.maximum(
            jnp.maximum(shift1(prev2) + s, shift1(prev1) - gap),
            jnp.maximum(prev1 - gap, 0),
        )
        best = jnp.maximum(best, cur.max(axis=1))
        return (cur, prev1, best), None

    prev = jnp.zeros((B, n + 1), dtype=jnp.int32)
    best0 = jnp.zeros((B,), dtype=jnp.int32)
    ds = jnp.arange(2, n + m + 1)
    (c1, c2, best), _ = jax.lax.scan(step, (prev, prev, best0), ds)
    return best


def sw_batch_diag(qs, ts, params: ScoringParams):
    """Batched local-alignment scores on device.

    qs: [B, n] uint8 (pad with 4), ts: [B, m] uint8 (pad with 5).
    Returns [B] int32 scores, bit-equal to :func:`swtpu.oracle.sw_score` on
    each (unpadded) pair.
    """
    table = jnp.asarray(_extended_table(params))
    return _sw_batch_diag_impl(
        qs, ts, table, int(params.gap), n_codes=params.alphabet_size + 2
    )


@functools.partial(jax.jit, static_argnames=("gap", "n_codes"))
def _sw_batch_diag_ends_impl(qs, ts, table, gap, n_codes=8):
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
    rows = jnp.arange(n + 1, dtype=jnp.int32)[None, :]  # slot i == row i
    big = jnp.int32(1 << 30)

    def step(carry, d):
        prev1, prev2, best, bi, bj = carry
        off = m - d + n + 1
        t_diag = jax.lax.dynamic_slice_in_dim(ts_rev_pad, off, n + 1, axis=1)
        s = _prof_scores(prof, t_diag, n_codes)
        shift1 = lambda x: jnp.pad(x, ((0, 0), (1, 0)))[:, :-1]
        cur = jnp.maximum(
            jnp.maximum(shift1(prev2) + s, shift1(prev1) - gap),
            jnp.maximum(prev1 - gap, 0),
        )
        # Endpoint with the oracle's tie-break (first max in row-major
        # scan order, oracle/sw.py:134): within this diagonal ties pick
        # the smallest row; across diagonals replace only on a strictly
        # greater value OR an equal value at a strictly smaller row
        # (equal value + equal row across different diagonals means a
        # larger column — keep the earlier one).
        vmax = cur.max(axis=1)
        i_at = jnp.where(cur == vmax[:, None], rows, big).min(axis=1)
        upd = (vmax > best) | ((vmax == best) & (i_at < bi))
        best = jnp.where(upd, vmax, best)
        bi = jnp.where(upd, i_at, bi)
        bj = jnp.where(upd, d - i_at, bj)
        return (cur, prev1, best, bi, bj), None

    prev = jnp.zeros((B, n + 1), dtype=jnp.int32)
    zero1 = jnp.zeros((B,), dtype=jnp.int32)
    ds = jnp.arange(2, n + m + 1)
    (c1, c2, best, bi, bj), _ = jax.lax.scan(
        step, (prev, prev, zero1, zero1, zero1), ds
    )
    # score 0 => the oracle argmax is the (0, 0) boundary cell
    pos = best > 0
    return best, jnp.where(pos, bi, 0), jnp.where(pos, bj, 0)


def sw_batch_diag_ends(qs, ts, params: ScoringParams):
    """Batched local scores + argmax endpoints on device.

    Returns (score, end_i, end_j) int32 [B]: the score and the 1-based DP
    coordinates of the first maximum in row-major scan order — exactly
    ``oracle.sw.sw_traceback``'s argmax cell (≙ SmithWaterman_111_long's
    strict-'<' update, source.cpp:1545-1549). Score 0 maps to (0, 0).
    """
    table = jnp.asarray(_extended_table(params))
    return _sw_batch_diag_ends_impl(
        jnp.asarray(qs), jnp.asarray(ts), table, int(params.gap),
        n_codes=params.alphabet_size + 2,
    )
