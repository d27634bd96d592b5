"""Column-parallel SW schedule: the TPU-native Farrar-striped equivalent.

Farrar's striped SIMD SW (cited by the reference, README.md:15) vectorizes
one pair across the query and fixes the intra-column vertical-gap chain
with a data-dependent "lazy-F" correction loop. On TPU the same chain has
a closed form: within a target column,

    H[p] = max(pre[p], H[p-1] - gap)
         = max_{q <= p} ( pre[q] - (p - q) * gap )

is a max-plus prefix scan with linear decay — an *associative* operation —
so log2(n) doubling steps compute the exact column, no lazy loop, no
data-dependent control flow (cf. "De(con)struction of the lazy-F loop",
arXiv:1909.00899, referenced in PAPERS.md). The outer scan walks target
positions; the whole query column is live in vector registers.

TPU implementation notes (measured on v5e):
- the prefix scan is hand-rolled log-doubling over STATIC pad/slice
  shifts (`x[k] = max(x[k], x[k - 2^s] - 2^s * gap)`) instead of
  jax.lax.associative_scan, whose odd/even split lowering spends ~100x
  the time in relayout slices at these shapes;
- per-column substitution scores come from a per-pair query profile +
  an alphabet select tree instead of a flat-table gather (gathers of
  ~1e5 indices from a tiny table are pathologically slow on TPU — the
  same finding as sw_profile.py's packed-profile design).

This is ladder member #5 (ops/variants "colscan"): same scores as every
other schedule, different parallelization axis — the one to use when the
batch is small but the query is long.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from swtpu.core.scoring import ScoringParams
from swtpu.kernels.xla.sw_scan import _extended_table, select_scores

NEG = -(2**29)


def _profile(qs, table, stride):
    """prof[b, i, c] = S[q_b[i], c] (c over the extended alphabet)."""
    q_pad = stride - 2
    return table[jnp.minimum(qs.astype(jnp.int32), q_pad)]  # [B, n, stride]


def _maxplus_prefix(pre, gap, n):
    """H[p] = max_{q <= p}(pre[q] - (p - q) * gap) by log-doubling over
    static shifts."""
    x = pre
    shift = 1
    while shift < n:
        shifted = jnp.pad(
            x, ((0, 0), (shift, 0)), constant_values=NEG
        )[:, :-shift]
        x = jnp.maximum(x, shifted - shift * gap)
        shift *= 2
    return x


@functools.partial(jax.jit, static_argnames=("gap", "A"))
def _colscan_impl(qs, ts, table, gap, A):
    B, n = qs.shape
    m = ts.shape[1]
    stride = table.shape[0]
    t_pad = stride - 1
    ts = jnp.minimum(ts.astype(jnp.int32), t_pad)
    prof = _profile(qs, table, stride)

    def step(carry, j):
        h_prev, best = carry  # previous column H[:, j-1] over query axis
        t_col = jax.lax.dynamic_slice_in_dim(ts, j, 1, axis=1)  # [B, 1]
        s = select_scores(prof, t_col, A)  # [B, n] (pads fall through to NEG)
        diag = jnp.pad(h_prev, ((0, 0), (1, 0)))[:, :-1]
        pre = jnp.maximum(jnp.maximum(diag + s, h_prev - gap), 0)
        # exact vertical-gap propagation: max-plus prefix scan down the query
        h = jnp.maximum(_maxplus_prefix(pre, gap, n), 0)
        best = jnp.maximum(best, h.max(axis=1))
        return (h, best), None

    h0 = jnp.zeros((B, n), jnp.int32)
    (h, best), _ = jax.lax.scan(
        step, (h0, jnp.zeros((B,), jnp.int32)), jnp.arange(m)
    )
    return best


@functools.partial(jax.jit, static_argnames=("go", "ge", "A"))
def _colscan_affine_impl(qs, ts, table, go, ge, A):
    """Gotoh column scan. With go >= ge the vertical F chain decouples:

        F[p] = max(F[p-1] - ge, H[p-1] - go)
             = max_{q <= p-1} (pre[q] - go - (p-1-q) * ge)

    (the F[p-1]-go term is dominated by F[p-1]-ge), i.e. the same
    max-plus prefix scan as the linear engine over pre - go with decay
    ge, shifted down one — Farrar's lazy-F loop for affine gaps, exactly,
    in log depth. E is element-wise from the previous column.
    """
    B, n = qs.shape
    m = ts.shape[1]
    stride = table.shape[0]
    t_pad = stride - 1
    ts = jnp.minimum(ts.astype(jnp.int32), t_pad)
    prof = _profile(qs, table, stride)

    def step(carry, j):
        h_prev, e_prev, best = carry
        t_col = jax.lax.dynamic_slice_in_dim(ts, j, 1, axis=1)
        s = select_scores(prof, t_col, A)
        e = jnp.maximum(e_prev - ge, h_prev - go)
        diag = jnp.pad(h_prev, ((0, 0), (1, 0)))[:, :-1]
        pre = jnp.maximum(jnp.maximum(diag + s, e), 0)
        fscan = _maxplus_prefix(pre - go, ge, n)
        f = jnp.pad(fscan, ((0, 0), (1, 0)), constant_values=NEG)[:, :-1]
        h = jnp.maximum(pre, f)
        best = jnp.maximum(best, h.max(axis=1))
        return (h, e, best), None

    h0 = jnp.zeros((B, n), jnp.int32)
    e0 = jnp.full((B, n), NEG, jnp.int32)
    (h, e, best), _ = jax.lax.scan(
        step, (h0, e0, jnp.zeros((B,), jnp.int32)), jnp.arange(m)
    )
    return best


def sw_batch_colscan(qs, ts, params: ScoringParams):
    """Batched SW scores, column-parallel schedule, linear or affine.

    Same contract as sw_batch_diag (pads q:A, t:A+1; variable length
    free). Affine needs gap_open >= gap_extend (the F-chain decoupling).
    """
    table = jnp.asarray(_extended_table(params))
    A = params.alphabet_size
    if not params.is_linear:
        if params.gap_open < params.gap_extend:
            raise NotImplementedError(
                "colscan affine needs gap_open >= gap_extend"
            )
        return _colscan_affine_impl(
            jnp.asarray(qs),
            jnp.asarray(ts),
            table,
            int(params.gap_open),
            int(params.gap_extend),
            A,
        )
    return _colscan_impl(
        jnp.asarray(qs), jnp.asarray(ts), table, int(params.gap), A
    )
