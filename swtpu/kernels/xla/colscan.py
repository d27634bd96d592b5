"""Column-parallel SW schedule: the TPU-native Farrar-striped equivalent.

Farrar's striped SIMD SW (cited by the reference, README.md:15) vectorizes
one pair across the query and fixes the intra-column vertical-gap chain
with a data-dependent "lazy-F" correction loop. On TPU the same chain has
a closed form: within a target column,

    H[p] = max(pre[p], H[p-1] - gap)
         = max_{q <= p} ( pre[q] - (p - q) * gap )

is a max-plus prefix scan with linear decay — an *associative* operation
((v1,l1) ⊕ (v2,l2) = (max(v2, v1 - l2*gap), l1+l2)) — so
jax.lax.associative_scan computes the exact column in log2(n) vector steps,
no lazy loop, no data-dependent control flow (cf. "De(con)struction of the
lazy-F loop", arXiv:1909.00899, referenced in PAPERS.md). The outer scan
walks target positions; the whole query column is live in vector registers.

This is ladder member #5 (ops/variants "colscan"): same scores as every
other schedule, different parallelization axis — the one to use when the
batch is small but the query is long.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from swtpu.core.scoring import ScoringParams
from swtpu.kernels.xla.sw_scan import _extended_table


@functools.partial(jax.jit, static_argnames=("gap",))
def _colscan_impl(qs, ts, table, gap):
    B, n = qs.shape
    m = ts.shape[1]
    stride = table.shape[0]
    q_pad, t_pad = stride - 2, stride - 1
    qs = jnp.minimum(qs.astype(jnp.int32), q_pad)
    ts = jnp.minimum(ts.astype(jnp.int32), t_pad)
    flat = table.reshape(-1)
    qi = qs * stride  # row offsets into the flat table, fixed per pair

    def combine(a, b):
        (v1, l1), (v2, l2) = a, b
        return (jnp.maximum(v2, v1 - l2 * gap), l1 + l2)

    ones = jnp.ones((B, n), jnp.int32)

    def step(carry, j):
        h_prev, best = carry  # previous column H[:, j-1] over query axis
        t_col = jax.lax.dynamic_slice_in_dim(ts, j, 1, axis=1)  # [B, 1]
        s = jnp.take(flat, qi + t_col, axis=0)  # [B, n]
        diag = jnp.pad(h_prev, ((0, 0), (1, 0)))[:, :-1]
        pre = jnp.maximum(jnp.maximum(diag + s, h_prev - gap), 0)
        # exact vertical-gap propagation: max-plus prefix scan down the query
        h, _ = jax.lax.associative_scan(combine, (pre, ones), axis=1)
        h = jnp.maximum(h, 0)
        best = jnp.maximum(best, h.max(axis=1))
        return (h, best), None

    h0 = jnp.zeros((B, n), jnp.int32)
    (h, best), _ = jax.lax.scan(
        step, (h0, jnp.zeros((B,), jnp.int32)), jnp.arange(m)
    )
    return best


NEG = -(2**29)


@functools.partial(jax.jit, static_argnames=("go", "ge"))
def _colscan_affine_impl(qs, ts, table, go, ge):
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
    q_pad, t_pad = stride - 2, stride - 1
    qs = jnp.minimum(qs.astype(jnp.int32), q_pad)
    ts = jnp.minimum(ts.astype(jnp.int32), t_pad)
    flat = table.reshape(-1)
    qi = qs * stride

    def combine(a, b):
        (v1, l1), (v2, l2) = a, b
        return (jnp.maximum(v2, v1 - l2 * ge), l1 + l2)

    ones = jnp.ones((B, n), jnp.int32)

    def step(carry, j):
        h_prev, e_prev, best = carry
        t_col = jax.lax.dynamic_slice_in_dim(ts, j, 1, axis=1)
        s = jnp.take(flat, qi + t_col, axis=0)
        e = jnp.maximum(e_prev - ge, h_prev - go)
        diag = jnp.pad(h_prev, ((0, 0), (1, 0)))[:, :-1]
        pre = jnp.maximum(jnp.maximum(diag + s, e), 0)
        fscan, _ = jax.lax.associative_scan(
            combine, (pre - go, ones), axis=1
        )
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
        )
    return _colscan_impl(
        jnp.asarray(qs), jnp.asarray(ts), table, int(params.gap)
    )
