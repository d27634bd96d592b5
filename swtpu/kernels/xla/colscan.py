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


def sw_batch_colscan(qs, ts, params: ScoringParams):
    """Batched SW scores, column-parallel schedule.

    Same contract as sw_batch_diag (pads q:A, t:A+1; variable length free).
    """
    if not params.is_linear:
        raise NotImplementedError("colscan affine tier pending (2x2 max-plus)")
    table = jnp.asarray(_extended_table(params))
    return _colscan_impl(
        jnp.asarray(qs), jnp.asarray(ts), table, int(params.gap)
    )
