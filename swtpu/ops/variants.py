"""Kernel-variant registry: the swtpu analog of the reference's ladder.

The reference keeps every schedule refinement callable side by side
(simd1..simd9, 8bit, x32 mark1..3 — source.cpp:62-1522) and benchmarks them
against each other (SpeedTest, source.cpp:3032-3147). swtpu keeps the same
discipline: each entry computes identical scores for the same problem and
is differential-tested against the scalar oracle; the bench suite
(swtpu.bench_suite) reports them side by side in the reference's
"<name>: <ms> ms / <N>" format.

Variants (schedule lineage, slow → fast):
  oracle        — numpy scalar full-matrix (≙ SmithWaterman, :35)
  xla_diag      — XLA lax.scan over anti-diagonals, batch-vectorized
                  (the lax.scan tier of SURVEY.md §7.3)
  wavefront     — Pallas intra-pair parallelogram, 8 pairs × 128 lanes
                  (≙ the simd1-9 family, :62-1071)
  colscan       — XLA column-parallel schedule with associative-scan gap
                  propagation: the TPU-native Farrar-striped equivalent
                  (the striped citation is README.md:15)
  rowscan       — Pallas inter-pair row scan, 1024 pairs/tile, chunked
                  columns + fused chain + 8-row unroll (≙ the x32 family,
                  :1227-1522); the flagship (uniform match/mismatch)
  rowscan_prof  — rowscan with a packed query profile (≙ the pshufb LUT
                  kernels' general-matrix interface, :62-66): arbitrary
                  4x4 matrices and protein/BLOSUM62
  rowscan_bf16  — reduced-precision bf16 tier, 2048 pairs/tile (≙ the
                  8-bit family, :1105-1522); exact for n*match/gcd <= 256;
                  measured slower than int32 on v5e — kept as the ladder's
                  precision data point
"""

from __future__ import annotations

from typing import Callable, Dict

import numpy as np

from swtpu.core.scoring import ScoringParams


def _oracle(qs, ts, params: ScoringParams):
    from swtpu.oracle import sw_score_batch

    return sw_score_batch(np.asarray(qs), np.asarray(ts), params).astype(
        np.int32
    )


def _xla_diag(qs, ts, params):
    from swtpu.kernels.xla import sw_batch_diag

    return sw_batch_diag(qs, ts, params)


def _wavefront(qs, ts, params):
    from swtpu.kernels.pallas.sw_wavefront import sw_wavefront_pallas

    return sw_wavefront_pallas(qs, ts, params)


def _colscan(qs, ts, params):
    from swtpu.kernels.xla.colscan import sw_batch_colscan

    return sw_batch_colscan(qs, ts, params)


def _rowscan(qs, ts, params):
    from swtpu.kernels.pallas import sw_batch_pallas

    return sw_batch_pallas(qs, ts, params)


def _rowscan_prof(qs, ts, params):
    from swtpu.kernels.pallas.sw_profile import sw_batch_profile_pallas

    return sw_batch_profile_pallas(qs, ts, params)


def _rowscan_bf16(qs, ts, params):
    from swtpu.kernels.pallas.sw_bf16 import sw_batch_bf16_pallas

    return sw_batch_bf16_pallas(qs, ts, params)


VARIANTS: Dict[str, Callable] = {
    "oracle": _oracle,
    "xla_diag": _xla_diag,
    "wavefront": _wavefront,
    "colscan": _colscan,
    "rowscan": _rowscan,
    "rowscan_prof": _rowscan_prof,
    "rowscan_bf16": _rowscan_bf16,
}


def get_variant(name: str) -> Callable:
    if name not in VARIANTS:
        raise KeyError(f"unknown variant {name!r}; have {sorted(VARIANTS)}")
    return VARIANTS[name]


def best_ends_engine(params: ScoringParams) -> Callable:
    """fn(qs, ts) -> (score, end_i, end_j) int32 [B] each: the fastest
    endpoint-returning engine for these params on the current backend.
    Endpoints are the 1-based argmax cell under the reference's
    first-max-in-row-major-scan rule (source.cpp:1545-1549); score 0 maps
    to (0, 0). Used by the traceback engines to bound the host walk to
    the [0..end_i, 0..end_j] submatrix."""
    import jax

    def _xla_ends(params):
        if params.is_linear:
            from swtpu.kernels.xla.sw_scan import sw_batch_diag_ends

            return lambda q, t: sw_batch_diag_ends(q, t, params)
        from swtpu.kernels.xla.affine_scan import sw_affine_batch_diag_ends

        return lambda q, t: sw_affine_batch_diag_ends(q, t, params)

    def _with_fallback(pallas_fn):
        """Pallas tier with XLA fallback on its static guards (packed-row
        overflow, non-positive gaps)."""
        xla_fn = _xla_ends(params)

        def run(q, t):
            try:
                return pallas_fn(q, t)
            except NotImplementedError:
                return xla_fn(q, t)

        return run

    on_tpu = jax.devices()[0].platform == "tpu"
    if on_tpu:
        from swtpu.kernels.pallas.sw_batch import _uniform_match_mismatch

        mm = _uniform_match_mismatch(params)
        if params.is_linear and mm is not None and mm[1] < 0 < params.gap:
            from swtpu.kernels.pallas.sw_batch import sw_batch_pallas_ends

            return _with_fallback(
                lambda q, t: sw_batch_pallas_ends(q, t, params)
            )
        if not params.is_linear and mm is not None:
            from swtpu.kernels.pallas.sw_affine import sw_affine_pallas_ends

            return _with_fallback(
                lambda q, t: sw_affine_pallas_ends(q, t, params)
            )
        if (
            mm is None
            and params.matrix.min() >= -127
            and params.matrix.max() <= 127
            and (params.gap_extend if not params.is_linear else params.gap)
            > 0
        ):
            from swtpu.kernels.pallas.sw_profile import (
                sw_batch_profile_pallas_ends,
            )

            return _with_fallback(
                lambda q, t: sw_batch_profile_pallas_ends(q, t, params)
            )
    return _xla_ends(params)


def best_engine(params: ScoringParams) -> Callable:
    """fn(qs, ts) -> [B] int32 scores: the fastest engine for these params
    on the current backend (Pallas tiers on TPU, XLA scans elsewhere)."""
    import jax

    on_tpu = jax.devices()[0].platform == "tpu"
    if on_tpu and params.is_linear:
        from swtpu.kernels.pallas.sw_batch import _uniform_match_mismatch

        mm = _uniform_match_mismatch(params)
        if mm is not None and mm[1] < 0 < params.gap:
            from swtpu.kernels.pallas import sw_batch_pallas

            return lambda q, t: sw_batch_pallas(q, t, params)
        if (
            params.gap > 0
            and params.matrix.min() >= -127
            and params.matrix.max() <= 127
        ):
            from swtpu.kernels.pallas.sw_profile import (
                sw_batch_profile_pallas,
            )

            return lambda q, t: sw_batch_profile_pallas(q, t, params)
    if on_tpu and not params.is_linear:
        from swtpu.kernels.pallas.sw_batch import _uniform_match_mismatch

        if _uniform_match_mismatch(params) is not None:
            from swtpu.kernels.pallas.sw_affine import sw_affine_pallas

            return lambda q, t: sw_affine_pallas(q, t, params)
        if (
            params.gap_extend > 0
            and params.matrix.min() >= -127
            and params.matrix.max() <= 127
        ):
            # general matrix + Gotoh: the packed-profile kernel's affine
            # mode (BLOSUM62 + open/extend, the production protein config)
            from swtpu.kernels.pallas.sw_profile import (
                sw_batch_profile_pallas,
            )

            return lambda q, t: sw_batch_profile_pallas(q, t, params)
    if params.is_linear:
        from swtpu.kernels.xla import sw_batch_diag

        return lambda q, t: sw_batch_diag(q, t, params)
    from swtpu.kernels.xla.affine_scan import sw_affine_batch_diag

    return lambda q, t: sw_affine_batch_diag(q, t, params)


def resolve_engine(params: ScoringParams, engine=None):
    """(engine, cache_key) for the keyed jit caches in `parallel/*`.

    With no caller engine, returns ``best_engine(params)`` keyed by the
    scoring values (stable across calls, so repeated calls share one
    compiled program). A caller-owned engine is keyed on the object
    itself — NOT ``id()``: ids are recycled after gc and could serve a
    stale compiled program for a different engine; the cache entry keeps
    the object alive, which is what makes the key stable.
    """
    if engine is not None:
        return engine, engine
    return best_engine(params), (
        params.matrix.tobytes(), params.gap_open, params.gap_extend,
    )


def cached_build(cache: dict, key, build, cap: int = 64):
    """cache[key], building (and inserting) on miss.

    Keyed jit caches hold compiled executables + engine closures forever;
    `cap` bounds that growth — a process sweeping many (engine, geometry)
    combinations clears and re-traces rather than leaking programs.
    """
    fn = cache.get(key)
    if fn is None:
        if len(cache) >= cap:
            cache.clear()
        fn = build()
        cache[key] = fn
    return fn
