"""Precision-tiered scoring with overflow promotion.

The reference's 8-bit kernels (source.cpp:1105-1522) use saturating
arithmetic as the overflow guard and leave the out-of-range case to the
caller (the documented constraint at source.cpp:1138). The TPU-native
equivalent (SURVEY.md §2.3.4, BASELINE config 4): run the batch through
the reduced-precision tier, detect the pairs whose scores reached the
exact-representation bound, and re-run exactly those at full precision.

Soundness of the detection (no saturation sentinel needed): in
zero-floored Smith-Waterman every DP cell is bounded by the final score,
and bf16 represents integers below MAX_EXACT = 256 (rescaled units)
exactly — so a pair whose reduced-precision score lands below
(MAX_EXACT - 1) * gcd provably never left the exact range, while any
pair whose true max crossed the bound must read at least that threshold
(rounding drift only accrues above the bound and the running max passes
through 255 exactly on the way up). The split is therefore exact, not
heuristic, and the promoted re-run restores bit-exact scores.

On v5e the bf16 tier measures slower than int32 (see sw_bf16.py), so the
default engine does not route through this — it exists as the documented
promotion mechanism, exercised by tests, and becomes the fast path on
VPUs with native-rate bf16.
"""

from __future__ import annotations

import functools
import math

import numpy as np

from swtpu.core.scoring import ScoringParams


def _check_promotion_scoring(params: ScoringParams):
    from swtpu.kernels.pallas.sw_bf16 import _uniform_match_mismatch

    mm = _uniform_match_mismatch(params)
    if mm is None or mm[1] >= 0 or not params.is_linear or params.gap <= 0:
        raise NotImplementedError(
            "promotion tier needs uniform match/mismatch linear scoring"
        )
    match, mismatch = mm
    g = math.gcd(math.gcd(abs(match), abs(mismatch)), abs(int(params.gap)))
    return match, mismatch, g


def sw_scores_promoted(qs, ts, params: ScoringParams, engine_int32=None):
    """Batched SW scores: bf16 tier + int32 re-run of overflow pairs.

    Returns (scores [B] int64, promoted_mask [B] bool). Scores are
    bit-exact vs the oracle regardless of sequence length / scoring
    magnitude; promoted_mask marks the pairs that needed the re-run.
    """
    from swtpu.kernels.pallas.sw_bf16 import (
        MAX_EXACT,
        sw_batch_bf16_pallas,
    )

    qs = np.asarray(qs)
    ts = np.asarray(ts)
    match, mismatch, g = _check_promotion_scoring(params)

    low = np.asarray(
        sw_batch_bf16_pallas(qs, ts, params, allow_overflow=True)
    ).astype(np.int64)
    promoted = low >= (MAX_EXACT - 1) * g
    scores = low.copy()
    if promoted.any():
        if engine_int32 is None:
            import jax

            if jax.devices()[0].platform == "tpu":
                from swtpu.kernels.pallas import sw_batch_pallas

                engine_int32 = lambda q, t: sw_batch_pallas(q, t, params)
            else:
                from swtpu.kernels.xla import sw_batch_diag

                engine_int32 = lambda q, t: sw_batch_diag(q, t, params)
        idx = np.nonzero(promoted)[0]
        hi = np.asarray(engine_int32(qs[idx], ts[idx]))
        scores[idx] = hi.astype(np.int64)
    return scores, promoted


def _promoted_device_impl_factory():
    """Deferred imports (jax + Pallas) for the fused device promotion."""
    import jax
    import jax.numpy as jnp

    from swtpu.kernels.pallas.sw_batch import (
        _prepare,
        _sw_batch_pallas_impl,
    )
    from swtpu.kernels.pallas.sw_bf16 import (
        MAX_EXACT,
        _prepare_bf16,
        _sw_bf16_impl,
    )

    @functools.partial(
        jax.jit,
        static_argnames=("n", "m", "match", "mismatch", "gap", "g", "cap"),
    )
    def impl(qs, ts, n, m, match, mismatch, gap, g, cap):
        """bf16 pass + overflow mask + capped gather + int32 re-run +
        scatter, all in one dispatch. qs/ts are pre-padded ([Bp, n/m],
        Bp a multiple of the bf16 tile). Returns (scores int32 [Bp],
        promoted bool [Bp], n_promoted int32). Rows whose mask index
        exceeds ``cap`` keep their bf16 score — the caller must check
        n_promoted <= cap before trusting the split (the only host
        fetch besides the results themselves)."""
        from swtpu.kernels.pallas.sw_batch import Q_PAD, T_PAD, TILE_PAIRS

        Bp = qs.shape[0]
        qsT16, tsT16 = _prepare_bf16(qs, ts, n, m)
        low = _sw_bf16_impl(
            qsT16, tsT16, n, m, match // g, mismatch // g, gap // g
        ).reshape(Bp) * g
        promoted = low >= (MAX_EXACT - 1) * g
        nprom = promoted.sum().astype(jnp.int32)
        # capped gather: fill indices land at Bp (out of range) so their
        # scatter is dropped and their gathered rows (clamped to Bp-1)
        # only waste lanes, never affect a real pair
        (idx,) = jnp.nonzero(promoted, size=cap, fill_value=Bp)
        safe = jnp.minimum(idx, Bp - 1)
        qg = qs[safe]
        tg = ts[safe]
        capp = -(-cap // TILE_PAIRS) * TILE_PAIRS  # flagship tile multiple
        if capp != cap:
            qg = jnp.concatenate(
                [qg, jnp.full((capp - cap, n), Q_PAD, qg.dtype)]
            )
            tg = jnp.concatenate(
                [tg, jnp.full((capp - cap, m), T_PAD, tg.dtype)]
            )
        qsT, tsT = _prepare(qg, tg, n, m)
        hi = _sw_batch_pallas_impl(
            qsT, tsT, n, m, match, mismatch, gap
        ).reshape(capp)[:cap]
        scores = low.at[idx].set(hi, mode="drop")
        return scores, promoted, nprom

    return impl


_PROMOTED_IMPL = None


def sw_scores_promoted_device(
    qs, ts, params: ScoringParams, cap_frac: float = 0.25
):
    """Device-fused promotion: like :func:`sw_scores_promoted` but the
    bf16 pass, overflow mask, promoted-pair gather, int32 flagship
    re-run, and score scatter all run in ONE device dispatch — nothing
    crosses the host link except the final scores (round-3's version
    fetched the whole bf16 result, selected on host, and re-uploaded the
    promoted pairs: two tunnel round-trips, 1000x off device rate).

    The re-run capacity is static (``cap_frac`` of the padded batch,
    rounded up to the flagship's 1024-pair tile). If more pairs promote
    than the capacity (checked with one scalar fetch), the overflow
    remainder is re-run through the host-orchestrated path — correctness
    never depends on the cap. Exactness of the split is inherited
    unchanged from sw_scores_promoted (module docstring): the gathered
    re-run computes the identical int32 scores, just without leaving the
    device.

    Returns (scores [B] int64, promoted_mask [B] bool), bit-exact vs the
    oracle. qs/ts may be numpy or device arrays; codes 0-3 with pads
    4 (q) / 5 (t).
    """
    import jax.numpy as jnp

    from swtpu.kernels.pallas.sw_batch import CHUNK, Q_PAD, ROWS, T_PAD
    from swtpu.kernels.pallas.sw_bf16 import TILE_PAIRS_16

    match, mismatch, g = _check_promotion_scoring(params)
    B, n = qs.shape
    m = ts.shape[1]
    qs = jnp.asarray(qs)
    ts = jnp.asarray(ts)
    if n % ROWS:
        qs = jnp.concatenate(
            [qs, jnp.full((B, ROWS - n % ROWS), Q_PAD, qs.dtype)], axis=1
        )
        n = qs.shape[1]
    if m % CHUNK:
        ts = jnp.concatenate(
            [ts, jnp.full((B, CHUNK - m % CHUNK), T_PAD, ts.dtype)], axis=1
        )
        m = ts.shape[1]
    # one batch padding serves both tiles (the bf16 tile is 2x the int32)
    Bp = -(-B // TILE_PAIRS_16) * TILE_PAIRS_16
    if Bp != B:
        qs = jnp.concatenate([qs, jnp.full((Bp - B, n), Q_PAD, qs.dtype)])
        ts = jnp.concatenate([ts, jnp.full((Bp - B, m), T_PAD, ts.dtype)])
    cap = min(max(1, int(Bp * cap_frac)), Bp)

    global _PROMOTED_IMPL
    if _PROMOTED_IMPL is None:
        _PROMOTED_IMPL = _promoted_device_impl_factory()
    scores_d, promoted_d, nprom_d = _PROMOTED_IMPL(
        qs, ts, n, m, match, mismatch, int(params.gap), g, cap
    )
    if int(nprom_d) > cap:  # rare: more overflow pairs than capacity
        scores = np.asarray(scores_d[:B]).astype(np.int64)
        promoted = np.asarray(promoted_d[:B])
        idx = np.nonzero(promoted)[0][cap:]
        if len(idx):
            from swtpu.kernels.xla import sw_batch_diag
            import jax

            if jax.devices()[0].platform == "tpu":
                from swtpu.kernels.pallas import sw_batch_pallas

                hi = sw_batch_pallas(
                    np.asarray(qs)[idx], np.asarray(ts)[idx], params
                )
            else:
                hi = sw_batch_diag(
                    np.asarray(qs)[idx], np.asarray(ts)[idx], params
                )
            scores[idx] = np.asarray(hi).astype(np.int64)
        return scores, promoted
    return (
        np.asarray(scores_d[:B]).astype(np.int64),
        np.asarray(promoted_d[:B]),
    )
