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

import math

import numpy as np

from swtpu.core.scoring import ScoringParams


def sw_scores_promoted(qs, ts, params: ScoringParams, engine_int32=None):
    """Batched SW scores: bf16 tier + int32 re-run of overflow pairs.

    Returns (scores [B] int64, promoted_mask [B] bool). Scores are
    bit-exact vs the oracle regardless of sequence length / scoring
    magnitude; promoted_mask marks the pairs that needed the re-run.
    """
    from swtpu.kernels.pallas.sw_bf16 import (
        MAX_EXACT,
        sw_batch_bf16_pallas,
        _uniform_match_mismatch,
    )

    qs = np.asarray(qs)
    ts = np.asarray(ts)
    mm = _uniform_match_mismatch(params)
    if mm is None or mm[1] >= 0 or not params.is_linear or params.gap <= 0:
        raise NotImplementedError(
            "promotion tier needs uniform match/mismatch linear scoring"
        )
    match, mismatch = mm
    g = math.gcd(math.gcd(abs(match), abs(mismatch)), abs(int(params.gap)))

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
