"""Differential tests for GLOBAL (Needleman-Wunsch) alignment.

Extension beyond the reference: its semi-global family (source.cpp:
1776-1834) is origin-anchored with penalized boundary gap chains, so
global alignment = the same forward pass with the endpoint pinned at the
(n, m) corner. These tests pin that equivalence down at every layer:
oracle, XLA batch engine, native walker, batch traceback API, CLI.
"""

import numpy as np
import pytest

from swtpu import native
from swtpu.batch import nw_align_batch, semiglobal_align_batch
from swtpu.core import mutate, random_dna
from swtpu.core.protein import BLOSUM62
from swtpu.core.scoring import ScoringParams
from swtpu.kernels.xla.semiglobal_scan import (
    nw_batch_diag,
    nw_batch_general,
    semiglobal_batch_diag,
)
from swtpu.oracle import (
    nw_affine_full,
    nw_full,
    semiglobal_affine_full,
    semiglobal_full,
)


def _nw_ref(q, t, match, mismatch, gap):
    """Independent scalar NW (not sharing the oracle's fill)."""
    n, m = len(q), len(t)
    dp = np.zeros((n + 1, m + 1), np.int64)
    dp[0, :] = -gap * np.arange(m + 1)
    dp[:, 0] = -gap * np.arange(n + 1)
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            s = match if q[i - 1] == t[j - 1] else -mismatch
            dp[i, j] = max(
                dp[i - 1, j - 1] + s, dp[i - 1, j] - gap, dp[i, j - 1] - gap
            )
    return int(dp[n, m])


def test_nw_oracle_vs_independent_scalar(rng):
    for _ in range(6):
        n, m = rng.integers(1, 30, 2)
        q, t = random_dna(rng, (n,)), random_dna(rng, (m,))
        sc, path = nw_full(q, t, 2, 1, 1)
        assert sc == _nw_ref(q, t, 2, 1, 1)
        # global contract: path spans corner to corner
        assert path[0] == (0, 0) and path[-1] == (n, m)


def test_nw_oracle_properties(rng):
    q = random_dna(rng, (40,))
    # identical pair: all-diagonal path, score = n*match
    sc, path = nw_full(q, q, 3, 2, 2)
    assert sc == 40 * 3 and len(path) == 41
    # global <= semi-global (the argmax dominates the corner)
    t = mutate(rng, q, out_len=36)
    assert nw_full(q, t)[0] <= semiglobal_full(q, t)[0]
    assert (
        nw_affine_full(q, t, 2, 3, 5, 1)[0]
        <= semiglobal_affine_full(q, t, 2, 3, 5, 1)[0]
    )
    # affine with open == extend degenerates to linear
    assert nw_affine_full(q, t, 2, 1, 1, 1)[0] == nw_full(q, t, 2, 1, 1)[0]


def test_nw_engine_parity_linear_varlen(rng):
    B, n, m = 16, 24, 28
    qs = random_dna(rng, (B, n))
    ts = random_dna(rng, (B, m))
    lq = rng.integers(1, n + 1, B)
    lt = rng.integers(1, m + 1, B)
    qs2, ts2 = qs.copy(), ts.copy()
    for b in range(B):
        qs2[b, lq[b]:] = 4
        ts2[b, lt[b]:] = 5
    # tie-rich scoring to exercise tie-breaks
    sc = np.asarray(nw_batch_diag(qs2, ts2, 2, 1, 1, lens_q=lq, lens_t=lt))
    for b in range(B):
        assert sc[b] == nw_full(qs[b, : lq[b]], ts[b, : lt[b]], 2, 1, 1)[0]


def test_nw_engine_parity_affine(rng):
    B, n, m = 8, 32, 32
    qs = random_dna(rng, (B, n))
    ts = np.stack(
        [mutate(rng, qs[b], out_len=m) for b in range(B // 2)]
        + [random_dna(rng, (m,)) for _ in range(B // 2)]
    )
    sc = np.asarray(nw_batch_diag(qs, ts, 2, 3, gap_open=5, gap_extend=1))
    for b in range(B):
        assert sc[b] == nw_affine_full(qs[b], ts[b], 2, 3, 5, 1)[0]


def test_nw_engine_parity_protein(rng):
    p = ScoringParams(BLOSUM62, gap_open=11, gap_extend=1)
    qp = rng.integers(0, 20, (6, 20)).astype(np.uint8)
    tp = rng.integers(0, 20, (6, 26)).astype(np.uint8)
    sc = np.asarray(nw_batch_general(qp, tp, p))
    for b in range(6):
        assert (
            sc[b]
            == nw_affine_full(
                qp[b], tp[b], gap_open=11, gap_extend=1, matrix=BLOSUM62
            )[0]
        )


def test_nw_empty_pair():
    qs = np.full((2, 8), 4, np.uint8)
    ts = np.full((2, 8), 5, np.uint8)
    lq = np.zeros(2, int)
    lt = np.zeros(2, int)
    sc = np.asarray(nw_batch_diag(qs, ts, 1, 1, 1, lens_q=lq, lens_t=lt))
    assert (sc == 0).all()


def test_nw_semiglobal_default_unchanged(rng):
    """pin_end defaults off: semiglobal results identical to before."""
    q = random_dna(rng, (4, 40))
    t = random_dna(rng, (4, 44))
    s, ei, ej = (np.asarray(x) for x in semiglobal_batch_diag(q, t))
    for b in range(4):
        sc, path = semiglobal_full(q[b], t[b])
        assert (s[b], ei[b], ej[b]) == (sc, *path[-1])


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_nw_native_walker_twins(rng):
    q = random_dna(rng, (30,))
    t = mutate(rng, q, out_len=26)
    assert native.semiglobal_traceback(
        q, t, 2, 1, 1, pin_end=True
    ) == nw_full(q, t, 2, 1, 1)
    assert native.semiglobal_traceback_matrix(
        q, t, BLOSUM62[:8, :8], 3, pin_end=True
    ) == nw_full(q, t, matrix=BLOSUM62[:8, :8], gap=3)
    assert native.semiglobal_affine_traceback(
        q, t, BLOSUM62[:8, :8], 5, 1, pin_end=True
    ) == nw_affine_full(q, t, gap_open=5, gap_extend=1, matrix=BLOSUM62[:8, :8])
    # default (argmax) behavior unchanged
    assert native.semiglobal_traceback(q, t, 2, 1, 1) == semiglobal_full(
        q, t, 2, 1, 1
    )


def test_nw_align_batch_paths(rng):
    B, n, m = 6, 24, 28
    qs = random_dna(rng, (B, n))
    ts = np.stack(
        [mutate(rng, qs[b], out_len=m) for b in range(B - 2)]
        + [random_dna(rng, (m,)) for _ in range(2)]
    )
    lq = np.r_[np.full(B - 1, n), 13]
    lt = np.r_[np.full(B - 1, m), 17]
    qs[B - 1, 13:] = 4
    ts[B - 1, 17:] = 5
    out = nw_align_batch(qs, ts, 2, 1, 1, lens_q=lq, lens_t=lt)
    for b, (sc, path) in enumerate(out):
        s0, p0 = nw_full(qs[b, : lq[b]], ts[b, : lt[b]], 2, 1, 1)
        assert (sc, path) == (s0, p0)
    # affine + protein via params
    p = ScoringParams(BLOSUM62, gap_open=11, gap_extend=1)
    qp = rng.integers(0, 20, (4, 16)).astype(np.uint8)
    tp = rng.integers(0, 20, (4, 20)).astype(np.uint8)
    for b, (sc, path) in enumerate(nw_align_batch(qp, tp, params=p)):
        s0, p0 = nw_affine_full(
            qp[b], tp[b], gap_open=11, gap_extend=1, matrix=BLOSUM62
        )
        assert (sc, path) == (s0, p0)
    # pin_end=True through the semiglobal surface is the same thing
    out2 = semiglobal_align_batch(
        qs, ts, 2, 1, 1, lens_q=lq, lens_t=lt, pin_end=True
    )
    assert out == out2
