"""Oracle self-consistency tests (the L0 tier of SURVEY.md §4).

The scalar double-loop oracle is the gold standard; the vectorized batch
oracle and the banded oracle are checked against it / against the
full-matrix semi-global on homologous inputs, mirroring the reference's
TestSemiGlobal setup (source.cpp:2733-2786).
"""

import numpy as np
import pytest

from swtpu.core import random_dna, mutate, pack_2bit, unpack_2bit
from swtpu.core.scoring import DNA_10_30_15, DNA_111, ScoringParams, dna_matrix
from swtpu.oracle import (
    sw_score,
    sw_score_batch,
    sw_traceback,
    semiglobal_full,
    banded_xdrop,
)


def test_pack_roundtrip(rng):
    seq = random_dna(rng, (4, 256))
    assert np.array_equal(unpack_2bit(pack_2bit(seq)), seq)


def test_pack_bit_layout():
    # byte layout parity with reference scalar unpack (source.cpp:1580-1583):
    # base j sits in bits 2*(j%4) of byte j/4
    seq = np.array([1, 2, 3, 0], dtype=np.uint8)
    packed = pack_2bit(seq)
    assert packed[0] == (1 << 0) | (2 << 2) | (3 << 4) | (0 << 6)


def test_sw_batch_matches_scalar(rng):
    qs = random_dna(rng, (16, 64))
    ts = random_dna(rng, (16, 48))
    for params in (DNA_10_30_15, DNA_111):
        batch = sw_score_batch(qs, ts, params)
        for i in range(16):
            assert batch[i] == sw_score(qs[i], ts[i], params)


def test_sw_traceback_path_valid(rng):
    """Path is contiguous, correctly ordered, and rescores to the reported
    score under the reference's move semantics."""
    for _ in range(8):
        q = random_dna(rng, (96,))
        t = random_dna(rng, (128,))
        score, path = sw_traceback(q, t, DNA_111)
        assert score == sw_score(q, t, DNA_111)
        # check path step validity + rescore
        s = 0
        for (i0, j0), (i1, j1) in zip(path, path[1:]):
            di, dj = i1 - i0, j1 - j0
            assert (di, dj) in ((1, 1), (1, 0), (0, 1))
            if (di, dj) == (1, 1):
                s += 1 if q[i1 - 1] == t[j1 - 1] else -1
            else:
                s -= 1
            s = max(s, 0)  # zero floor can only hit at path start
        assert s == score


def test_banded_matches_full_on_homologous(rng):
    """On ~70% identity pairs the adaptive band tracks the optimum, so the
    banded result equals the full matrix (the regime the reference tests in,
    source.cpp:2750-2771)."""
    for L in (200, 500):
        for _ in range(4):
            q = random_dna(rng, (L,))
            t = mutate(rng, q, out_len=L)
            fs, fpath = semiglobal_full(q, t)
            bs, bpath = banded_xdrop(q, t)
            assert fs == bs
            assert fpath == bpath


def test_banded_xdrop_terminates_early(rng):
    """Once the band runs off the end of a short target into pad territory,
    every cell decays and the whole band X-drops: the run must end long
    before the round cap (source.cpp:1938-1941)."""
    q = random_dna(rng, (2000,))
    t = mutate(rng, q[:100], out_len=100)
    res = banded_xdrop(q, t, return_state=True)
    assert res.n_rounds < 600  # cap would be (2000+1)*2-1 = 4001
    assert res.score >= 0


def test_banded_positive_drift_runs_to_cap(rng):
    """Random DNA under (1,1,1) scoring has positive score drift, so X-drop
    never fires and the band sweeps all anti-diagonals."""
    q = random_dna(rng, (400,))
    t = random_dna(rng, (400,))
    res = banded_xdrop(q, t, return_state=True)
    assert res.n_rounds == (400 + 1) * 2 - 1
    assert res.score > 0


def test_banded_state_shapes(rng):
    q = random_dna(rng, (100,))
    t = mutate(rng, q, out_len=100)
    res = banded_xdrop(q, t, return_state=True)
    assert res.band_history.shape == (res.n_rounds, 32)
    # each round advances exactly one anti-diagonal: y + x == round
    ys = res.pos_y
    xs = res.pos_x - 31  # unpad
    rounds = np.arange(res.n_rounds)
    assert np.array_equal(ys + xs, rounds)


def test_semiglobal_negative_scores_allowed():
    """No zero floor: an all-mismatch pair goes negative but argmax rule
    keeps score at the 0 origin."""
    q = np.zeros(16, dtype=np.uint8)
    t = np.full(16, 1, dtype=np.uint8)
    score, path = semiglobal_full(q, t)
    assert score == 0
    assert path == [(0, 0)]


def test_general_matrix_scoring(rng):
    """Non-uniform 4x4 matrix exercises the full substitution path."""
    mat = np.array(
        [[5, -1, -2, -3], [-1, 4, -4, -2], [-2, -4, 6, -1], [-3, -2, -1, 3]],
        dtype=np.int32,
    )
    params = ScoringParams.linear(mat, 3)
    qs = random_dna(rng, (4, 40))
    ts = random_dna(rng, (4, 56))
    batch = sw_score_batch(qs, ts, params)
    for i in range(4):
        assert batch[i] == sw_score(qs[i], ts[i], params)
