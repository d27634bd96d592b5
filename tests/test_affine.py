"""Affine-gap (Gotoh) engines vs oracle; linear degenerate-case parity."""

import numpy as np
from jax.experimental.pallas import tpu as pltpu

from swtpu.core import random_dna
from swtpu.core.scoring import ScoringParams, dna_matrix, DNA_10_30_15
from swtpu.oracle import sw_score_batch
from swtpu.oracle.affine import sw_affine_score, sw_affine_score_batch
from swtpu.kernels.xla.affine_scan import sw_affine_batch_diag
from swtpu.kernels.pallas.sw_affine import sw_affine_pallas

AFF = ScoringParams(dna_matrix(10, -30), gap_open=20, gap_extend=5)
AFF111 = ScoringParams(dna_matrix(1, -1), gap_open=3, gap_extend=1)


def test_affine_oracle_batch_matches_scalar(rng):
    qs = random_dna(rng, (6, 48))
    ts = random_dna(rng, (6, 56))
    for params in (AFF, AFF111):
        b = sw_affine_score_batch(qs, ts, params)
        for i in range(6):
            assert b[i] == sw_affine_score(qs[i], ts[i], params)


def test_affine_xla_parity(rng):
    qs = random_dna(rng, (16, 96))
    ts = random_dna(rng, (16, 96))
    for params in (AFF, AFF111):
        dev = np.asarray(sw_affine_batch_diag(qs, ts, params))
        assert np.array_equal(
            dev, sw_affine_score_batch(qs, ts, params).astype(np.int32)
        )


def test_affine_degenerates_to_linear(rng):
    qs = random_dna(rng, (8, 64))
    ts = random_dna(rng, (8, 64))
    dev = np.asarray(sw_affine_batch_diag(qs, ts, DNA_10_30_15))
    assert np.array_equal(
        dev, sw_score_batch(qs, ts, DNA_10_30_15).astype(np.int32)
    )


def test_affine_pallas_parity(rng):
    qs = random_dna(rng, (64, 64))
    ts = random_dna(rng, (64, 64))
    with pltpu.force_tpu_interpret_mode():
        dev = np.asarray(sw_affine_pallas(qs, ts, AFF))
    assert np.array_equal(
        dev, sw_affine_score_batch(qs, ts, AFF).astype(np.int32)
    )


def test_banded_affine_oracle_degenerates_to_linear(rng):
    from swtpu.core import mutate
    from swtpu.oracle import banded_xdrop
    from swtpu.oracle.banded_affine import banded_affine_xdrop

    for _ in range(3):
        q = random_dna(rng, (200,))
        t = mutate(rng, q, out_len=200)
        assert banded_affine_xdrop(
            q, t, gap_open=1, gap_extend=1
        ) == banded_xdrop(q, t)


def test_banded_affine_device_scores(rng):
    from swtpu.core import mutate
    from swtpu.kernels.xla.banded_scan import banded_xdrop_batch
    from swtpu.oracle.banded_affine import banded_affine_xdrop

    B = 3
    qs = random_dna(rng, (B, 200))
    ts = np.stack([mutate(rng, qs[b], out_len=200) for b in range(B)])
    res = banded_xdrop_batch(
        qs, ts, gap_open=3, gap_extend=1, with_history=False
    )
    for b in range(B):
        sc, path = banded_affine_xdrop(qs[b], ts[b], gap_open=3, gap_extend=1)
        assert sc == int(res.score[b])


def test_banded_affine_path_rescoring(rng):
    from swtpu.core import mutate
    from swtpu.oracle.banded_affine import banded_affine_xdrop

    q = random_dna(rng, (300,))
    t = mutate(rng, q, out_len=300)
    sc, path = banded_affine_xdrop(q, t, gap_open=3, gap_extend=1)
    s, run = 0, None
    for (i0, j0), (i1, j1) in zip(path, path[1:]):
        d = (i1 - i0, j1 - j0)
        if d == (1, 1):
            s += 1 if q[i1 - 1] == t[j1 - 1] else -1
            run = None
        else:
            kind = "up" if d == (1, 0) else "left"
            s -= 3 if run != kind else 1
            run = kind
    assert s == sc


def _mutated_batch(rng, B, n):
    from swtpu.core import mutate

    qs = np.stack([random_dna(rng, (n,)) for _ in range(B)])
    ts = np.stack([mutate(rng, qs[b], out_len=n) for b in range(B)])
    return qs, ts


def test_banded_affine_ef_reconstruction(rng):
    """E/F bands rebuilt from the device H history == the oracle's."""
    from swtpu.batch.traceback import reconstruct_affine_bands
    from swtpu.kernels.xla.banded_scan import banded_xdrop_batch
    from swtpu.oracle.banded_affine import banded_affine_xdrop

    B = 3
    qs, ts = _mutated_batch(rng, B, 160)
    res = banded_xdrop_batch(qs, ts, gap_open=3, gap_extend=1)
    for b in range(B):
        o = banded_affine_xdrop(
            qs[b], ts[b], gap_open=3, gap_extend=1, return_state=True
        )
        e_hist, f_hist = reconstruct_affine_bands(
            res.history_for(b), res.pos_y[:, b], o.n_rounds, 3, 1
        )
        np.testing.assert_array_equal(e_hist, o.e_hist)
        np.testing.assert_array_equal(f_hist, o.f_hist)


def test_banded_affine_align_batch_paths(rng):
    """End-to-end device forward + host Gotoh walk == oracle (score, path)."""
    from swtpu.batch.traceback import banded_align_batch
    from swtpu.oracle.banded_affine import banded_affine_xdrop

    B = 4
    qs, ts = _mutated_batch(rng, B, 192)
    out = banded_align_batch(qs, ts, gap_open=3, gap_extend=1)
    for b in range(B):
        sc, path = banded_affine_xdrop(qs[b], ts[b], gap_open=3, gap_extend=1)
        assert out[b] == (sc, path)


def test_banded_affine_pallas_sublane(rng):
    """Pallas sublane kernel, affine mode: score/rounds/history parity."""
    from swtpu.kernels.pallas.banded_batch import banded_xdrop_batch_pallas
    from swtpu.oracle.banded_affine import banded_affine_xdrop

    B = 3
    qs, ts = _mutated_batch(rng, B, 160)
    with pltpu.force_tpu_interpret_mode():
        res = banded_xdrop_batch_pallas(qs, ts, gap_open=3, gap_extend=1)
    for b in range(B):
        o = banded_affine_xdrop(
            qs[b], ts[b], gap_open=3, gap_extend=1, return_state=True
        )
        assert int(res.score[b]) == o.score
        assert int(res.n_rounds[b]) == o.n_rounds
        assert int(res.max_round[b]) == o.max_round
        np.testing.assert_array_equal(
            res.history_for(b)[: o.n_rounds], o.h_hist
        )
        np.testing.assert_array_equal(res.pos_y[: o.n_rounds, b], o.pos_y)


def test_banded_affine_pallas_packed(rng):
    """Lane-packed kernel, affine mode: score/rounds/history parity."""
    from swtpu.kernels.pallas.banded_packed import banded_xdrop_batch_packed
    from swtpu.oracle.banded_affine import banded_affine_xdrop

    B = 3
    qs, ts = _mutated_batch(rng, B, 160)
    with pltpu.force_tpu_interpret_mode():
        res = banded_xdrop_batch_packed(qs, ts, gap_open=3, gap_extend=1)
    for b in range(B):
        o = banded_affine_xdrop(
            qs[b], ts[b], gap_open=3, gap_extend=1, return_state=True
        )
        assert int(res.score[b]) == o.score
        assert int(res.n_rounds[b]) == o.n_rounds
        np.testing.assert_array_equal(
            res.history_for(b)[: o.n_rounds], o.h_hist
        )


def test_banded_affine_pallas_equal_gaps_degenerate(rng):
    """gap_open == gap_extend routes to the linear kernel, bit-equal."""
    from swtpu.kernels.pallas.banded_batch import banded_xdrop_batch_pallas
    from swtpu.oracle import banded_xdrop

    B = 2
    qs, ts = _mutated_batch(rng, B, 160)
    with pltpu.force_tpu_interpret_mode():
        res = banded_xdrop_batch_pallas(
            qs, ts, gap_open=1, gap_extend=1, with_history=False
        )
    for b in range(B):
        sc, _ = banded_xdrop(qs[b], ts[b])
        assert int(res.score[b]) == sc


def test_affine_profile_protein(rng):
    """Packed-profile kernel, affine mode: BLOSUM62 + open/extend (the
    production protein configuration) is bit-exact vs the affine oracle."""
    from swtpu.core.protein import BLOSUM62
    from swtpu.kernels.pallas.sw_profile import sw_batch_profile_pallas

    pp = ScoringParams(BLOSUM62, gap_open=11, gap_extend=1)
    pq = rng.integers(0, 24, size=(8, 40)).astype(np.uint8)
    pt = rng.integers(0, 24, size=(8, 48)).astype(np.uint8)
    with pltpu.force_tpu_interpret_mode():
        dev = np.asarray(sw_batch_profile_pallas(pq, pt, pp))
    want = sw_affine_score_batch(pq, pt, pp)
    assert np.array_equal(dev, want.astype(np.int32))


def test_affine_profile_general_dna(rng):
    """Non-uniform 4x4 matrix + Gotoh through the profile kernel."""
    from swtpu.kernels.pallas.sw_profile import sw_batch_profile_pallas

    mat = dna_matrix(5, -4)
    mat[0, 1] = mat[1, 0] = -2  # transitions cheaper: non-uniform
    ap = ScoringParams(mat, gap_open=10, gap_extend=2)
    q = random_dna(rng, (8, 40))
    t = random_dna(rng, (8, 48))
    with pltpu.force_tpu_interpret_mode():
        dev = np.asarray(sw_batch_profile_pallas(q, t, ap))
    want = sw_affine_score_batch(q, t, ap)
    assert np.array_equal(dev, want.astype(np.int32))


def test_affine_traceback_oracle_rescoring(rng):
    """The affine traceback path rescans to its own score (both scorings)."""
    from swtpu.oracle.affine import sw_affine_traceback

    for params in (AFF, AFF111):
        go, ge = int(params.gap_open), int(params.gap_extend)
        q = random_dna(rng, (80,))
        t = random_dna(rng, (90,))
        sc, path = sw_affine_traceback(q, t, params)
        assert sc == sw_affine_score(q, t, params)
        s, run = 0, None
        for (i0, j0), (i1, j1) in zip(path, path[1:]):
            d = (i1 - i0, j1 - j0)
            if d == (1, 1):
                s += int(params.matrix[q[i1 - 1], t[j1 - 1]])
                run = None
            else:
                kind = "up" if d == (1, 0) else "left"
                s -= go if run != kind else ge
                run = kind
        assert s == sc


def test_affine_align_batch_end_to_end(rng):
    """Device affine scores + host Gotoh walk, native and numpy walkers."""
    from swtpu import native
    from swtpu.batch import sw_align_batch
    from swtpu.oracle.affine import sw_affine_traceback

    qs = random_dna(rng, (4, 48))
    ts = random_dna(rng, (4, 56))
    out = sw_align_batch(qs, ts, AFF)
    for b in range(4):
        assert out[b] == sw_affine_traceback(qs[b], ts[b], AFF)
    if native.available():
        for b in range(4):
            assert native.sw_affine_traceback(
                qs[b], ts[b], AFF.matrix, AFF.gap_open, AFF.gap_extend
            ) == sw_affine_traceback(qs[b], ts[b], AFF)


def test_semiglobal_affine(rng):
    """Semi-global Gotoh: oracle degenerate + XLA engine + batch walker."""
    from swtpu.core import mutate
    from swtpu.batch import semiglobal_align_batch
    from swtpu.oracle.semiglobal import (
        semiglobal_affine_full,
        semiglobal_full,
    )

    B, n = 3, 64
    qs = random_dna(rng, (B, n))
    ts = np.stack([mutate(rng, q, out_len=n) for q in qs])
    assert semiglobal_affine_full(qs[0], ts[0], 1, 1, 1, 1) == semiglobal_full(
        qs[0], ts[0]
    )
    out = semiglobal_align_batch(qs, ts, gap_open=3, gap_extend=1)
    for b in range(B):
        assert out[b] == semiglobal_affine_full(qs[b], ts[b], 1, 1, 3, 1)


def test_semiglobal_affine_pallas(rng):
    """Pallas semi-global kernel, affine mode: score + endpoint parity."""
    from swtpu.core import mutate
    from swtpu.kernels.pallas.semiglobal_batch import semiglobal_batch_pallas
    from swtpu.oracle.semiglobal import semiglobal_affine_full

    B, n = 1024, 32  # one tile (interpret mode pays for the full tile)
    qs = random_dna(rng, (B, n))
    ts = np.stack([mutate(rng, q, out_len=n) for q in qs])
    with pltpu.force_tpu_interpret_mode():
        sc, ei, ej = (
            np.asarray(x)
            for x in semiglobal_batch_pallas(
                qs, ts, gap_open=3, gap_extend=1
            )
        )
    for b in range(0, B, 137):
        osc, opath = semiglobal_affine_full(qs[b], ts[b], 1, 1, 3, 1)
        assert sc[b] == osc
        assert (ei[b], ej[b]) == opath[-1]


def test_banded_affine_compressed_history_paths(rng):
    """Affine banded + 8-bit compressed history: E/F reconstruction reads
    through history_for, so paths stay bit-exact."""
    from swtpu.batch import banded_align_batch
    from swtpu.oracle.banded_affine import banded_affine_xdrop

    B = 3
    qs, ts = _mutated_batch(rng, B, 160)
    out = banded_align_batch(
        qs, ts, gap_open=3, gap_extend=1, compress_history=True
    )
    for b in range(B):
        assert out[b] == banded_affine_xdrop(
            qs[b], ts[b], gap_open=3, gap_extend=1
        )


def test_colscan_affine(rng):
    """Farrar-striped-equivalent schedule, affine: the lazy-F loop as a
    shifted max-plus associative scan (needs gap_open >= gap_extend)."""
    from swtpu.core.protein import BLOSUM62
    from swtpu.kernels.xla.colscan import sw_batch_colscan

    qs = random_dna(rng, (8, 96))
    ts = random_dna(rng, (8, 80))
    for params in (AFF, AFF111):
        dev = np.asarray(sw_batch_colscan(qs, ts, params))
        want = sw_affine_score_batch(qs, ts, params)
        assert np.array_equal(dev, want.astype(np.int32))
    pq = rng.integers(0, 24, size=(8, 64)).astype(np.uint8)
    pt = rng.integers(0, 24, size=(8, 64)).astype(np.uint8)
    pp = ScoringParams(BLOSUM62, gap_open=11, gap_extend=1)
    dev = np.asarray(sw_batch_colscan(pq, pt, pp))
    assert np.array_equal(
        dev, sw_affine_score_batch(pq, pt, pp).astype(np.int32)
    )


def test_semiglobal_profile_pallas_general_matrix(rng):
    """Pallas packed-profile semi-global (general matrices) == XLA table
    engine, linear + Gotoh, BLOSUM62 (interpret mode)."""
    from jax.experimental.pallas import tpu as pltpu

    from swtpu.core.protein import BLOSUM62, blosum62_params
    from swtpu.core.scoring import ScoringParams
    from swtpu.kernels.pallas.semiglobal_profile import (
        semiglobal_batch_profile_pallas,
    )
    from swtpu.kernels.xla.semiglobal_scan import semiglobal_batch_general

    B, n, m = 1024, 24, 32
    qs = rng.integers(0, 24, (B, n)).astype(np.uint8)
    ts = rng.integers(0, 24, (B, m)).astype(np.uint8)
    ts[:4, :n] = qs[:4, :n]
    for p in (ScoringParams.linear(BLOSUM62, 6), blosum62_params()):
        with pltpu.force_tpu_interpret_mode():
            got = tuple(
                np.asarray(x)
                for x in semiglobal_batch_profile_pallas(qs, ts, p)
            )
        want = tuple(
            np.asarray(x) for x in semiglobal_batch_general(qs, ts, p)
        )
        for g, w in zip(got, want):
            assert np.array_equal(g, w)


def test_semiglobal_profile_tie_break(rng):
    """Regression: row-major-first endpoints under ties in the
    general-matrix profile kernel (same per-column fix as the uniform
    kernel; tie-rich small-alphabet scoring)."""
    from jax.experimental.pallas import tpu as pltpu

    from swtpu.core.scoring import ScoringParams, dna_matrix
    from swtpu.kernels.pallas.semiglobal_profile import (
        semiglobal_batch_profile_pallas,
    )
    from swtpu.kernels.xla.semiglobal_scan import semiglobal_batch_general

    p = ScoringParams.linear(dna_matrix(2, -1), 1)
    qs = rng.integers(0, 3, (1024, 16)).astype(np.uint8)
    ts = rng.integers(0, 3, (1024, 48)).astype(np.uint8)
    with pltpu.force_tpu_interpret_mode():
        got = tuple(
            np.asarray(x)
            for x in semiglobal_batch_profile_pallas(qs, ts, p)
        )
    want = tuple(
        np.asarray(x) for x in semiglobal_batch_general(qs, ts, p)
    )
    for g, w in zip(got, want):
        assert np.array_equal(g, w)
