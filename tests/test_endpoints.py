"""Device argmax endpoints for the LOCAL (SW) engines + the endpoint-
bounded host traceback (the reference's device-forward/host-walk split,
source.cpp:1526-1576). Tie-breaks are spec: first max in row-major scan
order, tested with tie-rich scorings (CLAUDE.md)."""

import numpy as np
from jax.experimental.pallas import tpu as pltpu

from swtpu.core import random_dna
from swtpu.core.scoring import DNA_10_30_15, DNA_111, ScoringParams, dna_matrix
from swtpu.oracle import sw_traceback
from swtpu.oracle.affine import sw_affine_traceback
from swtpu.kernels.xla.sw_scan import sw_batch_diag_ends
from swtpu.kernels.xla.affine_scan import sw_affine_batch_diag_ends
from swtpu.batch import sw_align_batch

TIE_RICH = ScoringParams.linear(dna_matrix(2, -1), 1)


def test_xla_ends_vs_oracle_tie_rich(rng):
    qs = random_dna(rng, (48, 37))
    ts = random_dna(rng, (48, 53))
    sc, ei, ej = (np.asarray(x) for x in sw_batch_diag_ends(qs, ts, TIE_RICH))
    for b in range(48):
        s0, path = sw_traceback(qs[b], ts[b], TIE_RICH)
        assert s0 == sc[b] and path[-1] == (ei[b], ej[b])


def test_xla_ends_score_zero_maps_to_origin():
    # all-mismatch pair under (10,-30,15): score 0, endpoint (0, 0)
    q = np.zeros((1, 16), np.uint8)
    t = np.full((1, 16), 1, np.uint8)
    sc, ei, ej = (np.asarray(x) for x in sw_batch_diag_ends(q, t, DNA_10_30_15))
    assert sc[0] == 0 and ei[0] == 0 and ej[0] == 0


def test_xla_ends_varlen_padded(rng):
    # pads (q:4, t:5) must not perturb endpoints
    qs = random_dna(rng, (16, 40))
    ts = random_dna(rng, (16, 60))
    qs[:, 25:] = 4
    ts[:, 33:] = 5
    sc, ei, ej = (np.asarray(x) for x in sw_batch_diag_ends(qs, ts, TIE_RICH))
    for b in range(16):
        s0, path = sw_traceback(qs[b, :25], ts[b, :33], TIE_RICH)
        assert s0 == sc[b] and path[-1] == (ei[b], ej[b])


def test_affine_xla_ends_vs_oracle(rng):
    p = ScoringParams(matrix=dna_matrix(2, -1), gap_open=3, gap_extend=1)
    qs = random_dna(rng, (32, 33))
    ts = random_dna(rng, (32, 41))
    sc, ei, ej = (np.asarray(x) for x in sw_affine_batch_diag_ends(qs, ts, p))
    for b in range(32):
        s0, path = sw_affine_traceback(qs[b], ts[b], p)
        assert s0 == sc[b] and path[-1] == (ei[b], ej[b])


def test_pallas_ends_matches_xla(rng):
    from swtpu.kernels.pallas.sw_batch import sw_batch_pallas_ends

    qs = random_dna(rng, (1024, 24))
    ts = random_dna(rng, (1024, 32))
    with pltpu.force_tpu_interpret_mode():
        got = [np.asarray(x) for x in sw_batch_pallas_ends(qs, ts, TIE_RICH)]
    want = [np.asarray(x) for x in sw_batch_diag_ends(qs, ts, TIE_RICH)]
    for g, w in zip(got, want):
        assert np.array_equal(g, w)


def test_pallas_affine_ends_matches_xla(rng):
    from swtpu.kernels.pallas.sw_affine import sw_affine_pallas_ends

    p = ScoringParams(matrix=dna_matrix(2, -1), gap_open=3, gap_extend=1)
    qs = random_dna(rng, (1024, 24))
    ts = random_dna(rng, (1024, 32))
    with pltpu.force_tpu_interpret_mode():
        got = [np.asarray(x) for x in sw_affine_pallas_ends(qs, ts, p)]
    want = [np.asarray(x) for x in sw_affine_batch_diag_ends(qs, ts, p)]
    for g, w in zip(got, want):
        assert np.array_equal(g, w)


def test_pallas_profile_ends_matches_xla(rng):
    # general matrix + streamed row groups (n > ROW_GROUP)
    from swtpu.kernels.pallas.sw_profile import sw_batch_profile_pallas_ends

    M = np.array(
        [[3, -2, -1, -2], [-2, 3, -2, -1], [-1, -2, 3, -2], [-2, -1, -2, 3]]
    )
    p = ScoringParams.linear(M, 2)
    qs = random_dna(rng, (1024, 72))
    ts = random_dna(rng, (1024, 32))
    with pltpu.force_tpu_interpret_mode():
        got = [
            np.asarray(x) for x in sw_batch_profile_pallas_ends(qs, ts, p)
        ]
    want = [np.asarray(x) for x in sw_batch_diag_ends(qs, ts, p)]
    for g, w in zip(got, want):
        assert np.array_equal(g, w)


def test_bounded_traceback_paths_linear(rng):
    # sw_align_batch now walks only the [0..ei, 0..ej] prefix; paths must
    # stay identical to the full-matrix oracle, tie-breaks included
    qs = random_dna(rng, (32, 80))
    ts = random_dna(rng, (32, 96))
    got = sw_align_batch(qs, ts, TIE_RICH)
    for b in range(32):
        assert got[b] == sw_traceback(qs[b], ts[b], TIE_RICH)


def test_bounded_traceback_paths_affine(rng):
    p = ScoringParams(matrix=dna_matrix(2, -1), gap_open=3, gap_extend=1)
    qs = random_dna(rng, (16, 64))
    ts = random_dna(rng, (16, 72))
    got = sw_align_batch(qs, ts, p)
    for b in range(16):
        assert got[b] == sw_affine_traceback(qs[b], ts[b], p)


def test_bounded_traceback_zero_score():
    q = np.zeros((2, 12), np.uint8)
    t = np.full((2, 12), 1, np.uint8)
    got = sw_align_batch(q, t, DNA_10_30_15)
    assert got == [(0, [(0, 0)]), (0, [(0, 0)])]
