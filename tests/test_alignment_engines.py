"""Differential tests for the semi-global, banded, wavefront and traceback
engines (device vs oracle, fixed seed)."""

import numpy as np
from jax.experimental.pallas import tpu as pltpu

from swtpu.core import random_dna, mutate
from swtpu.core.scoring import DNA_10_30_15, DNA_111
from swtpu.oracle import (
    sw_score_batch,
    sw_traceback,
    semiglobal_full,
    banded_xdrop,
)
from swtpu.kernels.xla.semiglobal_scan import semiglobal_batch_diag
from swtpu.kernels.xla.banded_scan import banded_xdrop_batch
from swtpu.kernels.pallas.sw_wavefront import sw_wavefront_pallas
from swtpu.batch import sw_align_batch, banded_align_batch


def test_semiglobal_scores_and_endpoints(rng):
    for trial in range(4):
        L1, L2 = [(60, 60), (100, 80), (33, 47), (64, 64)][trial]
        q = random_dna(rng, (4, L1))
        t = np.stack(
            [mutate(rng, q[b], out_len=L2) for b in range(2)]
            + [random_dna(rng, (L2,)) for _ in range(2)]
        )
        s, ei, ej = (np.asarray(x) for x in semiglobal_batch_diag(q, t))
        for b in range(4):
            sc, path = semiglobal_full(q[b], t[b])
            assert (int(s[b]), int(ei[b]), int(ej[b])) == (
                sc,
                path[-1][0],
                path[-1][1],
            )


def test_banded_forward_state_parity(rng):
    """Device band history / positions / rounds == scalar oracle state."""
    B = 4
    qs = random_dna(rng, (B, 200))
    ts = np.stack([mutate(rng, qs[b], out_len=200) for b in range(B)])
    res = banded_xdrop_batch(qs, ts)
    for b in range(B):
        orc = banded_xdrop(qs[b], ts[b], return_state=True)
        nr = int(res.n_rounds[b])
        assert nr == orc.n_rounds
        assert int(res.score[b]) == orc.score
        assert int(res.max_round[b]) == orc.max_round
        assert np.array_equal(res.band_history[:nr, b], orc.band_history)
        assert np.array_equal(res.pos_y[:nr, b], orc.pos_y)


def test_banded_align_paths(rng):
    B = 3
    qs = random_dna(rng, (B, 300))
    ts = np.stack([mutate(rng, qs[b], out_len=300) for b in range(B)])
    got = banded_align_batch(qs, ts)
    for b in range(B):
        assert got[b] == banded_xdrop(qs[b], ts[b])


def test_banded_varlen(rng):
    """Mixed lengths in one padded batch."""
    B = 3
    qs = random_dna(rng, (B, 256))
    ts = random_dna(rng, (B, 256))
    lens_q = [256, 100, 180]
    lens_t = [256, 120, 60]
    for b in range(1, B):
        ts[b, : lens_t[b]] = mutate(
            rng, qs[b, : lens_q[b]], out_len=lens_t[b]
        )
    got = banded_align_batch(qs, ts, lens_q, lens_t)
    for b in range(B):
        want = banded_xdrop(qs[b, : lens_q[b]], ts[b, : lens_t[b]])
        assert got[b] == want


def test_wavefront_schedule_parity(rng):
    qs = random_dna(rng, (8, 128))
    ts = random_dna(rng, (8, 128))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(sw_wavefront_pallas(qs, ts, DNA_10_30_15))
    orc = sw_score_batch(qs, ts, DNA_10_30_15)
    assert np.array_equal(out, orc.astype(np.int32))


def test_wavefront_rectangular(rng):
    qs = random_dna(rng, (8, 100))
    ts = random_dna(rng, (8, 150))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(sw_wavefront_pallas(qs, ts, DNA_111))
    orc = sw_score_batch(qs, ts, DNA_111)
    assert np.array_equal(out, orc.astype(np.int32))


def test_sw_align_batch_paths(rng):
    qs = random_dna(rng, (4, 80))
    ts = random_dna(rng, (4, 96))
    got = sw_align_batch(qs, ts, DNA_111)
    for b in range(4):
        assert got[b] == sw_traceback(qs[b], ts[b], DNA_111)


def test_colscan_schedule_parity(rng):
    from swtpu.kernels.xla.colscan import sw_batch_colscan

    qs = random_dna(rng, (8, 100))
    ts = random_dna(rng, (8, 130))
    for params in (DNA_10_30_15, DNA_111):
        dev = np.asarray(sw_batch_colscan(qs, ts, params))
        assert np.array_equal(
            dev, sw_score_batch(qs, ts, params).astype(np.int32)
        )


def test_semiglobal_pallas_matches_xla(rng):
    from swtpu.kernels.pallas.semiglobal_batch import semiglobal_batch_pallas
    from swtpu.kernels.xla.semiglobal_scan import semiglobal_batch_diag

    # 1000 (not 1024): the batch axis must self-pad to the 1024-pair tile
    qs = random_dna(rng, (1000, 64))
    ts = random_dna(rng, (1000, 64))
    ts[:4] = np.stack([mutate(rng, qs[b], out_len=64) for b in range(4)])
    with pltpu.force_tpu_interpret_mode():
        s1, i1, j1 = (
            np.asarray(x) for x in semiglobal_batch_pallas(qs, ts)
        )
    s2, i2, j2 = (np.asarray(x) for x in semiglobal_batch_diag(qs, ts))
    assert np.array_equal(s1, s2)
    assert np.array_equal(i1, i2)
    assert np.array_equal(j1, j2)


def test_semiglobal_general_matrix(rng):
    """General-substitution-matrix semi-global (table engine + matrix
    walkers): linear DNA 5/-4 and affine BLOSUM62 vs generalized oracle."""
    from swtpu.core.protein import BLOSUM62, blosum62_params
    from swtpu.core.scoring import ScoringParams, dna_matrix
    from swtpu.batch import semiglobal_align_batch
    from swtpu.oracle.semiglobal import semiglobal_affine_full

    mat = dna_matrix(5, -4)
    qs = random_dna(rng, (6, 48))
    ts = np.stack(
        [mutate(rng, qs[b], out_len=60) for b in range(3)]
        + [random_dna(rng, (60,)) for _ in range(3)]
    )
    out = semiglobal_align_batch(
        qs, ts, params=ScoringParams.linear(mat, 3)
    )
    for b in range(6):
        assert out[b] == semiglobal_full(qs[b], ts[b], gap=3, matrix=mat)

    qp = rng.integers(0, 24, (4, 40)).astype(np.uint8)
    tp = rng.integers(0, 24, (4, 50)).astype(np.uint8)
    out = semiglobal_align_batch(qp, tp, params=blosum62_params())
    for b in range(4):
        assert out[b] == semiglobal_affine_full(
            qp[b], tp[b], gap_open=11, gap_extend=1, matrix=BLOSUM62
        )


def test_banded_general_matrix(rng):
    """Adaptive-banded X-drop with a general substitution matrix
    (BLOSUM62): XLA table engine + matrix walkers vs the generalized
    scalar oracles, linear + affine; plus the uniform-matrix==uniform-mode
    equivalence that pins the pad contract (pads score matrix.min())."""
    from swtpu.core.protein import BLOSUM62
    from swtpu.core.scoring import dna_matrix
    from swtpu.batch.traceback import banded_align_batch
    from swtpu.oracle.banded_affine import banded_affine_xdrop

    q = random_dna(rng, (120,))
    t = mutate(rng, q, out_len=120)
    assert banded_xdrop(q, t, 1, 1, 1) == banded_xdrop(
        q, t, matrix=dna_matrix(1, -1), gap=1
    )
    assert banded_affine_xdrop(q, t, 1, 1, 3, 1) == banded_affine_xdrop(
        q, t, gap_open=3, gap_extend=1, matrix=dna_matrix(1, -1)
    )

    B = 3
    qs = rng.integers(0, 24, (B, 120)).astype(np.uint8)
    ts = qs.copy()
    for b in range(B):
        idx = rng.integers(0, 120, 20)
        ts[b, idx] = rng.integers(0, 24, 20)
    out = banded_align_batch(qs, ts, gap=6, x_threshold=120, matrix=BLOSUM62)
    for b in range(B):
        assert out[b] == banded_xdrop(
            qs[b], ts[b], gap=6, x_threshold=120, matrix=BLOSUM62
        )
    out = banded_align_batch(
        qs, ts, gap_open=11, gap_extend=1, x_threshold=120, matrix=BLOSUM62
    )
    for b in range(B):
        assert out[b] == banded_affine_xdrop(
            qs[b], ts[b], gap_open=11, gap_extend=1, x_threshold=120,
            matrix=BLOSUM62,
        )


def test_semiglobal_pallas_endpoint_tie_break(rng):
    """Regression: row-major-first endpoint rule under ties. A per-SLOT
    tracking scheme (slot = column mod 16, shared across chunks) visited
    chunks before rows and picked a deeper-row cell from an earlier chunk
    (found by randomized search at (2,-1,1) scoring); the per-COLUMN
    scheme must match the XLA engine on tie-rich batches and on the
    specific divergent pair."""
    from swtpu.kernels.pallas.semiglobal_batch import semiglobal_batch_pallas

    q = np.array([2,2,1,3,1,2,1,0,2,2,1,0,1,3,1,3], np.uint8)
    t = np.array(
        [3,1,2,0,2,2,3,1,3,3,3,2,3,3,1,0,0,0,1,0,1,2,0,3,
         1,2,0,3,2,0,1,0,0,3,1,3,1,2,3,1,0,0,2,2,2,1,1,1], np.uint8)
    qs = np.broadcast_to(q, (1024, 16)).copy()
    ts = np.broadcast_to(t, (1024, 48)).copy()
    qs[1:] = rng.integers(0, 3, (1023, 16))
    ts[1:] = rng.integers(0, 3, (1023, 48))
    with pltpu.force_tpu_interpret_mode():
        got = tuple(
            np.asarray(x)
            for x in semiglobal_batch_pallas(qs, ts, match=2, mismatch=1)
        )
    want = tuple(
        np.asarray(x)
        for x in semiglobal_batch_diag(qs, ts, match=2, mismatch=1)
    )
    for g, w in zip(got, want):
        assert np.array_equal(g, w)


def test_semiglobal_varlen_masked(rng):
    """Per-pair lengths (lens_q/lens_t): masked argmax == the unpadded
    oracle on every pair, linear + affine + protein, tie-rich scoring."""
    from swtpu.core.scoring import ScoringParams
    from swtpu.core.protein import BLOSUM62
    from swtpu.kernels.xla.semiglobal_scan import semiglobal_batch_general
    from swtpu.oracle.semiglobal import semiglobal_affine_full

    B, n, m = 12, 40, 56
    qs = random_dna(rng, (B, n))
    ts = random_dna(rng, (B, m))
    lq = rng.integers(8, n + 1, B)
    lt = rng.integers(8, m + 1, B)
    for b in range(B):
        qs[b, lq[b]:] = 4
        ts[b, lt[b]:] = 5
    fwd = [
        np.asarray(x)
        for x in semiglobal_batch_diag(qs, ts, 2, 1, 1, lens_q=lq, lens_t=lt)
    ]
    for b in range(B):
        s0, path = semiglobal_full(qs[b, : lq[b]], ts[b, : lt[b]], 2, 1, 1)
        assert (s0, path[-1]) == (fwd[0][b], (fwd[1][b], fwd[2][b]))
    fwd = [
        np.asarray(x)
        for x in semiglobal_batch_diag(
            qs, ts, 2, 1, gap_open=3, gap_extend=1, lens_q=lq, lens_t=lt
        )
    ]
    for b in range(B):
        s0, path = semiglobal_affine_full(
            qs[b, : lq[b]], ts[b, : lt[b]], 2, 1, 3, 1
        )
        assert (s0, path[-1]) == (fwd[0][b], (fwd[1][b], fwd[2][b]))
    p = ScoringParams(BLOSUM62, gap_open=11, gap_extend=1)
    pq = rng.integers(0, 24, (B, n)).astype(np.uint8)
    pt = rng.integers(0, 24, (B, m)).astype(np.uint8)
    for b in range(B):
        pq[b, lq[b]:] = 24
        pt[b, lt[b]:] = 25
    fwd = [
        np.asarray(x)
        for x in semiglobal_batch_general(pq, pt, p, lens_q=lq, lens_t=lt)
    ]
    for b in range(B):
        s0, path = semiglobal_affine_full(
            pq[b, : lq[b]], pt[b, : lt[b]], gap_open=11, gap_extend=1,
            matrix=BLOSUM62,
        )
        assert (s0, path[-1]) == (fwd[0][b], (fwd[1][b], fwd[2][b]))


def test_semiglobal_align_batch_varlen(rng):
    """semiglobal_align_batch with per-pair lengths: paths equal the
    unpadded oracle walk."""
    from swtpu.batch import semiglobal_align_batch

    B, n, m = 6, 36, 44
    qs = random_dna(rng, (B, n))
    ts = random_dna(rng, (B, m))
    lq = rng.integers(10, n + 1, B)
    lt = rng.integers(10, m + 1, B)
    got = semiglobal_align_batch(qs, ts, 2, 1, 1, lens_q=lq, lens_t=lt)
    for b in range(B):
        assert got[b] == semiglobal_full(
            qs[b, : lq[b]], ts[b, : lt[b]], 2, 1, 1
        )


def test_wavefront_protein_blosum62(rng):
    """The score-stream wavefront scores any matrix: BLOSUM62 linear."""
    from jax.experimental.pallas import tpu as pltpu

    from swtpu.core.protein import BLOSUM62, random_protein
    from swtpu.core.scoring import ScoringParams

    p = ScoringParams.linear(BLOSUM62, 11)
    pq = random_protein(rng, (8, 96))
    pt = random_protein(rng, (8, 120))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(sw_wavefront_pallas(pq, pt, p))
    assert np.array_equal(got, sw_score_batch(pq, pt, p).astype(np.int32))
