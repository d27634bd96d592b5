"""Native C++ layer vs numpy oracles (exact parity)."""

import numpy as np
import pytest

from swtpu import native
from swtpu.core import random_dna, mutate, pack_2bit, unpack_2bit
from swtpu.core.scoring import DNA_111, DNA_10_30_15
from swtpu.oracle import sw_traceback, semiglobal_full, banded_xdrop

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_native_codec(rng):
    seq = random_dna(rng, (512,))
    p = pack_2bit(seq)
    assert np.array_equal(native.pack_2bit(seq), p)
    assert np.array_equal(native.unpack_2bit(p), seq)


def test_native_sw_traceback(rng):
    for params in (DNA_111, DNA_10_30_15):
        for _ in range(4):
            q = random_dna(rng, (90,))
            t = random_dna(rng, (110,))
            assert native.sw_traceback(
                q, t, params.matrix, params.gap
            ) == sw_traceback(q, t, params)


def test_native_semiglobal(rng):
    for _ in range(4):
        q = random_dna(rng, (120,))
        t = mutate(rng, q, out_len=120)
        assert native.semiglobal_traceback(q, t, 1, 1, 1) == semiglobal_full(
            q, t
        )


def test_native_semiglobal_matrix_walkers(rng):
    """C++ general-matrix semiglobal walkers == generalized numpy oracle
    (linear + Gotoh), on BLOSUM62 protein pairs."""
    from swtpu.core.protein import BLOSUM62
    from swtpu.oracle.semiglobal import semiglobal_affine_full

    for _ in range(3):
        q = rng.integers(0, 24, (70,)).astype(np.uint8)
        t = rng.integers(0, 24, (80,)).astype(np.uint8)
        assert native.semiglobal_traceback_matrix(
            q, t, BLOSUM62, 4
        ) == semiglobal_full(q, t, gap=4, matrix=BLOSUM62)
        assert native.semiglobal_affine_traceback(
            q, t, BLOSUM62, 11, 1
        ) == semiglobal_affine_full(
            q, t, gap_open=11, gap_extend=1, matrix=BLOSUM62
        )


def test_native_banded_walker(rng):
    for _ in range(3):
        q = random_dna(rng, (250,))
        t = mutate(rng, q, out_len=250)
        res = banded_xdrop(q, t, return_state=True)
        path = native.banded_traceback(
            q,
            t,
            res.band_history,
            res.pos_y,
            res.n_rounds,
            res.max_round,
            res.score + 70,
        )
        assert path == res.path


def test_native_banded_affine_walker(rng):
    from swtpu.oracle.banded_affine import banded_affine_xdrop

    for _ in range(3):
        q = random_dna(rng, (250,))
        t = mutate(rng, q, out_len=250)
        res = banded_affine_xdrop(
            q, t, gap_open=3, gap_extend=1, return_state=True
        )
        path = native.banded_affine_traceback(
            q,
            t,
            np.asarray(res.h_hist, np.int32),
            np.asarray(res.pos_y, np.int32),
            res.n_rounds,
            res.max_round,
            res.score + 70,
            1,
            1,
            3,
            1,
        )
        assert path == res.path


def test_native_banded_static_walker(rng):
    from swtpu.core.scoring import ScoringParams, dna_matrix
    from swtpu.oracle.banded_static import sw_banded_static_traceback

    AFF = ScoringParams(dna_matrix(1, -1), gap_open=3, gap_extend=1)
    for params in (DNA_111, AFF):
        for _ in range(3):
            q = random_dna(rng, (120,))
            t = mutate(rng, q, out_len=120)
            assert native.banded_static_traceback(
                q, t, params.matrix, params.gap_open, params.gap_extend, 16
            ) == sw_banded_static_traceback(q, t, params, 16)


def test_native_banded_static_walker_protein(rng):
    from swtpu.core.protein import BLOSUM62
    from swtpu.core.scoring import ScoringParams
    from swtpu.oracle.banded_static import sw_banded_static_traceback

    pp = ScoringParams(BLOSUM62, gap_open=11, gap_extend=1)
    for _ in range(2):
        q = rng.integers(0, 24, 80).astype(np.uint8)
        t = rng.integers(0, 24, 80).astype(np.uint8)
        assert native.banded_static_traceback(
            q, t, pp.matrix, 11, 1, 16
        ) == sw_banded_static_traceback(q, t, pp, 16)


def test_native_sw_traceback_protein():
    """Regression: the C++ local walker must stride the matrix by its
    real alphabet size (it hardcoded 4, breaking linear-gap BLOSUM62)."""
    from swtpu.core.protein import BLOSUM62
    from swtpu.core.scoring import ScoringParams
    from swtpu.oracle.sw import sw_traceback

    rng2 = np.random.default_rng(23)
    q = rng2.integers(0, 24, 60).astype(np.uint8)
    t = rng2.integers(0, 24, 70).astype(np.uint8)
    p = ScoringParams.linear(BLOSUM62, 8)
    assert native.sw_traceback(q, t, BLOSUM62, 8) == sw_traceback(q, t, p)


def test_native_decode_move_wire(rng):
    """C++ move-wire decoder vs the numpy decode path: identical tuple
    lists AND identical array form on randomized synthetic wires (meta +
    2-bit packed moves, the device banded walker's format)."""
    from swtpu.kernels.xla import banded_scan

    B, move_bytes = 7, 64
    wire = np.zeros((B, 20 + move_bytes), np.uint8)
    metas = []
    for b in range(B):
        nsteps = int(rng.integers(0, 4 * move_bytes + 1))
        sy = int(rng.integers(nsteps, nsteps + 50))
        sx = int(rng.integers(nsteps, nsteps + 50))
        score = int(rng.integers(-5, 200))
        moves = rng.integers(0, 3, nsteps)  # 0/1/2 only, like the walker
        packed = np.zeros(move_bytes, np.uint8)
        for k, mv in enumerate(moves):
            packed[k >> 2] |= np.uint8(mv) << ((k & 3) * 2)
        wire[b, :20] = np.frombuffer(
            np.array([score, sy, sx, nsteps, 1], np.int32).tobytes(),
            np.uint8,
        )
        wire[b, 20:] = packed
        metas.append(nsteps)

    from swtpu import native

    assert native.available()
    scores_c, len_c, paths_c = native.decode_move_wire(wire)

    # numpy twin (force the fallback branch)
    import unittest.mock as mock

    with mock.patch.object(native, "available", lambda: False):
        tuples_np = banded_scan.decode_device_walk(wire)
        s_np, l_np, p_np = banded_scan.decode_device_walk(
            wire, as_arrays=True
        )
    assert np.array_equal(scores_c, s_np)
    assert np.array_equal(len_c, l_np)
    for b in range(B):
        assert np.array_equal(paths_c[b, : len_c[b]], p_np[b, : l_np[b]])
        got = [tuple(p) for p in paths_c[b, : len_c[b]].tolist()]
        assert (int(scores_c[b]), got) == tuples_np[b]
        assert len_c[b] == metas[b] + 1

    # an unset ok flag must raise, naming the first bad pair
    wire[3, 16:20] = 0
    import pytest

    with pytest.raises(AssertionError, match="pair 3"):
        native.decode_move_wire(wire)
