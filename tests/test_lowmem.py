"""Checkpointed low-memory walker (batch/lowmem.py) + the longpair
endpoint/traceback split (parallel/longpair.py)."""

import numpy as np

from swtpu.core import mutate, random_dna
from swtpu.core.scoring import DNA_10_30_15, ScoringParams, dna_matrix
from swtpu.batch.lowmem import sw_traceback_lowmem
from swtpu.oracle.sw import sw_traceback
from swtpu.oracle.affine import sw_affine_traceback

TIE_RICH = ScoringParams.linear(dna_matrix(2, -1), 1)


def test_lowmem_linear_matches_oracle(rng):
    for trial in range(20):
        n = int(rng.integers(3, 90))
        m = int(rng.integers(3, 90))
        q, t = random_dna(rng, (n,)), random_dna(rng, (m,))
        p = [TIE_RICH, DNA_10_30_15][trial % 2]
        want = sw_traceback(q, t, p)
        # both the C++ twin (default when built) and the numpy path
        assert sw_traceback_lowmem(q, t, p, row_block=8) == want
        assert (
            sw_traceback_lowmem(q, t, p, row_block=8, use_native=False)
            == want
        )
        assert (
            sw_traceback_lowmem(q, t, p, row_block=8, ends=want[1][-1])
            == want
        )


def test_lowmem_affine_matches_oracle(rng):
    for trial in range(20):
        n = int(rng.integers(3, 80))
        m = int(rng.integers(3, 80))
        q = random_dna(rng, (n,))
        t = mutate(rng, q, out_len=m)
        p = [
            ScoringParams(dna_matrix(2, -1), gap_open=3, gap_extend=1),
            ScoringParams(dna_matrix(10, -30), gap_open=40, gap_extend=15),
        ][trial % 2]
        want = sw_affine_traceback(q, t, p)
        assert sw_traceback_lowmem(q, t, p, row_block=8) == want
        assert (
            sw_traceback_lowmem(q, t, p, row_block=8, use_native=False)
            == want
        )
        assert (
            sw_traceback_lowmem(q, t, p, row_block=8, ends=want[1][-1])
            == want
        )


def test_lowmem_native_handles_go_lt_ge(rng):
    """gap_open < gap_extend: the numpy decoupling doesn't apply, but the
    C++ twin's serial recurrences are exact for any gap model."""
    from swtpu import native

    if not native.available():
        import pytest

        pytest.skip("native toolchain unavailable")
    p = ScoringParams(dna_matrix(3, -2), gap_open=1, gap_extend=2)
    for _ in range(6):
        q = random_dna(rng, (40,))
        t = random_dna(rng, (50,))
        want = sw_affine_traceback(q, t, p)
        assert sw_traceback_lowmem(q, t, p, row_block=8) == want


def test_lowmem_zero_score():
    p = DNA_10_30_15
    q = np.zeros(10, np.uint8)
    t = np.full(10, 1, np.uint8)
    assert sw_traceback_lowmem(q, t, p) == (0, [(0, 0)])
    assert sw_traceback_lowmem(q, t, p, ends=(0, 0)) == (0, [(0, 0)])


def test_longpair_ends_and_lowmem_align(rng):
    from swtpu.parallel import make_mesh
    from swtpu.parallel.longpair import longpair_sw_align, longpair_sw_ends

    mesh = make_mesh(8, axis="sp")
    for trial in range(4):
        q = random_dna(rng, (256,))
        t = mutate(rng, q, out_len=192)
        p = TIE_RICH if trial % 2 else DNA_10_30_15
        want = sw_traceback(q, t, p)
        s, ei, ej = longpair_sw_ends(q, t, p, mesh, block=64)
        assert (s, (ei, ej)) == (want[0], want[1][-1])
        got = longpair_sw_align(q, t, p, mesh, block=64, row_block=32)
        assert got == want


def test_longpair_affine_lowmem_align(rng):
    from swtpu.parallel import make_mesh
    from swtpu.parallel.longpair import longpair_sw_align

    mesh = make_mesh(8, axis="sp")
    p = ScoringParams(dna_matrix(10, -30), gap_open=40, gap_extend=15)
    q = random_dna(rng, (256,))
    t = mutate(rng, q, out_len=192)
    assert longpair_sw_align(
        q, t, p, mesh, block=64, row_block=32
    ) == sw_affine_traceback(q, t, p)
