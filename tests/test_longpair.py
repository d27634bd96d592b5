"""Sequence-parallel long-pair engine: tiles compose bit-exactly and the
sharded score equals the single-device oracle (virtual 8-device mesh)."""

import numpy as np
import jax.numpy as jnp

from swtpu.core.scoring import DNA_10_30_15, DNA_111
from swtpu.oracle import sw_score
from swtpu.parallel import make_mesh, longpair_sw_score
from swtpu.parallel.longpair import _tile_scan, tile_sw_reference


def test_tile_scan_matches_reference(rng):
    from swtpu.kernels.xla.sw_scan import _extended_table

    table = _extended_table(DNA_10_30_15)
    for R, C in [(8, 8), (16, 8), (8, 24), (5, 7)]:
        q = rng.integers(0, 4, R)
        t = rng.integers(0, 4, C)
        top = rng.integers(0, 50, C)
        left = rng.integers(0, 50, R)
        corner = int(rng.integers(0, 50))
        bref, rref, bestref = tile_sw_reference(
            q, t, top, left, corner, DNA_10_30_15.matrix, 15
        )
        b, r, best, _, _ = _tile_scan(
            jnp.asarray(q, jnp.int32),
            jnp.asarray(t, jnp.int32),
            jnp.asarray(top, jnp.int32),
            jnp.asarray(left, jnp.int32),
            jnp.asarray(corner, jnp.int32),
            jnp.asarray(table),
            4,
            jnp.int32(15),
        )
        assert np.array_equal(np.asarray(b), bref)
        assert np.array_equal(np.asarray(r), rref)
        assert int(best) == bestref


def test_tile_colscan_matches_tile_scan(rng):
    """The round-4 column-parallel strip engine is bit-equal to the
    anti-diagonal tile scan on everything it returns — boundaries,
    score, AND the row-major-first endpoint."""
    from swtpu.kernels.xla.sw_scan import _extended_table
    from swtpu.parallel.longpair import _tile_colscan

    table = _extended_table(DNA_10_30_15)
    for R, C in [(8, 8), (16, 8), (8, 24), (5, 7), (32, 16)]:
        q = rng.integers(0, 4, R)
        t = rng.integers(0, 4, C)
        top = rng.integers(0, 50, C)
        left = rng.integers(0, 50, R)
        corner = int(rng.integers(0, 50))
        args = (
            jnp.asarray(q, jnp.int32),
            jnp.asarray(t, jnp.int32),
            jnp.asarray(top, jnp.int32),
            jnp.asarray(left, jnp.int32),
            jnp.asarray(corner, jnp.int32),
            jnp.asarray(table),
            4,
            jnp.int32(15),
        )
        ref = _tile_scan(*args)
        got = _tile_colscan(*args)
        for a, b in zip(ref, got):
            assert np.array_equal(np.asarray(a), np.asarray(b)), (R, C)


def test_tile_colscan_affine_matches_tile_scan(rng):
    """Affine column tile bit-equal to the anti-diagonal affine tile on
    every return (H/F boundary rows, right H/E columns, score,
    endpoint) — incl. the F-boundary fold into the prefix seed."""
    from swtpu.kernels.xla.sw_scan import _extended_table
    from swtpu.parallel.longpair import (
        _tile_colscan_affine,
        _tile_scan_affine,
    )

    from swtpu.core.scoring import ScoringParams, dna_matrix

    params = ScoringParams(dna_matrix(10, -30), gap_open=40, gap_extend=15)
    table = _extended_table(params)
    for R, C in [(8, 8), (16, 8), (8, 24), (5, 7), (32, 16)]:
        q = rng.integers(0, 4, R)
        t = rng.integers(0, 4, C)
        top = rng.integers(0, 90, C)
        top_f = rng.integers(-60, 40, C)
        left = rng.integers(0, 90, R)
        left_e = rng.integers(-60, 40, R)
        corner = int(rng.integers(0, 90))
        args = (
            jnp.asarray(q, jnp.int32),
            jnp.asarray(t, jnp.int32),
            jnp.asarray(top, jnp.int32),
            jnp.asarray(top_f, jnp.int32),
            jnp.asarray(left, jnp.int32),
            jnp.asarray(left_e, jnp.int32),
            jnp.asarray(corner, jnp.int32),
            jnp.asarray(table),
            4,
            40,
            15,
        )
        ref = _tile_scan_affine(*args)
        got = _tile_colscan_affine(*args)
        for a, b in zip(ref, got):
            assert np.array_equal(np.asarray(a), np.asarray(b)), (R, C)


def test_auto_block():
    """_auto_block minimizes (nb + D - 1) * (R + Lt/nb) over divisors."""
    from swtpu.parallel.longpair import _auto_block

    # one device: one fat tile (no pipeline to fill)
    assert _auto_block(4096, 4096, 1) == 4096
    # 8 devices, R = 512: brute-force the divisor optimum
    Lq, Lt, D = 4096, 4096, 8
    R = Lq // D
    best = min(
        (nb for nb in range(1, Lt + 1) if Lt % nb == 0),
        key=lambda nb: (nb + D - 1) * (R + Lt // nb),
    )
    assert _auto_block(Lq, Lt, D) == Lt // best
    # prime target length: only divisor is itself
    assert _auto_block(64, 97, 4) == 97
    # tiny target (every block < 64): fall back to one block
    assert _auto_block(64, 32, 4) == 32


def test_longpair_auto_block_score(rng):
    """block=None (auto) produces the same score as explicit blocks."""
    mesh = make_mesh(8, axis="sp")
    q = rng.integers(0, 4, 8 * 48).astype(np.uint8)
    t = rng.integers(0, 4, 384).astype(np.uint8)
    want = sw_score(q, t, DNA_111)
    assert longpair_sw_score(q, t, DNA_111, mesh) == want


def test_longpair_sharded_score(rng):
    mesh = make_mesh(8, axis="sp")
    q = rng.integers(0, 4, 8 * 48).astype(np.uint8)
    t = rng.integers(0, 4, 384).astype(np.uint8)
    for params in (DNA_10_30_15, DNA_111):
        got = longpair_sw_score(q, t, params, mesh, block=96)
        assert got == sw_score(q, t, params)


def test_longpair_rectangular(rng):
    mesh = make_mesh(8, axis="sp")
    q = rng.integers(0, 4, 8 * 16).astype(np.uint8)
    t = rng.integers(0, 4, 640).astype(np.uint8)
    got = longpair_sw_score(q, t, DNA_111, mesh, block=64)
    assert got == sw_score(q, t, DNA_111)


def test_longpair_affine_sharded_score(rng):
    """Affine (Gotoh) longpair: F rides the strip exchange, E the block
    carry; sharded score == single-device affine oracle."""
    from swtpu.core import mutate
    from swtpu.core.scoring import ScoringParams, dna_matrix
    from swtpu.oracle.affine import sw_affine_score

    mesh = make_mesh(8, axis="sp")
    for params in (
        ScoringParams(dna_matrix(10, -30), gap_open=40, gap_extend=15),
        ScoringParams(dna_matrix(1, -1), gap_open=3, gap_extend=1),
    ):
        q = rng.integers(0, 4, 256).astype(np.uint8)
        t = mutate(rng, q, out_len=256)
        got = longpair_sw_score(q, t, params, mesh, block=64)
        assert got == sw_affine_score(q, t, params)


def test_longpair_protein(rng):
    """General-matrix (BLOSUM62) longpair, linear + affine, vs the
    single-device oracles."""
    from swtpu.core.protein import BLOSUM62, blosum62_params
    from swtpu.core.scoring import ScoringParams
    from swtpu.oracle.affine import sw_affine_score

    mesh = make_mesh(8, axis="sp")
    q = rng.integers(0, 24, 8 * 16).astype(np.uint8)
    t = rng.integers(0, 24, 192).astype(np.uint8)
    lin = ScoringParams.linear(BLOSUM62, 8)
    assert longpair_sw_score(q, t, lin, mesh, block=64) == sw_score(
        q, t, lin
    )
    aff = blosum62_params()
    assert longpair_sw_score(q, t, aff, mesh, block=64) == sw_affine_score(
        q, t, aff
    )


def test_longpair_align_traceback(rng):
    """Sharded forward + host walk == single-device oracle traceback."""
    from swtpu.core import mutate
    from swtpu.core.scoring import ScoringParams, dna_matrix
    from swtpu.oracle.affine import sw_affine_traceback
    from swtpu.oracle.sw import sw_traceback
    from swtpu.parallel import longpair_sw_align

    mesh = make_mesh(8, axis="sp")
    q = rng.integers(0, 4, 8 * 32).astype(np.uint8)
    t = mutate(rng, q, out_len=256)
    got = longpair_sw_align(q, t, DNA_10_30_15, mesh, block=64)
    assert got == sw_traceback(q, t, DNA_10_30_15)
    aff = ScoringParams(dna_matrix(10, -30), gap_open=40, gap_extend=15)
    got = longpair_sw_align(q, t, aff, mesh, block=64)
    assert got == sw_affine_traceback(q, t, aff)


def test_strip_tile_pallas_matches_colscan(rng):
    """The Pallas strip-tile engine (kernels/pallas/longpair_strip.py)
    is bit-equal to _tile_colscan on every return — boundaries, score,
    endpoint — across uniform, general-matrix, and odd geometries
    (interpret mode on CPU)."""
    from jax.experimental.pallas import tpu as pltpu

    from swtpu.core.scoring import ScoringParams
    from swtpu.kernels.pallas.longpair_strip import strip_tile
    from swtpu.kernels.xla.sw_scan import _extended_table
    from swtpu.parallel.longpair import _tile_colscan

    gen = ScoringParams.linear(
        np.array(
            [[5, -4, -2, -4], [-4, 5, -4, -2],
             [-2, -4, 5, -4], [-4, -2, -4, 5]]
        ),
        3,
    )
    with pltpu.force_tpu_interpret_mode():
        for params in (DNA_10_30_15, gen):
            table = jnp.asarray(_extended_table(params))
            for R, C in [(8, 8), (16, 24), (5, 7), (17, 9)]:
                q = rng.integers(0, 4, R)
                t = rng.integers(0, 4, C)
                top = rng.integers(0, 50, C)
                left = rng.integers(0, 50, R)
                corner = int(rng.integers(0, 50))
                ref = _tile_colscan(
                    jnp.asarray(q, jnp.int32), jnp.asarray(t, jnp.int32),
                    jnp.asarray(top, jnp.int32),
                    jnp.asarray(left, jnp.int32),
                    jnp.asarray(corner, jnp.int32), table, 4,
                    jnp.int32(params.gap),
                )
                got = strip_tile(q, t, top, left, corner, params)
                for i, (a, b) in enumerate(zip(ref, got)):
                    assert np.array_equal(
                        np.asarray(a), np.asarray(b)
                    ), (R, C, i)


def test_strip_tile_affine_pallas_matches_colscan(rng):
    """Affine Pallas strip tile vs _tile_colscan_affine (all 7 returns,
    interpret mode)."""
    from jax.experimental.pallas import tpu as pltpu

    from swtpu.core.scoring import ScoringParams
    from swtpu.kernels.pallas.longpair_strip import strip_tile_affine
    from swtpu.kernels.xla.sw_scan import _extended_table
    from swtpu.parallel.longpair import _tile_colscan_affine

    aff = ScoringParams(
        matrix=DNA_10_30_15.matrix, gap_open=12, gap_extend=3
    )
    table = jnp.asarray(_extended_table(aff))
    with pltpu.force_tpu_interpret_mode():
        for R, C in [(8, 8), (16, 24), (5, 7)]:
            q = rng.integers(0, 4, R)
            t = rng.integers(0, 4, C)
            top = rng.integers(0, 50, C)
            topf = rng.integers(-30, 40, C)
            left = rng.integers(0, 50, R)
            lefte = rng.integers(-30, 40, R)
            corner = int(rng.integers(0, 50))
            ref = _tile_colscan_affine(
                jnp.asarray(q, jnp.int32), jnp.asarray(t, jnp.int32),
                jnp.asarray(top, jnp.int32), jnp.asarray(topf, jnp.int32),
                jnp.asarray(left, jnp.int32),
                jnp.asarray(lefte, jnp.int32),
                jnp.asarray(corner, jnp.int32), table, 4,
                jnp.int32(12), jnp.int32(3),
            )
            got = strip_tile_affine(
                q, t, top, topf, left, lefte, corner, aff
            )
            for i, (a, b) in enumerate(zip(ref, got)):
                assert np.array_equal(np.asarray(a), np.asarray(b)), (
                    R, C, i,
                )


def test_longpair_strip_sweep_matches_xla(rng):
    """The full sharded sweep on the Pallas strip engine returns the
    same merged (score, end_i, end_j) as the XLA engine (2 virtual
    devices — enough to exercise the ppermute top exchange and the
    my>0 boundary injects; interpret-mode Pallas callbacks deadlock
    inside >=4-device SPMD programs on this 1-core CI host, so the
    8-device sweep is validated with the XLA tile engine + the
    bit-equal tile parity tests above): linear uniform + affine."""
    from jax.experimental.pallas import tpu as pltpu

    from swtpu.core.scoring import ScoringParams
    from swtpu.parallel.longpair import _merge_device_ends, _run_longpair

    mesh = make_mesh(2, axis="sp")
    aff = ScoringParams(
        matrix=DNA_10_30_15.matrix, gap_open=12, gap_extend=3
    )
    with pltpu.force_tpu_interpret_mode():
        for params in (DNA_111, aff):
            q = rng.integers(0, 4, 32)
            t = rng.integers(0, 4, 48)
            ref = _merge_device_ends(
                _run_longpair(q, t, params, mesh, "sp", 16, engine="xla")
            )
            got = _merge_device_ends(
                _run_longpair(
                    q, t, params, mesh, "sp", 16, engine="pallas"
                )
            )
            assert ref == got
