"""Block-adaptive banded X-drop tier tests.

The block oracle (oracle/banded_block.py) IS the contract for the block
kernels — the reference's own oracle-tiering pattern (band-clipped tiers
get band-clipped oracles, full-matrix comparison is statistical only,
source.cpp:2773-2784). Tests here:

- statistical cross-checks of the oracle vs the full-matrix semiglobal
  oracle and the per-round banded oracle on mutation-model pairs;
- structural invariants (path rescoring, corridor geometry, termination);
- the Pallas block engine bit-exact vs the oracle (scores, endpoints,
  band history) in interpret mode.
"""

import numpy as np
import pytest

from swtpu.core import random_dna, mutate
from swtpu.oracle import semiglobal_full
from swtpu.oracle.banded_block import banded_xdrop_block
from swtpu.oracle.semiglobal import banded_xdrop


def _rescore_path(q, t, path, match=1, mismatch=1, gap=1, matrix=None):
    """Recompute a semiglobal path's score from its moves (origin-anchored:
    leading gap moves are charged like the DP's boundary chains)."""
    s = 0
    for (i0, j0), (i1, j1) in zip(path, path[1:]):
        di, dj = i1 - i0, j1 - j0
        assert (di, dj) in ((1, 1), (1, 0), (0, 1))
        if (di, dj) == (1, 1):
            if matrix is not None:
                s += int(matrix[q[i1 - 1], t[j1 - 1]])
            else:
                s += match if q[i1 - 1] == t[j1 - 1] else -mismatch
        else:
            s -= gap
    return s


def test_block_oracle_matches_full_on_homologous(rng):
    """~70% identity pairs stay inside the corridor, so the block tier
    equals the full matrix (scores AND endpoints)."""
    for L in (100, 250, 400):
        for _ in range(4):
            q = random_dna(rng, (L,))
            t = mutate(rng, q, out_len=L)
            fs, fpath = semiglobal_full(q, t)
            bs, bpath = banded_xdrop_block(q, t)
            assert fs == bs
            assert fpath[-1] == bpath[-1]


def test_block_oracle_matches_per_round_statistically(rng):
    """The block tier prunes less inside a block and re-centers at block
    granularity; on mutation-model pairs both banded tiers track the same
    optimum, so scores agree (the statistical cross-check mandated by the
    contract docstring)."""
    for _ in range(8):
        L = int(rng.integers(120, 500))
        q = random_dna(rng, (L,))
        t = mutate(rng, q, out_len=L)
        bs, _ = banded_xdrop(q, t, bandwidth=32, x_threshold=70)
        ks, _ = banded_xdrop_block(
            q, t, width=64, block=32, x_threshold=70
        )
        assert ks == bs


def test_block_oracle_identity_pair():
    q = np.arange(64, dtype=np.uint8) % 4
    s, path = banded_xdrop_block(q, q, match=2, mismatch=3, gap=4)
    assert s == 2 * 64
    assert path == [(i, i) for i in range(65)]


def test_block_oracle_path_rescores(rng):
    for _ in range(6):
        L = int(rng.integers(80, 300))
        q = random_dna(rng, (L,))
        t = mutate(rng, q, out_len=L)
        s, path = banded_xdrop_block(q, t, match=2, mismatch=1, gap=1)
        assert s == _rescore_path(q, t, path, match=2, mismatch=1, gap=1)


def test_block_oracle_uniform_matrix_bit_identical(rng):
    """A uniform matrix must reproduce the uniform mode bit-exactly
    (same rule as the per-round oracle's matrix mode)."""
    mat = np.where(np.eye(4, dtype=np.int64), 2, -1)
    for _ in range(4):
        q = random_dna(rng, (200,))
        t = mutate(rng, q, out_len=200)
        su, pu = banded_xdrop_block(q, t, match=2, mismatch=1)
        sm, pm = banded_xdrop_block(q, t, matrix=mat)
        assert su == sm
        assert pu == pm


def test_block_oracle_terminates_early(rng):
    """A short homologous prefix followed by pad territory decays the
    carried row below the cutoff: the dead-band test fires at a block
    boundary long before row n."""
    q = random_dna(rng, (2000,))
    t = mutate(rng, q[:100], out_len=100)
    res = banded_xdrop_block(
        q, t, mismatch=3, gap=2, return_state=True
    )
    assert res.n_rows < 400
    assert res.n_rows % 32 == 0  # termination is block-granular
    assert res.score >= 0


def test_block_oracle_state_geometry(rng):
    """Corridor invariants: the band base slides +1 per row inside a
    block and jumps K + delta across blocks with |delta| <= dmax."""
    q = random_dna(rng, (256,))
    t = mutate(rng, q, out_len=256)
    res = banded_xdrop_block(q, t, width=64, block=32, return_state=True)
    K, W = 32, 64
    for y in range(1, res.n_rows + 1):
        b, r = divmod(y - 1, K)
        assert res.row_base[y - 1] == res.bases[b] + r
    d = np.diff(res.bases)
    assert np.all(np.abs(d - K) <= min(K, W // 2))
    # endpoint cell value carries the +X offset of the reported score
    ey, ej = res.end
    k = ej - res.row_base[ey - 1]
    assert res.band_history[ey - 1, k] == res.score + 70


def _engine_vs_oracle(rng, B, n, m, *, homologous=True, W=32, K=16,
                      X=40, match=1, mismatch=1, gap=1, matrix=None):
    from jax.experimental.pallas import tpu as pltpu

    from swtpu.kernels.pallas.banded_block import (
        banded_block_batch_pallas,
        banded_block_traceback_host,
    )

    qs = random_dna(rng, (B, n))
    if homologous:
        ts = np.stack([mutate(rng, q, out_len=m) for q in qs])
    else:
        ts = random_dna(rng, (B, m))
    with pltpu.force_tpu_interpret_mode():
        res = banded_block_batch_pallas(
            qs, ts, match=match, mismatch=mismatch, gap=gap, width=W,
            block=K, x_threshold=X, matrix=matrix, with_history=True,
            with_meta=True,
        )
        paths = banded_block_traceback_host(
            res, qs, ts, match=match, mismatch=mismatch, gap=gap,
            block=K, x_threshold=X, matrix=matrix,
        )
    for p in range(B):
        ora = banded_xdrop_block(
            qs[p], ts[p], match=match, mismatch=mismatch, gap=gap,
            width=W, block=K, x_threshold=X, matrix=matrix,
            return_state=True,
        )
        assert res.score[p] == ora.score, p
        assert (res.end_y[p], res.end_j[p]) == ora.end, p
        assert res.n_rows[p] == ora.n_rows, p
        nb = -(-ora.n_rows // K)
        assert np.array_equal(res.bases[:nb, p], ora.bases[:nb]), p
        assert np.array_equal(res.deltas[:nb, p], ora.deltas[:nb]), p
        assert np.array_equal(
            res.band_history[: ora.n_rows, :, p], ora.band_history
        ), p
        assert paths[p] == ora.path, p


def test_block_engine_matches_oracle_homologous(rng):
    """Pallas block engine bit-exact vs the oracle: scores, endpoints,
    band history, bases/deltas, and host-walked paths."""
    _engine_vs_oracle(rng, B=4, n=96, m=100)


def test_block_engine_matches_oracle_random_pairs(rng):
    """Random (non-homologous) pairs drift differently per pair —
    exercises per-pair re-centering divergence and the done mask."""
    _engine_vs_oracle(rng, B=4, n=80, m=64, homologous=False)


def test_block_engine_tail_block_and_early_death(rng):
    """n not a multiple of K (tail-block kernel) + harsh scoring so some
    pairs die at different blocks (freeze logic)."""
    _engine_vs_oracle(
        rng, B=4, n=90, m=60, mismatch=3, gap=2, X=20, K=16
    )


def test_block_engine_tie_rich_scoring(rng):
    """(2,-1,1)-style tie-rich scoring on a small alphabet stresses the
    row-major first-max endpoint reduce and the first-argmax re-center
    (the family's tie-break postmortem, see CLAUDE.md)."""
    _engine_vs_oracle(rng, B=4, n=64, m=64, match=2, mismatch=1, gap=1)


def test_block_engine_matrix_mode(rng):
    """General-matrix mode (baked packed table) bit-exact vs the
    oracle's matrix branch."""
    mat = np.array(
        [
            [3, -2, -1, -2],
            [-2, 3, -2, -1],
            [-1, -2, 4, -2],
            [-2, -1, -2, 4],
        ],
        dtype=np.int64,
    )
    _engine_vs_oracle(rng, B=4, n=64, m=64, matrix=mat)


def test_block_engine_batch_padding(rng):
    """B not a multiple of 128: pad pairs must die early and be sliced
    off without touching real pairs' results."""
    _engine_vs_oracle(rng, B=3, n=48, m=48, K=16, W=32)


def test_block_engine_device_walk(rng):
    """Device traceback (2-bit move wire) bit-equal to the oracle's
    (score, path) — incl. a pair that dies early and a tie-rich
    scoring."""
    from jax.experimental.pallas import tpu as pltpu

    from swtpu.kernels.pallas.banded_block import banded_block_align_device

    for match, mismatch, gap, X in ((1, 1, 1, 40), (2, 1, 1, 20)):
        B, n, m = 3, 80, 84
        qs = random_dna(rng, (B, n))
        ts = np.stack([mutate(rng, q, out_len=m) for q in qs])
        ts[2] = random_dna(rng, (m,))  # drifts/dies differently
        with pltpu.force_tpu_interpret_mode():
            out = banded_block_align_device(
                qs, ts, match=match, mismatch=mismatch, gap=gap,
                width=32, block=16, x_threshold=X,
            )
        for p in range(B):
            os_, op = banded_xdrop_block(
                qs[p], ts[p], match=match, mismatch=mismatch, gap=gap,
                width=32, block=16, x_threshold=X,
            )
            assert out[p][0] == os_, p
            assert out[p][1] == op, p


def test_block_affine_equals_linear_when_open_eq_extend(rng):
    """gap_open == gap_extend degenerates Gotoh to linear: the affine
    block oracle must be bit-identical to the linear one (scores, paths,
    histories) — the affine family's standard consistency check."""
    from swtpu.oracle.banded_block import banded_xdrop_block_affine

    for _ in range(4):
        L = int(rng.integers(80, 220))
        q = random_dna(rng, (L,))
        t = mutate(rng, q, out_len=L)
        lin = banded_xdrop_block(
            q, t, match=2, mismatch=1, gap=2, x_threshold=40,
            return_state=True,
        )
        aff = banded_xdrop_block_affine(
            q, t, match=2, mismatch=1, gap_open=2, gap_extend=2,
            x_threshold=40, return_state=True,
        )
        assert aff.score == lin.score
        assert aff.end == lin.end
        assert aff.path == lin.path
        assert np.array_equal(aff.band_history, lin.band_history)
        assert np.array_equal(aff.bases, lin.bases)


def test_block_affine_matches_full_on_homologous(rng):
    """~70% identity pairs stay in-corridor: the affine block tier
    equals the full-matrix Gotoh semiglobal (scores and endpoints)."""
    from swtpu.oracle.banded_block import banded_xdrop_block_affine
    from swtpu.oracle.semiglobal import semiglobal_affine_full

    for _ in range(5):
        L = int(rng.integers(100, 320))
        q = random_dna(rng, (L,))
        t = mutate(rng, q, out_len=L)
        fs, fpath = semiglobal_affine_full(
            q, t, match=2, mismatch=1, gap_open=3, gap_extend=1
        )
        bs, bpath = banded_xdrop_block_affine(
            q, t, match=2, mismatch=1, gap_open=3, gap_extend=1,
            x_threshold=70,
        )
        assert bs == fs
        assert bpath[-1] == fpath[-1]


def test_block_affine_path_rescores(rng):
    """Affine path rescoring: run-length gap accounting under Gotoh."""
    from swtpu.oracle.banded_block import banded_xdrop_block_affine

    go, ge = 3, 1
    for _ in range(5):
        L = int(rng.integers(80, 260))
        q = random_dna(rng, (L,))
        t = mutate(rng, q, out_len=L)
        s, path = banded_xdrop_block_affine(
            q, t, match=2, mismatch=1, gap_open=go, gap_extend=ge
        )
        total, prev_move = 0, None
        for (i0, j0), (i1, j1) in zip(path, path[1:]):
            d = (i1 - i0, j1 - j0)
            if d == (1, 1):
                total += 2 if q[i1 - 1] == t[j1 - 1] else -1
            else:
                total -= go if d != prev_move else ge
            prev_move = d if d != (1, 1) else None
        assert total == s


def test_block_engine_affine_matches_oracle(rng):
    """Affine (Gotoh) block engine bit-exact vs banded_xdrop_block_affine:
    scores, endpoints, H history, and the three-state host walk over
    reconstructed E/F bands."""
    from jax.experimental.pallas import tpu as pltpu

    from swtpu.kernels.pallas.banded_block import (
        banded_block_batch_pallas,
        banded_block_traceback_host,
    )
    from swtpu.oracle.banded_block import banded_xdrop_block_affine

    B, n, m, W, K, X = 4, 90, 96, 32, 16, 30
    go, ge = 3, 1
    qs = random_dna(rng, (B, n))
    ts = np.stack([mutate(rng, q, out_len=m) for q in qs])
    ts[3] = random_dna(rng, (m,))  # early-death pair
    with pltpu.force_tpu_interpret_mode():
        res = banded_block_batch_pallas(
            qs, ts, match=2, mismatch=1, gap_open=go, gap_extend=ge,
            width=W, block=K, x_threshold=X, with_history=True,
            with_meta=True,
        )
        paths = banded_block_traceback_host(
            res, qs, ts, match=2, mismatch=1, gap_open=go,
            gap_extend=ge, block=K, x_threshold=X,
        )
    for p in range(B):
        ora = banded_xdrop_block_affine(
            qs[p], ts[p], match=2, mismatch=1, gap_open=go,
            gap_extend=ge, width=W, block=K, x_threshold=X,
            return_state=True,
        )
        assert res.score[p] == ora.score, p
        assert (res.end_y[p], res.end_j[p]) == ora.end, p
        assert res.n_rows[p] == ora.n_rows, p
        assert np.array_equal(
            res.band_history[: ora.n_rows, :, p], ora.band_history
        ), p
        assert paths[p] == ora.path, p


def test_block_engine_affine_open_eq_extend_routes_linear(rng):
    """gap_open == gap_extend must route to (and bit-match) the linear
    engine path."""
    from jax.experimental.pallas import tpu as pltpu

    from swtpu.kernels.pallas.banded_block import banded_block_batch_pallas

    qs = random_dna(rng, (2, 64))
    ts = np.stack([mutate(rng, q, out_len=64) for q in qs])
    with pltpu.force_tpu_interpret_mode():
        lin = banded_block_batch_pallas(
            qs, ts, gap=2, width=32, block=16, x_threshold=30
        )
        aff = banded_block_batch_pallas(
            qs, ts, gap_open=2, gap_extend=2, width=32, block=16,
            x_threshold=30,
        )
    assert np.array_equal(lin.score, aff.score)
    assert np.array_equal(lin.end_j, aff.end_j)


def test_block_oracle_all_dead_start():
    """All-mismatch pair under harsh scoring: nothing ever scores above
    the origin, score 0, path [(0, 0)]."""
    q = np.zeros(64, dtype=np.uint8)
    t = np.full(64, 1, dtype=np.uint8)
    s, path = banded_xdrop_block(q, t, mismatch=100, gap=100, x_threshold=5)
    assert s == 0
    assert path == [(0, 0)]


def _engine_vs_oracle_varlen(rng, B, n, m, *, W=32, K=16, X=40,
                             match=1, mismatch=1, gap=1, matrix=None):
    from jax.experimental.pallas import tpu as pltpu

    from swtpu.kernels.pallas.banded_block import (
        banded_block_batch_pallas,
        banded_block_traceback_host,
    )
    from swtpu.oracle.banded_block import banded_xdrop_block

    lens_q = rng.integers(max(K // 2, 8), n + 1, B).astype(np.int64)
    lens_q[0] = (n // K) * K  # one block-boundary ender
    lens_t = rng.integers(max(m // 2, 8), m + 1, B).astype(np.int64)
    qs = random_dna(rng, (B, n))
    ts = random_dna(rng, (B, m))  # junk beyond lens_t must be ignored
    for p in range(B):
        tt = mutate(rng, qs[p][: lens_q[p]], out_len=int(lens_t[p]))
        ts[p, : lens_t[p]] = tt[: lens_t[p]]
    with pltpu.force_tpu_interpret_mode():
        res = banded_block_batch_pallas(
            qs, ts, match=match, mismatch=mismatch, gap=gap, width=W,
            block=K, x_threshold=X, matrix=matrix, with_history=True,
            with_meta=True, lens_q=lens_q, lens_t=lens_t,
        )
        paths = banded_block_traceback_host(
            res, qs, ts, match=match, mismatch=mismatch, gap=gap,
            block=K, x_threshold=X, matrix=matrix,
        )
    for p in range(B):
        ora = banded_xdrop_block(
            qs[p][: lens_q[p]], ts[p][: lens_t[p]], match=match,
            mismatch=mismatch, gap=gap, width=W, block=K, x_threshold=X,
            matrix=matrix, return_state=True,
        )
        assert res.score[p] == ora.score, p
        assert (res.end_y[p], res.end_j[p]) == ora.end, p
        assert res.n_rows[p] == ora.n_rows, p
        nb = -(-ora.n_rows // K)
        assert np.array_equal(res.bases[:nb, p], ora.bases[:nb]), p
        assert np.array_equal(res.deltas[:nb, p], ora.deltas[:nb]), p
        assert np.array_equal(
            res.band_history[: ora.n_rows, :, p], ora.band_history
        ), p
        assert paths[p] == ora.path, p


def test_block_engine_varlen(rng):
    """Per-pair lens_q/lens_t (round 5): each pair bit-equal to the
    oracle run at ITS OWN lengths — scores, endpoints, n_rows, meta,
    history (incl. the mid-block final-row X-drop fixup applied after
    the fetch), and walked paths. Folded small-batch kernel path."""
    _engine_vs_oracle_varlen(rng, B=5, n=96, m=100)


def test_block_engine_varlen_tie_rich(rng):
    """Varlen + tie-rich scoring (endpoint reduce under per-pair row
    freezes)."""
    _engine_vs_oracle_varlen(
        rng, B=4, n=80, m=80, match=2, mismatch=1, gap=1
    )


def test_block_engine_varlen_straight_kernel(rng, monkeypatch):
    """The straight (unfolded) kernel's varlen path: force G=1 via
    _fold_G (a fresh geometry avoids the jit cache of the folded
    runs)."""
    import swtpu.kernels.pallas.banded_block as bb

    monkeypatch.setattr(bb, "_fold_G", lambda S, W, go: 1)
    _engine_vs_oracle_varlen(rng, B=3, n=72, m=68, W=32, K=16)


def test_block_engine_varlen_device_walk(rng):
    """Device traceback with per-pair lens: the walker's y == n_rows
    cutoff rule reproduces the host fixup — (score, path) bit-equal to
    the per-pair oracle."""
    from jax.experimental.pallas import tpu as pltpu

    from swtpu.kernels.pallas.banded_block import banded_block_align_device
    from swtpu.oracle.banded_block import banded_xdrop_block

    B, n, m, W, K, X = 3, 80, 84, 32, 16, 40
    lens_q = np.array([66, (n // K) * K, 41], np.int64)
    lens_t = np.array([70, 80, 50], np.int64)
    qs = random_dna(rng, (B, n))
    ts = random_dna(rng, (B, m))
    for p in range(B):
        tt = mutate(rng, qs[p][: lens_q[p]], out_len=int(lens_t[p]))
        ts[p, : lens_t[p]] = tt[: lens_t[p]]
    with pltpu.force_tpu_interpret_mode():
        dv = banded_block_align_device(
            qs, ts, width=W, block=K, x_threshold=X,
            lens_q=lens_q, lens_t=lens_t,
        )
    for p in range(B):
        score, path = banded_xdrop_block(
            qs[p][: lens_q[p]], ts[p][: lens_t[p]], width=W, block=K,
            x_threshold=X,
        )
        assert dv[p] == (score, path), p
