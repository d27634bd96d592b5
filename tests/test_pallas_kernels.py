"""Differential tests for the Pallas kernels, run in interpreter mode on CPU.

(The same kernels are verified on real TPU hardware by bench.py / the
driver; interpret mode checks the kernel logic itself.)
"""

import numpy as np
from jax.experimental.pallas import tpu as pltpu

from swtpu.core import random_dna
from swtpu.core.scoring import DNA_10_30_15, DNA_111
from swtpu.kernels.pallas import sw_batch_pallas
from swtpu.oracle import sw_score_batch


def test_pallas_parity_reference_workload(rng):
    qs = random_dna(rng, (1024, 128))
    ts = random_dna(rng, (1024, 128))
    with pltpu.force_tpu_interpret_mode():
        dev = np.asarray(sw_batch_pallas(qs, ts, DNA_10_30_15))
    # spot-check a subset against the oracle (full batch is oracle-slow)
    orc = sw_score_batch(qs[:128], ts[:128], DNA_10_30_15)
    assert np.array_equal(dev[:128], orc.astype(np.int32))


def test_pallas_varlen_odd_batch(rng):
    qs = random_dna(rng, (50, 90))
    ts = random_dna(rng, (50, 128))
    qs[:, 70:] = 4  # per-batch uniform pad tail
    with pltpu.force_tpu_interpret_mode():
        dev = np.asarray(sw_batch_pallas(qs, ts, DNA_111))
    orc = sw_score_batch(qs[:, :70], ts, DNA_111)
    assert np.array_equal(dev, orc.astype(np.int32))


def test_profile_kernel_general_4x4(rng):
    """Arbitrary (asymmetric) 4x4 matrices via the packed-profile kernel."""
    from swtpu.core.scoring import ScoringParams
    from swtpu.kernels.pallas.sw_profile import sw_batch_profile_pallas

    M = rng.integers(-30, 12, size=(4, 4)).astype(np.int32)
    params = ScoringParams.linear(M, 9)
    qs = random_dna(rng, (40, 128))
    ts = random_dna(rng, (40, 128))
    with pltpu.force_tpu_interpret_mode():
        dev = np.asarray(sw_batch_profile_pallas(qs, ts, params))
    orc = sw_score_batch(qs, ts, params)
    assert np.array_equal(dev, orc.astype(np.int32))


def test_profile_kernel_blosum62_varlen(rng):
    """Protein/BLOSUM62 with a padded variable-length query tail."""
    from swtpu.core.protein import BLOSUM62, PROTEIN_Q_PAD
    from swtpu.core.scoring import ScoringParams
    from swtpu.kernels.pallas.sw_profile import sw_batch_profile_pallas

    params = ScoringParams.linear(BLOSUM62, 11)
    qs = rng.integers(0, 24, size=(16, 96)).astype(np.uint8)
    ts = rng.integers(0, 24, size=(16, 120)).astype(np.uint8)
    qs[:, 80:] = PROTEIN_Q_PAD
    with pltpu.force_tpu_interpret_mode():
        dev = np.asarray(sw_batch_profile_pallas(qs, ts, params))
    orc = sw_score_batch(qs[:, :80], ts, params)
    assert np.array_equal(dev, orc.astype(np.int32))


def test_profile_kernel_matches_flagship_on_uniform(rng):
    """Uniform scoring runs through both kernels with identical results."""
    from swtpu.kernels.pallas.sw_profile import sw_batch_profile_pallas

    qs = random_dna(rng, (32, 128))
    ts = random_dna(rng, (32, 128))
    with pltpu.force_tpu_interpret_mode():
        a = np.asarray(sw_batch_pallas(qs, ts, DNA_111))
        b = np.asarray(sw_batch_profile_pallas(qs, ts, DNA_111))
    assert np.array_equal(a, b)


def test_banded_pallas_oracle_parity(rng):
    """Pallas banded X-drop vs the scalar banded oracle: score, rounds,
    band history, positions — including variable lengths and a dissimilar
    pair (X-drop early termination)."""
    from swtpu.core.encode import mutate
    from swtpu.kernels.pallas.banded_batch import banded_xdrop_batch_pallas
    from swtpu.oracle.semiglobal import banded_xdrop

    L, B = 150, 10
    qs = rng.integers(0, 4, size=(B, L)).astype(np.uint8)
    ts = np.stack([mutate(rng, qs[b], out_len=L) for b in range(B)])
    ts[B - 1] = rng.integers(0, 4, size=L).astype(np.uint8)  # dissimilar
    lens_q = rng.integers(100, L + 1, size=B)
    lens_t = rng.integers(100, L + 1, size=B)
    with pltpu.force_tpu_interpret_mode():
        dev = banded_xdrop_batch_pallas(qs, ts, lens_q, lens_t)
    for b in range(B):
        st = banded_xdrop(
            qs[b][: lens_q[b]], ts[b][: lens_t[b]], return_state=True
        )
        assert st.score == dev.score[b]
        assert st.n_rounds == dev.n_rounds[b]
        assert st.max_round == dev.max_round[b]
        nr = st.n_rounds
        assert np.array_equal(st.band_history[:nr], dev.band_history[:nr, b])
        assert np.array_equal(st.pos_y[:nr], dev.pos_y[:nr, b])


def test_banded_pallas_compressed_history(rng):
    """8-bit compressed history reconstructs the int32 history exactly."""
    from swtpu.core.encode import mutate
    from swtpu.kernels.pallas.banded_batch import banded_xdrop_batch_pallas

    L, B = 140, 8
    qs = rng.integers(0, 4, size=(B, L)).astype(np.uint8)
    ts = np.stack([mutate(rng, qs[b], out_len=L) for b in range(B)])
    with pltpu.force_tpu_interpret_mode():
        full = banded_xdrop_batch_pallas(qs, ts)
        comp = banded_xdrop_batch_pallas(qs, ts, compress_history=True)
    assert comp.band_history.dtype == np.uint8
    for b in range(B):
        nr = int(full.n_rounds[b])
        assert np.array_equal(
            full.history_for(b)[:nr], comp.history_for(b)[:nr]
        )


def test_banded_xla_varlen_round_cap(rng):
    """The XLA engine honors the oracle's per-pair round cap for
    variable-length batches (regression: shorter pairs used to keep
    running to the padded-shape cap)."""
    from swtpu.core.encode import mutate
    from swtpu.kernels.xla.banded_scan import banded_xdrop_batch
    from swtpu.oracle.semiglobal import banded_xdrop

    L, B = 150, 6
    qs = rng.integers(0, 4, size=(B, L)).astype(np.uint8)
    ts = np.stack([mutate(rng, qs[b], out_len=L) for b in range(B)])
    lens_q = rng.integers(100, L + 1, size=B)
    lens_t = rng.integers(100, L + 1, size=B)
    ref = banded_xdrop_batch(qs, ts, lens_q, lens_t)
    for b in range(B):
        st = banded_xdrop(
            qs[b][: lens_q[b]], ts[b][: lens_t[b]], return_state=True
        )
        assert st.score == ref.score[b]
        assert st.n_rounds == ref.n_rounds[b]


def test_banded_pallas_early_exit_mode(rng):
    """early_exit=True produces identical results (it only skips blocks
    after every pair is done)."""
    from swtpu.core.encode import mutate
    from swtpu.kernels.pallas.banded_batch import banded_xdrop_batch_pallas

    L, B = 128, 4
    qs = rng.integers(0, 4, size=(B, L)).astype(np.uint8)
    ts = np.stack([mutate(rng, qs[b], out_len=L) for b in range(B)])
    ts[B - 1] = rng.integers(0, 4, size=L).astype(np.uint8)
    with pltpu.force_tpu_interpret_mode():
        a = banded_xdrop_batch_pallas(
            qs, ts, match=1, mismatch=3, gap=2, with_history=False
        )
        b = banded_xdrop_batch_pallas(
            qs, ts, match=1, mismatch=3, gap=2, with_history=False,
            early_exit=True,
        )
    assert np.array_equal(a.score, b.score)
    assert np.array_equal(a.n_rounds, b.n_rounds)
    assert np.array_equal(a.max_round, b.max_round)


def test_bf16_tier_parity(rng):
    """The bf16 reduced-precision tier is bit-exact within its range
    bound (n * match/gcd <= 256), including the rescaled (10,-30,15)."""
    from swtpu.kernels.pallas.sw_bf16 import (
        bf16_tier_supported,
        sw_batch_bf16_pallas,
    )

    assert bf16_tier_supported(DNA_10_30_15, 128)
    assert bf16_tier_supported(DNA_111, 128)
    assert not bf16_tier_supported(DNA_10_30_15, 256)  # 256*2 > 256
    # tiny shapes: interpret mode pays for the full 2048-pair tile
    qs = random_dna(rng, (64, 32))
    ts = random_dna(rng, (64, 32))
    for params in (DNA_10_30_15, DNA_111):
        with pltpu.force_tpu_interpret_mode():
            dev = np.asarray(sw_batch_bf16_pallas(qs, ts, params))
        orc = sw_score_batch(qs, ts, params)
        assert np.array_equal(dev, orc.astype(np.int32))


def test_banded_pallas_wide_band(rng):
    """Bandwidth 64 (rf shrinks to keep the slab in range)."""
    from swtpu.core.encode import mutate
    from swtpu.kernels.pallas.banded_batch import banded_xdrop_batch_pallas
    from swtpu.oracle.semiglobal import banded_xdrop

    L, B = 140, 4
    qs = rng.integers(0, 4, size=(B, L)).astype(np.uint8)
    ts = np.stack([mutate(rng, qs[b], out_len=L) for b in range(B)])
    with pltpu.force_tpu_interpret_mode():
        dev = banded_xdrop_batch_pallas(
            qs, ts, bandwidth=64, x_threshold=100
        )
    for b in range(B):
        st = banded_xdrop(
            qs[b], ts[b], bandwidth=64, x_threshold=100, return_state=True
        )
        assert st.score == dev.score[b]
        assert st.n_rounds == dev.n_rounds[b]
        nr = st.n_rounds
        assert np.array_equal(st.band_history[:nr], dev.band_history[:nr, b])


def test_banded_packed_oracle_parity(rng):
    """Lane-packed banded kernel (4 pairs per sublane row) vs the scalar
    oracle: scores, rounds, history, positions, compressed roundtrip."""
    from swtpu.core.encode import mutate
    from swtpu.kernels.pallas.banded_packed import banded_xdrop_batch_packed
    from swtpu.oracle.semiglobal import banded_xdrop

    L, B = 96, 9
    qs = rng.integers(0, 4, size=(B, L)).astype(np.uint8)
    ts = np.stack([mutate(rng, qs[b], out_len=L) for b in range(B)])
    ts[B - 1] = rng.integers(0, 4, size=L).astype(np.uint8)
    lens_q = rng.integers(64, L + 1, size=B)
    lens_t = rng.integers(64, L + 1, size=B)
    with pltpu.force_tpu_interpret_mode():
        dev = banded_xdrop_batch_packed(qs, ts, lens_q, lens_t)
        comp = banded_xdrop_batch_packed(
            qs, ts, lens_q, lens_t, compress_history=True
        )
        wide = banded_xdrop_batch_packed(
            qs, ts, lens_q, lens_t, bandwidth=64, x_threshold=100,
            with_history=False,
        )
    for b in range(B):
        st = banded_xdrop(
            qs[b][: lens_q[b]], ts[b][: lens_t[b]], return_state=True
        )
        assert st.score == dev.score[b]
        assert st.n_rounds == dev.n_rounds[b]
        nr = st.n_rounds
        assert np.array_equal(st.band_history[:nr], dev.band_history[:nr, b])
        assert np.array_equal(st.pos_y[:nr], dev.pos_y[:nr, b])
        assert np.array_equal(dev.history_for(b)[:nr], comp.history_for(b)[:nr])
        st64 = banded_xdrop(
            qs[b][: lens_q[b]], ts[b][: lens_t[b]], bandwidth=64,
            x_threshold=100, return_state=True,
        )
        assert st64.score == wide.score[b]
        assert st64.n_rounds == wide.n_rounds[b]


def test_banded_packed_early_exit(rng):
    """Packed kernel's early-exit mode produces identical results."""
    from swtpu.core.encode import mutate
    from swtpu.kernels.pallas.banded_packed import banded_xdrop_batch_packed

    L, B = 64, 4
    qs = rng.integers(0, 4, size=(B, L)).astype(np.uint8)
    ts = np.stack([mutate(rng, qs[b], out_len=L) for b in range(B)])
    ts[B - 1] = rng.integers(0, 4, size=L).astype(np.uint8)
    with pltpu.force_tpu_interpret_mode():
        a = banded_xdrop_batch_packed(
            qs, ts, match=1, mismatch=3, gap=2, with_history=False
        )
        b = banded_xdrop_batch_packed(
            qs, ts, match=1, mismatch=3, gap=2, with_history=False,
            early_exit=True,
        )
    assert np.array_equal(a.score, b.score)
    assert np.array_equal(a.n_rounds, b.n_rounds)


def test_profile_kernel_long_query(rng):
    """Queries beyond one row-group stream through the (tile, row-group)
    grid with the row boundary persisting in scratch."""
    from swtpu.core.protein import BLOSUM62
    from swtpu.core.scoring import ScoringParams
    from swtpu.kernels.pallas.sw_profile import sw_batch_profile_pallas

    params = ScoringParams.linear(BLOSUM62, 11)
    qs = rng.integers(0, 24, size=(6, 200)).astype(np.uint8)
    ts = rng.integers(0, 24, size=(6, 96)).astype(np.uint8)
    with pltpu.force_tpu_interpret_mode():
        dev = np.asarray(sw_batch_profile_pallas(qs, ts, params))
    orc = sw_score_batch(qs, ts, params)
    assert np.array_equal(dev, orc.astype(np.int32))


def test_long_target_auto_swap(rng):
    """Targets longer than the VMEM budget swap onto the query axis
    (scores are symmetric under transposition)."""
    from swtpu.core.protein import BLOSUM62
    from swtpu.core.scoring import ScoringParams
    from swtpu.kernels.pallas.sw_profile import sw_batch_profile_pallas

    qs = random_dna(rng, (4, 64))
    ts = random_dna(rng, (4, 2560))
    with pltpu.force_tpu_interpret_mode():
        dev = np.asarray(sw_batch_pallas(qs, ts, DNA_111))
    assert np.array_equal(
        dev, sw_score_batch(qs, ts, DNA_111).astype(np.int32)
    )
    pp = ScoringParams.linear(BLOSUM62, 11)
    pq = rng.integers(0, 24, size=(4, 64)).astype(np.uint8)
    pt = rng.integers(0, 24, size=(4, 2560)).astype(np.uint8)
    with pltpu.force_tpu_interpret_mode():
        dev = np.asarray(sw_batch_profile_pallas(pq, pt, pp))
    assert np.array_equal(dev, sw_score_batch(pq, pt, pp).astype(np.int32))


def test_fixed_band_pallas_parity(rng):
    """Fixed-band rowscan (|i-j| <= W) vs the fixed-band oracle, mixed
    homologous/random pairs, harsh + neutral scoring, W spanning chunks."""
    from swtpu.core.encode import mutate
    from swtpu.kernels.pallas.sw_banded import sw_banded_static_pallas
    from swtpu.oracle.banded_static import sw_banded_static_score_batch

    B, n = 6, 48
    qs = random_dna(rng, (B, n))
    ts = np.empty_like(qs)
    ts[:3] = np.stack([mutate(rng, q, out_len=n) for q in qs[:3]])
    ts[3:] = random_dna(rng, (B - 3, n))
    for params, W in ((DNA_111, 8), (DNA_10_30_15, 8), (DNA_111, 20)):
        with pltpu.force_tpu_interpret_mode():
            dev = np.asarray(
                sw_banded_static_pallas(qs, ts, params, bandwidth=W)
            )
        want = sw_banded_static_score_batch(qs, ts, params, bandwidth=W)
        assert np.array_equal(dev, want.astype(np.int32))


def test_fixed_band_pallas_unequal_lengths(rng):
    from swtpu.kernels.pallas.sw_banded import sw_banded_static_pallas
    from swtpu.oracle.banded_static import sw_banded_static_score_batch

    qs = random_dna(rng, (4, 40))
    ts = random_dna(rng, (4, 64))
    with pltpu.force_tpu_interpret_mode():
        dev = np.asarray(
            sw_banded_static_pallas(qs, ts, DNA_111, bandwidth=12)
        )
    want = sw_banded_static_score_batch(qs, ts, DNA_111, bandwidth=12)
    assert np.array_equal(dev, want.astype(np.int32))


def test_fixed_band_wide_equals_full(rng):
    """W >= max(n, m): the fixed band covers the whole matrix, so the
    score equals unrestricted Smith-Waterman."""
    from swtpu.kernels.pallas.sw_banded import sw_banded_static_pallas

    qs = random_dna(rng, (4, 24))
    ts = random_dna(rng, (4, 24))
    with pltpu.force_tpu_interpret_mode():
        dev = np.asarray(
            sw_banded_static_pallas(qs, ts, DNA_111, bandwidth=24)
        )
    want = sw_score_batch(qs, ts, DNA_111)
    assert np.array_equal(dev, want.astype(np.int32))


def test_fixed_band_pallas_affine(rng):
    """Fixed band + Gotoh gaps (BASELINE config 1 geometry) vs oracle."""
    from swtpu.core.encode import mutate
    from swtpu.core.scoring import ScoringParams, dna_matrix
    from swtpu.kernels.pallas.sw_banded import sw_banded_static_pallas
    from swtpu.oracle.banded_static import sw_banded_static_score_batch

    B, n = 6, 48
    qs = random_dna(rng, (B, n))
    ts = np.empty_like(qs)
    ts[:3] = np.stack([mutate(rng, q, out_len=n) for q in qs[:3]])
    ts[3:] = random_dna(rng, (B - 3, n))
    for params, W in (
        (ScoringParams(dna_matrix(10, -30), gap_open=40, gap_extend=15), 8),
        (ScoringParams(dna_matrix(1, -1), gap_open=3, gap_extend=1), 20),
    ):
        with pltpu.force_tpu_interpret_mode():
            dev = np.asarray(
                sw_banded_static_pallas(qs, ts, params, bandwidth=W)
            )
        want = sw_banded_static_score_batch(qs, ts, params, bandwidth=W)
        assert np.array_equal(dev, want.astype(np.int32))


def test_fixed_band_left_edge_crossing(rng):
    """Adversarial: t = q[W:] puts the optimal path exactly on the left
    band edge j = i - W, crossing every row-group boundary — the case
    that exposed the din[0] group-boundary bug."""
    from swtpu.kernels.pallas.sw_banded import sw_banded_static_pallas
    from swtpu.oracle.banded_static import sw_banded_static_score_batch

    W = 16
    qq = random_dna(rng, (4, 64))
    tt = qq[:, W:].copy()
    with pltpu.force_tpu_interpret_mode():
        dev = np.asarray(
            sw_banded_static_pallas(qq, tt, DNA_111, bandwidth=W)
        )
    want = sw_banded_static_score_batch(qq, tt, DNA_111, bandwidth=W)
    assert np.array_equal(dev, want.astype(np.int32))


def test_fixed_band_profile_protein(rng):
    """General-matrix fixed band (packed-profile lookup): BLOSUM62 linear
    + affine and a non-uniform DNA matrix, all vs the fixed-band oracle."""
    from swtpu.core.protein import BLOSUM62
    from swtpu.core.scoring import ScoringParams, dna_matrix
    from swtpu.kernels.pallas.sw_banded import sw_banded_profile_pallas
    from swtpu.oracle.banded_static import sw_banded_static_score_batch

    B, n = 4, 48
    pq = rng.integers(0, 24, size=(B, n)).astype(np.uint8)
    pt = rng.integers(0, 24, size=(B, n)).astype(np.uint8)
    for params in (
        ScoringParams.linear(BLOSUM62, 11),
        ScoringParams(BLOSUM62, gap_open=11, gap_extend=1),
    ):
        with pltpu.force_tpu_interpret_mode():
            dev = np.asarray(
                sw_banded_profile_pallas(pq, pt, params, bandwidth=8)
            )
        want = sw_banded_static_score_batch(pq, pt, params, bandwidth=8)
        assert np.array_equal(dev, want.astype(np.int32))
    mat = dna_matrix(5, -4)
    mat[0, 1] = mat[1, 0] = -2
    dp_ = ScoringParams.linear(mat, 3)
    q = random_dna(rng, (B, n))
    t = random_dna(rng, (B, n))
    with pltpu.force_tpu_interpret_mode():
        dev = np.asarray(sw_banded_profile_pallas(q, t, dp_, bandwidth=12))
    want = sw_banded_static_score_batch(q, t, dp_, bandwidth=12)
    assert np.array_equal(dev, want.astype(np.int32))


def test_fixed_band_varlen_lens(rng):
    """Per-pair lens apply pad codes; scores equal truncated oracles."""
    from swtpu.kernels.pallas.sw_banded import sw_banded_static_pallas
    from swtpu.oracle.banded_static import sw_banded_static_score

    B, n = 4, 48
    qs = random_dna(rng, (B, n))
    ts = random_dna(rng, (B, n))
    lq = [30, 48, 41, 25]
    lt = [48, 33, 29, 48]
    with pltpu.force_tpu_interpret_mode():
        dev = np.asarray(
            sw_banded_static_pallas(qs, ts, DNA_111, 12, lq, lt)
        )
    for b in range(B):
        assert dev[b] == sw_banded_static_score(
            qs[b, : lq[b]], ts[b, : lt[b]], DNA_111, 12
        )


def test_banded_pallas_general_matrix(rng):
    """Pallas banded kernel's general-matrix mode (baked packed table,
    select-tree lookup) == XLA table engine, linear + Gotoh, BLOSUM62.

    Covers the sublane kernel only: the lane-packed kernel's
    interpret-mode program (giant unrolled refill x protein select tree)
    segfaults the CPU XLA compiler when built mid-suite (passes in a
    fresh process); its matrix mode is validated on real hardware by
    `python -m swtpu selftest` (banded_blosum62_packed_vs_xla).
    """
    from jax.experimental.pallas import tpu as pltpu

    from swtpu.core.protein import BLOSUM62
    from swtpu.kernels.pallas.banded_batch import banded_xdrop_batch_pallas
    from swtpu.kernels.xla.banded_scan import banded_xdrop_batch

    B, L = 4, 150
    qs = rng.integers(0, 24, (B, L)).astype(np.uint8)
    ts = qs.copy()
    for b in range(B):
        idx = rng.integers(0, L, 25)
        ts[b, idx] = rng.integers(0, 24, 25)
    for kw in (dict(gap=6), dict(gap_open=11, gap_extend=1)):
        ref = banded_xdrop_batch(
            qs, ts, matrix=BLOSUM62, x_threshold=120, **kw
        )
        with pltpu.force_tpu_interpret_mode():
            dev = banded_xdrop_batch_pallas(
                qs, ts, matrix=BLOSUM62, x_threshold=120, **kw
            )
        assert np.array_equal(ref.score, dev.score)
        assert np.array_equal(ref.n_rounds, dev.n_rounds)
        assert np.array_equal(ref.max_round, dev.max_round)
        for b in range(B):
            nr = ref.n_rounds[b]
            assert np.array_equal(
                ref.band_history[:nr, b], dev.history_for(b)[:nr]
            )
            assert np.array_equal(ref.pos_y[:nr, b], dev.pos_y[:nr, b])


def test_banded_packed_general_matrix_subprocess():
    """The lane-packed banded kernel's general-matrix (BLOSUM62) tier in
    interpret mode, isolated in a FRESH subprocess: its giant interpret
    program segfaults the CPU XLA compiler when compiled mid-suite (see
    test_banded_pallas_general_matrix's docstring) but passes alone.
    This gives the protein packed path a CI-side gate in addition to the
    hardware selftest."""
    import subprocess
    import sys

    script = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from jax.experimental.pallas import tpu as pltpu
from swtpu.core.protein import BLOSUM62
from swtpu.kernels.pallas.banded_packed import banded_xdrop_batch_packed
from swtpu.kernels.xla.banded_scan import banded_xdrop_batch

rng = np.random.default_rng(10000)
B, L = 4, 150
qs = rng.integers(0, 24, (B, L)).astype(np.uint8)
ts = qs.copy()
for b in range(B):
    idx = rng.integers(0, L, 25)
    ts[b, idx] = rng.integers(0, 24, 25)
ref = banded_xdrop_batch(
    qs, ts, matrix=BLOSUM62, gap_open=11, gap_extend=1, x_threshold=120,
    with_history=False,
)
with pltpu.force_tpu_interpret_mode():
    dev = banded_xdrop_batch_packed(
        qs, ts, matrix=BLOSUM62, gap_open=11, gap_extend=1,
        x_threshold=120, with_history=False,
    )
assert np.array_equal(ref.score, dev.score), (ref.score, dev.score)
assert np.array_equal(ref.n_rounds, dev.n_rounds)
print("packed-general-matrix-ok")
"""
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "packed-general-matrix-ok" in proc.stdout


def test_wavefront_long_query_strips(rng):
    """n > 128 wavefront routing: the strip-decomposed path (the
    round-5 longpair strip tile) equals the oracle at n = 512/1024."""
    from jax.experimental.pallas import tpu as pltpu

    from swtpu.core.scoring import DNA_10_30_15
    from swtpu.kernels.pallas.sw_wavefront import sw_wavefront_pallas
    from swtpu.oracle import sw_score

    with pltpu.force_tpu_interpret_mode():
        for n, m in ((512, 384), (1024, 256)):
            qs = rng.integers(0, 4, (2, n)).astype(np.uint8)
            ts = rng.integers(0, 4, (2, m)).astype(np.uint8)
            got = sw_wavefront_pallas(qs, ts, DNA_10_30_15)
            for b in range(2):
                assert int(got[b]) == sw_score(qs[b], ts[b], DNA_10_30_15)
