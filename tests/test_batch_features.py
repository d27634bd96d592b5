"""Bucketing, compressed band history, device codec."""

import numpy as np

from swtpu.core import random_dna, mutate, pack_2bit
from swtpu.core.scoring import DNA_111
from swtpu.batch import sw_scores_bucketed, banded_align_batch, bucket_edges
from swtpu.kernels.xla.banded_scan import banded_xdrop_batch
from swtpu.kernels.xla.unpack import unpack_2bit_device, pack_2bit_device
from swtpu.oracle import sw_score, banded_xdrop


def test_bucketed_scores(rng):
    pairs = [
        (
            random_dna(rng, (int(rng.integers(10, 150)),)),
            random_dna(rng, (int(rng.integers(10, 200)),)),
        )
        for _ in range(16)
    ]
    got = sw_scores_bucketed(pairs, DNA_111)
    want = np.array([sw_score(q, t, DNA_111) for q, t in pairs], np.int32)
    assert np.array_equal(got, want)


def test_bucket_edges_monotone():
    e = bucket_edges(1000)
    assert e == sorted(set(e)) and e[-1] == 1000


def test_varlen_streamed_chunks_match(rng):
    """Forced stream_chunks (the double-buffered upload path) is score-
    identical to the single-dispatch path, incl. the row-padded last
    chunk."""
    from swtpu.batch import sw_scores_varlen

    B = 37  # not a multiple of 3: exercises last-chunk padding
    qs = random_dna(rng, (B, 96))
    ts = random_dna(rng, (B, 128))
    lq = rng.integers(5, 97, B)
    lt = rng.integers(5, 129, B)
    plain = sw_scores_varlen(qs, ts, DNA_111, lq, lt)
    streamed = sw_scores_varlen(
        qs, ts, DNA_111, lq, lt, stream_chunks=3
    )
    assert np.array_equal(plain, streamed)


def test_varlen_array_scores(rng):
    """sw_scores_varlen (the packed array API): mixed q AND t lengths,
    pad application, sorted-bucket scatter back to input order."""
    from swtpu.batch import sw_scores_varlen

    B = 37
    qs = random_dna(rng, (B, 180))
    ts = random_dna(rng, (B, 220))
    lq = rng.integers(5, 181, B)
    lt = rng.integers(5, 221, B)
    got = sw_scores_varlen(qs, ts, DNA_111, lq, lt, max_buckets=3)
    want = np.array(
        [
            sw_score(qs[b, : lq[b]], ts[b, : lt[b]], DNA_111)
            for b in range(B)
        ],
        np.int32,
    )
    assert np.array_equal(got, want)

    # garbage past the lengths must not change anything
    qs2 = qs.copy()
    qs2[:, 100:] = 3
    got2 = sw_scores_varlen(qs2, ts, DNA_111, np.minimum(lq, 100), lt)
    want2 = np.array(
        [
            sw_score(qs[b, : min(lq[b], 100)], ts[b, : lt[b]], DNA_111)
            for b in range(B)
        ],
        np.int32,
    )
    assert np.array_equal(got2, want2)


def test_compressed_band_history(rng):
    B = 3
    qs = random_dna(rng, (B, 250))
    ts = np.stack([mutate(rng, qs[b], out_len=250) for b in range(B)])
    res = banded_xdrop_batch(qs, ts, compress_history=True)
    assert res.band_history.dtype == np.uint8
    for b in range(B):
        orc = banded_xdrop(qs[b], ts[b], return_state=True)
        nr = int(res.n_rounds[b])
        assert np.array_equal(res.history_for(b)[:nr], orc.band_history)
    # and the full traceback path still bit-matches
    got = banded_align_batch(qs, ts, compress_history=True)
    for b in range(B):
        assert got[b] == banded_xdrop(qs[b], ts[b])


def test_device_codec(rng):
    s = random_dna(rng, (4, 256))
    p = pack_2bit(s)
    assert np.array_equal(np.asarray(unpack_2bit_device(p)), s)
    assert np.array_equal(np.asarray(pack_2bit_device(s)), p)


def test_overflow_promotion(rng):
    """bf16 tier + int32 re-run of overflow pairs == oracle everywhere.

    match=7 pushes homologous 64-mers far past the bf16 exact bound
    (identical pair scores 448 > 255) while random pairs stay low — the
    promotion split must be exact in both directions (BASELINE config 4's
    overflow-promotion mechanism).
    """
    from jax.experimental.pallas import tpu as pltpu

    from swtpu.batch import sw_scores_promoted
    from swtpu.core.scoring import ScoringParams, dna_matrix
    from swtpu.oracle import sw_score_batch

    params = ScoringParams.linear(dna_matrix(7, -1), gap=1)
    B, n = 24, 64
    qs = random_dna(rng, (B, n))
    ts = np.empty_like(qs)
    ts[: B // 2] = np.stack(
        [mutate(rng, qs[b], out_len=n) for b in range(B // 2)]
    )  # homologous: scores cross the bound
    ts[B // 2 :] = random_dna(rng, (B - B // 2, n))  # random: stay low
    with pltpu.force_tpu_interpret_mode():
        scores, promoted = sw_scores_promoted(qs, ts, params)
    want = sw_score_batch(qs, ts, params)
    assert np.array_equal(scores, want)
    assert promoted.any() and not promoted.all()
    # every non-promoted score was provably exact in bf16
    assert (scores[~promoted] < 255).all()


def test_overflow_promotion_device_fused(rng):
    """sw_scores_promoted_device (one-dispatch bf16 + mask + capped
    gather + int32 re-run + scatter) == sw_scores_promoted == oracle,
    including the cap-overflow fallback (cap smaller than the promoted
    count must still return exact scores via the host remainder path)."""
    from jax.experimental.pallas import tpu as pltpu

    from swtpu.batch.promote import sw_scores_promoted_device
    from swtpu.core.scoring import ScoringParams, dna_matrix
    from swtpu.oracle import sw_score_batch

    params = ScoringParams.linear(dna_matrix(7, -1), gap=1)
    B, n = 24, 64
    qs = random_dna(rng, (B, n))
    ts = np.empty_like(qs)
    ts[: B // 2] = np.stack(
        [mutate(rng, qs[b], out_len=n) for b in range(B // 2)]
    )
    ts[B // 2 :] = random_dna(rng, (B - B // 2, n))
    want = sw_score_batch(qs, ts, params)
    with pltpu.force_tpu_interpret_mode():
        scores, promoted = sw_scores_promoted_device(qs, ts, params)
    assert np.array_equal(scores, want)
    assert promoted.any() and not promoted.all()
    assert (scores[~promoted] < 255).all()
    # cap smaller than the promoted count: the device pass fixes only
    # `cap` pairs, the host remainder path must restore exactness
    n_prom = int(promoted.sum())
    assert n_prom > 1
    with pltpu.force_tpu_interpret_mode():
        scores2, promoted2 = sw_scores_promoted_device(
            qs, ts, params, cap_frac=1 / 2048
        )
    assert np.array_equal(scores2, want)
    assert np.array_equal(promoted2, promoted)


def test_banded_static_align_batch(rng):
    """Fixed-band device scores + host corridor walk; path rescans to
    its own score."""
    from swtpu.batch.traceback import banded_static_align_batch
    from swtpu.oracle.banded_static import sw_banded_static_traceback

    B, n = 4, 80
    qs = random_dna(rng, (B, n))
    ts = np.stack([mutate(rng, q, out_len=n) for q in qs])
    out = banded_static_align_batch(qs, ts, DNA_111, bandwidth=16)
    for b in range(B):
        sc, path = sw_banded_static_traceback(qs[b], ts[b], DNA_111, 16)
        assert out[b] == (sc, path)
        s = 0
        for (i0, j0), (i1, j1) in zip(path, path[1:]):
            d = (i1 - i0, j1 - j0)
            s += (
                (1 if qs[b][i1 - 1] == ts[b][j1 - 1] else -1)
                if d == (1, 1)
                else -1
            )
        assert s == sc


def test_fuzz_short_all_families():
    """One fuzz round per family on CPU (the soak harness's machinery;
    scale runs live in `python -m swtpu fuzz` / selftest)."""
    from swtpu.fuzz import run_fuzz

    stats = run_fuzz(
        minutes=30, max_rounds=10, pairs_per_round=96, save_dir=None,
        log=None,
    )
    assert stats.rounds == 10 and stats.mismatches == 0


def test_device_walker_matches_host_walk(rng):
    """banded_xdrop_align_device (device forward + device traceback,
    move-string wire format) is bit-equal to the host-walk path —
    uniform and general-matrix scoring, varlen, non-homologous early
    X-drop deaths included."""
    from swtpu.kernels.xla.banded_scan import banded_xdrop_align_device

    B, L = 4, 260
    qs = random_dna(rng, (B, L))
    ts = np.stack([mutate(rng, qs[b], out_len=L) for b in range(B)])
    lens_q = [L, 200, L, 90]
    lens_t = [L, L, 230, 90]
    dev = banded_xdrop_align_device(qs, ts, lens_q, lens_t)
    host = banded_align_batch(qs, ts, lens_q, lens_t)
    assert dev == host

    M = np.array(
        [[2, -3, -3, -1], [-3, 2, -1, -3], [-3, -1, 2, -3],
         [-1, -3, -3, 2]],
        np.int32,
    )
    dev = banded_xdrop_align_device(
        qs, ts, lens_q, lens_t, matrix=M, gap=2, x_threshold=60
    )
    host = banded_align_batch(
        qs, ts, lens_q, lens_t, matrix=M, gap=2, x_threshold=60
    )
    assert dev == host

    ts2 = random_dna(rng, (B, L))  # non-homologous: early dead bands
    assert banded_xdrop_align_device(qs, ts2) == banded_align_batch(
        qs, ts2
    )
