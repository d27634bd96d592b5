"""Karlin-Altschul statistics (swtpu/core/stats.py).

The significance layer is an extension beyond the reference (which reports
raw SW scores only, source.cpp:35-60); its anchors are the published NCBI
values: exact ungapped lambda/H for BLOSUM62 with Robinson-Robinson
frequencies (0.3176 / 0.4012 nats) and the tabulated gapped preset
(11/1 -> lambda 0.267, K 0.041). The empirical calibrator is validated by
(a) recovering known parameters from synthetic Gumbel samples and (b) a
small CPU calibration whose E-values behave sanely.
"""

import math
import subprocess
import sys

import numpy as np
import pytest

from swtpu.core.protein import BLOSUM62
from swtpu.core.scoring import ScoringParams, dna_matrix
from swtpu.core.stats import (
    DNA_UNIFORM_FREQS,
    ROBINSON_FREQS,
    KAStats,
    bit_score,
    calibrate_stats,
    e_value,
    gumbel_fit_ml,
    karlin_H,
    karlin_lambda,
    length_adjustment,
    preset_stats,
    resolve_stats,
    ungapped_stats,
)


def test_lambda_closed_form():
    # match +1 / mismatch -1, uniform DNA: (1/4)e^L + (3/4)e^-L = 1
    # has the closed-form root e^L = 3.
    lam = karlin_lambda(dna_matrix(1, -1), DNA_UNIFORM_FREQS)
    assert abs(lam - math.log(3.0)) < 1e-8


def test_lambda_blosum62_matches_ncbi():
    lam = karlin_lambda(BLOSUM62, ROBINSON_FREQS)
    assert abs(lam - 0.3176) < 5e-4
    H = karlin_H(BLOSUM62, ROBINSON_FREQS, lam=lam)
    assert abs(H - 0.4012) < 5e-4


def test_lambda_rejects_non_negative_expectation():
    # all-positive matrix: expected score > 0, no Gumbel regime
    with pytest.raises(ValueError):
        karlin_lambda(dna_matrix(2, 1), DNA_UNIFORM_FREQS)


def test_ungapped_stats_blosum62():
    st = ungapped_stats(BLOSUM62, "protein")
    assert st.source == "ungapped-exact"
    assert abs(st.lam - 0.3176) < 5e-4
    assert st.K == 0.134  # NCBI tabulated


def test_preset_lookup():
    p = ScoringParams(BLOSUM62, gap_open=11, gap_extend=1)
    st = preset_stats(p, "protein")
    assert st is not None and st.lam == 0.267 and st.K == 0.041
    # linear-gap BLOSUM62 and DNA have no preset
    assert preset_stats(ScoringParams.linear(BLOSUM62, 11), "protein") is None
    assert (
        preset_stats(ScoringParams.linear(dna_matrix(1, -1), 1), "dna")
        is None
    )
    with pytest.raises(ValueError):
        resolve_stats(
            ScoringParams(BLOSUM62, gap_open=5, gap_extend=2),
            "protein",
            mode="preset",
        )


def test_gumbel_fit_recovers_parameters():
    rng = np.random.default_rng(10000)
    mu0, beta0 = 42.0, 5.5
    x = rng.gumbel(mu0, beta0, size=40000)
    mu, beta = gumbel_fit_ml(x)
    assert abs(mu - mu0) < 0.15
    assert abs(beta - beta0) < 0.15


def test_gumbel_fit_shift_equivariant():
    rng = np.random.default_rng(3)
    x = rng.gumbel(10.0, 2.0, size=5000)
    mu1, b1 = gumbel_fit_ml(x)
    mu2, b2 = gumbel_fit_ml(x + 100.0)
    assert abs((mu2 - mu1) - 100.0) < 1e-6
    assert abs(b2 - b1) < 1e-8


def test_bitscore_evalue_consistency():
    st = KAStats(lam=0.267, K=0.041, H=None)  # H None: no length adjust
    S = 87
    bits = float(bit_score(S, st))
    m, n, N = 128, 300, 1000
    ev = float(e_value(S, m, n, st, db_seqs=N))
    # E == m*n*N * 2^-bits is the defining identity
    assert abs(ev - m * n * N * 2.0 ** (-bits)) < 1e-12 * ev
    # monotone: +10 raw score shrinks E by e^(10*lambda)
    ev2 = float(e_value(S + 10, m, n, st, db_seqs=N))
    assert abs(ev / ev2 - math.exp(10 * st.lam)) < 1e-9 * (ev / ev2)


def test_length_adjustment():
    st = KAStats(lam=0.267, K=0.041, H=0.14)
    l = length_adjustment(st, 128, 300)
    assert 0 < l < 128
    # bigger search space -> longer expected alignment
    assert length_adjustment(st, 1024, 10**6) > l
    # no H -> no adjustment
    assert length_adjustment(KAStats(1.0, 0.1, None), 128, 300) == 0
    # degenerate tiny sequences never go negative
    assert length_adjustment(st, 1, 1) == 0


def test_calibrate_cpu():
    """Small CPU calibration: deterministic, plausible (lambda, K), sane
    E-values. The ungapped theory says the linear-gap (1,-1,1) system's
    lambda is below the ungapped ln(3) bound (gaps add entropy)."""
    params = ScoringParams.linear(dna_matrix(1, -1), 1)
    st = calibrate_stats(params, "dna", m=64, pairs=512, seed=10000)
    st2 = calibrate_stats(params, "dna", m=64, pairs=512, seed=10000)
    assert st.lam == st2.lam and st.K == st2.K  # deterministic
    assert st.source == "calibrated"
    assert 0.2 < st.lam < math.log(3.0)
    assert 1e-6 < st.K < 10.0
    # a raw score of 60 on 64x64 random DNA is astronomically unlikely
    assert float(e_value(60, 64, 64, st, effective=False)) < 1e-3
    # geometry-matched fit: edge effects live inside (lambda, K), so no
    # separate length adjustment (H is None by design)
    assert st.H is None
    # rectangular geometry runs too
    str_ = calibrate_stats(params, "dna", m=24, n=64, pairs=256, seed=1)
    assert str_.lam > 0 and str_.K > 0


def _run_cli(cli_args):
    r = subprocess.run(
        [
            sys.executable,
            "-c",
            "import jax; jax.config.update('jax_platforms','cpu');"
            f"import sys; sys.argv=['swtpu']+{cli_args!r};"
            "from swtpu.cli import main; main()",
        ],
        capture_output=True,
        text=True,
        timeout=280,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return r


def test_cli_search_tsv_stats_preset():
    """search --tsv --stats preset emits full outfmt-6 (12 columns,
    evalue + bitscore) using the NCBI BLOSUM62 11/1 preset."""
    r = _run_cli(
        [
            "search", "--random", "4x8x64", "--alphabet", "protein",
            "--gap-open", "11", "--gap-extend", "1", "--topk", "3",
            "--tsv", "--stats", "preset",
        ]
    )
    assert "lambda=0.2670" in r.stderr
    rows = [l.split("\t") for l in r.stdout.strip().splitlines() if l]
    assert rows
    for c in rows:
        assert len(c) == 12
        ev, bits = float(c[10]), float(c[11])
        assert ev >= 0 and bits > 0
    # per query, evalue and bitscore must be anti-monotone
    by_q = {}
    for c in rows:
        by_q.setdefault(c[0], []).append((float(c[11]), float(c[10])))
    for pairs in by_q.values():
        pairs.sort()
        evs = [e for _, e in pairs]
        assert all(a >= b for a, b in zip(evs, evs[1:]))
