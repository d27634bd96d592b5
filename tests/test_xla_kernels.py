"""Differential tests: XLA scan engine vs scalar oracles.

The reference's harness pattern (source.cpp:2943-3030): fixed seed, random
inputs, assert score equality with the oracle — here over batches instead of
an infinite loop.
"""

import numpy as np

from swtpu.core import random_dna
from swtpu.core.scoring import DNA_10_30_15, DNA_111, ScoringParams
from swtpu.kernels.xla import sw_batch_diag
from swtpu.oracle import sw_score_batch


def test_parity_reference_workload(rng):
    """The reference's exact kernel-parity workload: random 128-mers,
    scoring (10, -30, 15) (source.cpp:2944-2959)."""
    qs = random_dna(rng, (64, 128))
    ts = random_dna(rng, (64, 128))
    dev = np.asarray(sw_batch_diag(qs, ts, DNA_10_30_15))
    assert np.array_equal(dev, sw_score_batch(qs, ts, DNA_10_30_15))


def test_parity_111(rng):
    qs = random_dna(rng, (64, 128))
    ts = random_dna(rng, (64, 128))
    dev = np.asarray(sw_batch_diag(qs, ts, DNA_111))
    assert np.array_equal(dev, sw_score_batch(qs, ts, DNA_111))


def test_rectangular_and_varlen(rng):
    qs = random_dna(rng, (8, 100))
    ts = random_dna(rng, (8, 160))
    dev = np.asarray(sw_batch_diag(qs, ts, DNA_111))
    assert np.array_equal(dev, sw_score_batch(qs, ts, DNA_111))

    # variable lengths inside one padded batch
    lens_q = rng.integers(10, 100, size=8)
    lens_t = rng.integers(10, 160, size=8)
    qs_pad = qs.copy()
    ts_pad = ts.copy()
    for b in range(8):
        qs_pad[b, lens_q[b] :] = 4
        ts_pad[b, lens_t[b] :] = 5
    dev = np.asarray(sw_batch_diag(qs_pad, ts_pad, DNA_111))
    for b in range(8):
        expect = sw_score_batch(
            qs[b : b + 1, : lens_q[b]], ts[b : b + 1, : lens_t[b]], DNA_111
        )[0]
        assert dev[b] == expect
