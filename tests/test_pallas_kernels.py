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
