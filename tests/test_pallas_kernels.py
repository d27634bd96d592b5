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
