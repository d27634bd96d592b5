"""Greedy OLC assembler demo (realizing the reference's empty assembly
stub, source.cpp:2729-2731)."""

import numpy as np

from swtpu.core import random_dna
from swtpu.models import assemble_greedy, make_reads


def test_assembles_clean_reads(rng):
    genome = random_dna(rng, (1200,))
    reads = make_reads(rng, genome, read_len=150, step=90)
    contig = assemble_greedy(reads, min_overlap=30)
    assert np.array_equal(contig, genome)


def test_single_and_empty():
    assert assemble_greedy([]).size == 0
    r = np.array([0, 1, 2, 3], np.uint8)
    assert np.array_equal(assemble_greedy([r]), r)
