"""Seed-and-extend read mapper (swtpu/models/mapper.py).

The mapper composes components that are each differential-tested
elsewhere (banded X-drop engines vs the scalar oracle); these tests pin
the composition: index correctness vs a brute-force k-mer dict, seeding
geometry, window/length plumbing (hit scores bit-equal to the scalar
banded oracle on the same window), locus recovery on mutation-model
reads (the reference's generator, source.cpp:2750-2771), strand
handling, and multi-contig coordinates.
"""

import json
import subprocess
import sys

import numpy as np
import pytest

from swtpu.core.encode import mutate, revcomp
from swtpu.models.mapper import (
    Candidates,
    KmerIndex,
    _kmer_codes,
    _window_geometry,
    build_index,
    extend_candidates,
    find_candidates,
    map_reads,
)
from swtpu.oracle import banded_xdrop


@pytest.fixture
def genome(rng):
    return rng.integers(0, 4, size=8192).astype(np.uint8)


def test_kmer_codes_brute_force(rng):
    seq = rng.integers(0, 4, size=50).astype(np.uint8)
    k = 5
    codes = _kmer_codes(seq, k)
    for i in range(len(seq) - k + 1):
        want = 0
        for c in seq[i : i + k]:
            want = want * 4 + int(c)
        assert codes[i] == want


def test_kmer_codes_mask_pads():
    seq = np.array([0, 1, 2, 3, 5, 0, 1, 2, 3, 0], np.uint8)
    codes = _kmer_codes(seq, 3)
    # windows touching the pad (index 4) are invalid
    assert (codes[[2, 3, 4]] == -1).all()
    assert (codes[[0, 1, 5, 6, 7]] >= 0).all()


def test_build_index_matches_dict(rng, genome):
    k = 7
    idx = build_index([genome], k=k)
    # brute-force dict of kmer -> sorted positions
    brute = {}
    for i in range(len(genome) - k + 1):
        code = 0
        for c in genome[i : i + k]:
            code = code * 4 + int(c)
        brute.setdefault(code, []).append(i)
    # the index must return exactly those positions for sampled kmers
    for i in rng.integers(0, len(genome) - k, size=50):
        code = _kmer_codes(genome[i : i + k], k)[0]
        lo = np.searchsorted(idx.codes, code, "left")
        hi = np.searchsorted(idx.codes, code, "right")
        assert sorted(idx.pos[lo:hi].tolist()) == brute[int(code)]


def test_candidates_exact_read(genome):
    k = 13
    idx = build_index([genome], k=k)
    p = 1000
    read = genome[p : p + 100]
    c = find_candidates(idx, read[None, :], np.array([100]))
    assert len(c.read) >= 1
    # best cluster anchors at the true diagonal (exact read: diag == p)
    assert c.read[0] == 0 and c.tstart[0] == p
    assert c.n_seeds[0] == 100 - k + 1


def test_hit_scores_match_banded_oracle(rng, genome):
    """The mapper's window/length plumbing: every reported hit score is
    bit-equal to the scalar banded oracle on the read vs the hit's
    window slice."""
    L = 120
    starts = rng.integers(0, len(genome) - L, size=12)
    reads = np.stack(
        [mutate(rng, genome[s : s + L], out_len=L) for s in starts]
    )
    idx = build_index([genome], k=9)
    hits = map_reads(reads, index=idx, min_score=10)
    margin, Lw = _window_geometry(L, 32)
    n_checked = 0
    for i, h in enumerate(hits):
        if h is None:
            continue
        w = idx.ref[h.window_start : h.window_start + Lw]
        want, _ = banded_xdrop(reads[i], w)
        assert h.score == want
        n_checked += 1
    assert n_checked >= 8


def test_locus_recovery_mutation_model(rng, genome):
    L = 120
    starts = rng.integers(0, len(genome) - L, size=40)
    reads = np.stack(
        [mutate(rng, genome[s : s + L], out_len=L) for s in starts]
    )
    idx = build_index([genome], k=9)
    hits = map_reads(reads, index=idx, min_score=20, traceback=True)
    correct = 0
    for i, h in enumerate(hits):
        if h is not None and abs(h.pos - int(starts[i])) <= 32:
            correct += 1
            # path sanity: a (y=0) origin row (glocal: origin-anchored),
            # then 1-based cells ending within the read
            assert h.path[0][0] == 0
            assert 0 < h.path[-1][0] <= L
    assert correct >= 36  # >= 90%


def test_pipelined_matches_plain(rng, genome):
    """map_reads_pipelined is hit-for-hit identical to map_reads: chunks
    only partition reads, and the seed-ahead thread must not change any
    result (bit-equality of the whole hit list)."""
    from swtpu.models.mapper import map_reads_pipelined

    L = 120
    starts = rng.integers(0, len(genome) - L, size=70)
    reads = np.stack(
        [mutate(rng, genome[s : s + L], out_len=L) for s in starts]
    )
    idx = build_index([genome], k=9)
    kw = dict(index=idx, min_score=20, both_strands=True, traceback=True)
    plain = map_reads(reads, **kw)
    piped = map_reads_pipelined(reads, chunk_reads=32, **kw)
    assert len(plain) == len(piped)
    for a, b in zip(plain, piped):
        assert a == b


def test_both_strands(rng, genome):
    L = 150
    p = 3000
    fwd = mutate(rng, genome[p : p + L], out_len=L)
    rev = revcomp(fwd)
    reads = np.stack([fwd, rev])
    idx = build_index([genome], k=9)
    hits = map_reads(reads, index=idx, both_strands=True, min_score=20)
    assert hits[0] is not None and hits[0].strand == "+"
    assert hits[1] is not None and hits[1].strand == "-"
    assert abs(hits[0].pos - p) <= 32 and abs(hits[1].pos - p) <= 32
    # identical alignment either way: same score
    assert hits[0].score == hits[1].score


def test_multi_contig_coordinates(rng):
    c1 = rng.integers(0, 4, size=3000).astype(np.uint8)
    c2 = rng.integers(0, 4, size=5000).astype(np.uint8)
    idx = build_index([c1, c2], names=["chr1", "chr2"], k=11)
    p = 1200
    read = c2[p : p + 100]
    hits = map_reads(read[None, :], index=idx, min_score=50)
    h = hits[0]
    assert h is not None and h.contig == "chr2"
    assert h.pos == p  # margin-0 window on the exact diagonal
    assert h.score == 100  # perfect match, match=1


def test_no_cross_contig_kmers(rng):
    """No k-mer in the index may span the separator between contigs."""
    c1 = rng.integers(0, 4, size=64).astype(np.uint8)
    c2 = rng.integers(0, 4, size=64).astype(np.uint8)
    k = 5
    idx = build_index([c1, c2], k=k)
    # every indexed position's window must be pad-free
    for p in idx.pos:
        assert (idx.ref[p : p + k] < 4).all()


def test_unmapped_read(rng, genome):
    # a read over a disjoint alphabet region: no seeds, no hit
    alien = rng.integers(0, 4, size=(1, 100)).astype(np.uint8)
    # make it definitely absent: mutate heavily away from the genome
    idx = build_index([genome], k=13)
    hits = map_reads(alien, index=idx, min_seeds=3, min_score=95)
    assert hits[0] is None or hits[0].score >= 95


def test_cli_map_random_demo():
    r = subprocess.run(
        [
            sys.executable,
            "-c",
            "import jax; jax.config.update('jax_platforms','cpu');"
            "import sys; sys.argv=['swtpu','map','--random','20000x30x150',"
            "'--both-strands'];"
            "from swtpu.cli import main; main()",
        ],
        capture_output=True,
        text=True,
        timeout=280,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["reads"] == 30
    assert rec["correct_locus"] >= 26


def test_native_seeding_matches_numpy(rng, genome):
    """The C++ seeding kernel is bit-equal to the numpy reference path
    (candidates, anchors, seed counts) on mutation-model reads with
    variable lengths."""
    from swtpu import native
    from swtpu.models.mapper import Candidates

    if not native.available():
        pytest.skip("no native toolchain")
    L = 152
    R = 64
    starts = rng.integers(0, len(genome) - L, size=R)
    reads = np.stack(
        [mutate(rng, genome[s : s + L], out_len=L) for s in starts]
    )
    lens = rng.integers(100, L + 1, R)
    idx = build_index([genome], k=9)
    assert idx.starts is not None and idx.starts.dtype == np.int32
    got = find_candidates(idx, reads, lens, min_seeds=2, max_occ=64,
                          max_loci=8, diag_window=32)
    # force the numpy reference path by dropping the CSR table
    import dataclasses

    idx_np = dataclasses.replace(idx, starts=None)
    want = find_candidates(idx_np, reads, lens, min_seeds=2, max_occ=64,
                           max_loci=8, diag_window=32)
    assert np.array_equal(got.read, want.read)
    assert np.array_equal(got.tstart, want.tstart)
    assert np.array_equal(got.n_seeds, want.n_seeds)


def test_fixed_extension_mode(rng, genome):
    """extend='fixed' screens through the fixed-corridor engine: hit
    scores match the static-band oracle on the hit window (pad-extended
    matrix), and locus recovery stays at the adaptive level."""
    from swtpu.core.scoring import ScoringParams
    from swtpu.oracle.banded_static import sw_banded_static_score

    L = 120
    starts = rng.integers(0, len(genome) - L, size=16)
    reads = np.stack(
        [mutate(rng, genome[s : s + L], out_len=L) for s in starts]
    )
    idx = build_index([genome], k=9)
    hits = map_reads(reads, index=idx, min_score=10, extend="fixed")
    hits_a = map_reads(reads, index=idx, min_score=10, extend="adaptive")
    margin, Lw = _window_geometry(L, 32)
    ext = np.full((6, 6), -1, np.int32)
    ext[:4, :4] = np.where(np.eye(4, dtype=bool), 1, -1)
    pe = ScoringParams(ext, 1, 1)
    n_checked = 0
    for i, h in enumerate(hits):
        if h is None:
            continue
        w = idx.ref[h.window_start : h.window_start + Lw]
        assert h.score == sw_banded_static_score(reads[i], w, pe, 32)
        n_checked += 1
    assert n_checked >= 12
    rec_f = sum(
        1 for i, h in enumerate(hits)
        if h is not None and abs(h.pos - int(starts[i])) <= 32
    )
    rec_a = sum(
        1 for i, h in enumerate(hits_a)
        if h is not None and abs(h.pos - int(starts[i])) <= 32
    )
    assert rec_f >= rec_a - 1  # recovery preserved (ties may differ)


def test_fixed_extension_traceback_rescores(rng, genome):
    """With traceback=True the winners re-run through the adaptive
    engine, so hit+path scores follow the X-drop oracle even in fixed
    screening mode."""
    L = 120
    starts = rng.integers(0, len(genome) - L, size=8)
    reads = np.stack(
        [mutate(rng, genome[s : s + L], out_len=L) for s in starts]
    )
    idx = build_index([genome], k=9)
    hits = map_reads(
        reads, index=idx, min_score=10, extend="fixed", traceback=True
    )
    margin, Lw = _window_geometry(L, 32)
    n_checked = 0
    for i, h in enumerate(hits):
        if h is None:
            continue
        w = idx.ref[h.window_start : h.window_start + Lw]
        want, _ = banded_xdrop(reads[i], w)
        assert h.score == want
        assert h.path and h.path[0][0] == 0
        n_checked += 1
    assert n_checked >= 6


def test_packed_wire_extension_matches_unpacked(rng):
    """The 2-bit packed extension wire (device decode + separator-mask
    restore) scores bit-equal to the raw fixed-corridor path on the
    same (8-aligned) windows — multi-contig boundaries included."""
    from jax.experimental.pallas import tpu as pltpu

    c1 = rng.integers(0, 4, size=900).astype(np.uint8)
    c2 = rng.integers(0, 4, size=1100).astype(np.uint8)
    idx = build_index([c1, c2], k=9)
    L = 120
    reads = []
    starts = []
    for s in [10, 700, 780, 200, 950]:  # incl. windows near boundaries
        src = c1 if s < 900 else c2
        p = min(s, len(src) - L)
        reads.append(mutate(rng, src[p : p + L], out_len=L))
        starts.append(p)
    reads = np.stack(reads)
    lens = np.full(len(reads), L)
    cands = find_candidates(idx, reads, lens, min_seeds=2, max_occ=64,
                            max_loci=8, diag_window=32)
    assert len(cands.read) >= 4
    with pltpu.force_tpu_interpret_mode():
        sp, tp = extend_candidates(
            idx, reads, lens, cands, extend="fixed-packed"
        )
    # raw path on the SAME aligned windows: align the anchors first
    aligned = Candidates(
        read=cands.read,
        tstart=np.maximum(cands.tstart, 0) & ~np.int64(7),
        n_seeds=cands.n_seeds,
    )
    su, tu = extend_candidates(
        idx, reads, lens, aligned, extend="fixed"
    )
    assert np.array_equal(tp, tu)
    assert np.array_equal(sp, su), (sp, su)
