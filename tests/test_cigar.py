"""CIGAR encoding of traceback paths (swtpu.core.cigar).

The CIGAR is a pure re-encoding of the reference's (i, j) coordinate-path
contract (source.cpp:1526-1576, :1776-1834), so the tests verify it two
ways: hand-built micro cases, and a reconstruction property on oracle
paths — the score recomputed from the CIGAR's =/X/I/D runs must equal the
engine's score, and the consumed lengths must match the path window.
"""

import json
import subprocess
import sys

import numpy as np
import pytest

from swtpu.core import random_dna, mutate
from swtpu.core.cigar import cigar_stats, path_to_cigar
from swtpu.core.scoring import DNA_111, DNA_10_30_15, ScoringParams
from swtpu.oracle import semiglobal_full, sw_traceback


def _score_from_cigar(cigar, path, q, t, params):
    """Recompute the linear-gap alignment score by walking the CIGAR."""
    assert params.is_linear
    i, j = (int(x) for x in path[0])
    score = 0
    num = 0
    for ch in cigar:
        if ch.isdigit():
            num = num * 10 + ord(ch) - 48
            continue
        if ch == "S":
            num = 0
            continue
        for _ in range(num):
            if ch in "=X":
                i += 1
                j += 1
                score += int(params.matrix[q[i - 1], t[j - 1]])
            elif ch == "I":
                i += 1
                score -= int(params.gap)
            elif ch == "D":
                j += 1
                score -= int(params.gap)
        num = 0
    assert (i, j) == tuple(int(x) for x in path[-1])
    return score


def test_micro_cases():
    # perfect 3-mer match starting at the origin
    path = [(0, 0), (1, 1), (2, 2), (3, 3)]
    q = np.array([0, 1, 2], np.uint8)
    t = np.array([0, 1, 2], np.uint8)
    assert path_to_cigar(path) == "3M"
    assert path_to_cigar(path, q, t) == "3="
    assert path_to_cigar(path, q, t, query_len=3) == "3="
    # mismatch in the middle, clips on both sides of a longer query
    path = [(1, 0), (2, 1), (3, 2), (4, 3)]
    q = np.array([3, 0, 9, 2, 3], np.uint8)
    t = np.array([0, 1, 2], np.uint8)
    assert path_to_cigar(path, q, t, query_len=5) == "1S1=1X1=1S"
    # gaps: I advances i only, D advances j only
    path = [(0, 0), (1, 1), (2, 1), (3, 2), (3, 3)]
    assert path_to_cigar(path) == "1M1I1M1D"
    # empty alignments
    assert path_to_cigar([(0, 0)]) == ""
    assert path_to_cigar([(0, 0)], query_len=4) == "4S"
    assert path_to_cigar([], query_len=0) == ""


def test_rejects_non_path():
    with pytest.raises(ValueError):
        path_to_cigar([(0, 0), (2, 2)])
    with pytest.raises(ValueError):
        path_to_cigar([(1, 1), (0, 0)])
    with pytest.raises(ValueError):
        path_to_cigar([(0, 0), (1, 1)], query_len=0)


def test_cigar_stats_roundtrip():
    st = cigar_stats("2S3=1X2I1D4=1S")
    assert st == dict(
        query_consumed=13,
        target_consumed=9,
        aligned_columns=8,
        matches=7,
        mismatches=1,
        insertions=2,
        deletions=1,
        clipped=3,
    )
    with pytest.raises(ValueError):
        cigar_stats("3=Z")
    with pytest.raises(ValueError):
        cigar_stats("=3")


def test_local_paths_reconstruct(rng):
    for params in (DNA_111, DNA_10_30_15):
        for _ in range(25):
            n = int(rng.integers(1, 80))
            m = int(rng.integers(1, 80))
            q = random_dna(rng, (n,))
            t = mutate(rng, q, 0.3)[:m] if m <= n else random_dna(rng, (m,))
            score, path = sw_traceback(q, t, params)
            cigar = path_to_cigar(path, q, t, query_len=n)
            if score == 0:
                assert cigar == (f"{n}S" if n else "")
                continue
            assert _score_from_cigar(cigar, path, q, t, params) == score
            st = cigar_stats(cigar)
            assert st["query_consumed"] == n
            assert st["target_consumed"] == path[-1][1] - path[0][1]
            # the walk stops at the first zero cell, which for a positive
            # score is entered by a scoring (diagonal) step
            assert st["mismatches"] + st["matches"] >= 1


def test_semiglobal_paths_reconstruct(rng):
    for _ in range(10):
        q = random_dna(rng, (int(rng.integers(8, 60)),))
        t = mutate(rng, q, 0.3)
        params = ScoringParams.linear(DNA_111.matrix, 1)
        score, path = semiglobal_full(q, t, 1, 1, 1)
        cigar = path_to_cigar(path, q, t)
        # semi-global: starts at the top-left corner
        assert tuple(path[0]) == (0, 0)
        assert _score_from_cigar(cigar, path, q, t, params) == score


def test_cli_emits_cigar():
    # force the CPU backend in the subprocess: a bare `-m swtpu` child
    # grabs the TPU tunnel and can starve behind concurrent device jobs
    # (observed: TimeoutExpired while a fuzz soak held the chip)
    out = subprocess.run(
        [
            sys.executable, "-c",
            "import jax; jax.config.update('jax_platforms','cpu');"
            "import sys; sys.argv=['swtpu','align','--random','4x48x48',"
            "'--scoring','2,-1','--gap','1','--cigar'];"
            "from swtpu.cli import main; main()",
        ],
        capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr
    recs = [json.loads(line) for line in out.stdout.splitlines() if line]
    assert len(recs) == 4
    for rec in recs:
        assert "path" not in rec
        st = cigar_stats(rec["cigar"])
        assert st["query_consumed"] == 48
