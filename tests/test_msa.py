"""Center-star MSA (models/msa.py) differential/property tests.

The construction has two exact invariants we can assert without an MSA
oracle: (1) rows degap back to the inputs, and (2) the projection of the
MSA onto (center, k) — drop columns where both rows are gaps — IS the
pairwise NW alignment, so its column score equals the device NW score
(the center-star guarantee). Plus small hand-checked cases.
"""

import subprocess
import sys

import numpy as np
import pytest

from swtpu.core.io import decode_dna, encode_dna
from swtpu.core.scoring import ScoringParams, dna_matrix
from swtpu.models.msa import (
    GAP,
    msa_center_star,
    msa_rows_to_strings,
    sp_score,
)


def _proj_score_linear(ra, rb, params):
    keep = ~((ra == GAP) & (rb == GAP))
    a, b = ra[keep], rb[keep]
    both = (a != GAP) & (b != GAP)
    one = (a != GAP) ^ (b != GAP)
    return int(params.matrix[a[both], b[both]].sum()) - params.gap * int(
        one.sum()
    )


def _proj_score_affine(ra, rb, params):
    """Score the projected pairwise alignment with affine gap runs
    (run of L gap columns costs gap_open + (L-1)*gap_extend)."""
    keep = ~((ra == GAP) & (rb == GAP))
    a, b = ra[keep], rb[keep]
    total, run_a, run_b = 0, False, False
    for x, y in zip(a, b):
        if x != GAP and y != GAP:
            total += int(params.matrix[x, y])
            run_a = run_b = False
        elif x == GAP:
            total -= params.gap_open if not run_a else params.gap_extend
            run_a, run_b = True, False
        else:
            total -= params.gap_open if not run_b else params.gap_extend
            run_b, run_a = True, False
    return total


def _degap(row):
    return row[row != GAP].astype(np.uint8)


def test_known_tiny_example():
    seqs = [encode_dna(s) for s in ["ACGT", "AGT", "ACT"]]
    res = msa_center_star(seqs, match=1, mismatch=1, gap=1)
    assert res.center == 0  # ACGT has max total similarity (2+2 vs 2+1)
    assert msa_rows_to_strings(res.rows) == ["ACGT", "A-GT", "AC-T"]
    # SP by hand: (ACGT,A-GT)=2, (ACGT,AC-T)=2, (A-GT,AC-T)=0
    assert res.sp == 4
    params = ScoringParams.linear(dna_matrix(1, -1), 1)
    assert sp_score(res.rows, params) == 4


def test_insertions_widen_center():
    # both neighbors insert at different slots; center row gains gaps
    seqs = [encode_dna(s) for s in ["ACGT", "AACGT", "ACGTT"]]
    res = msa_center_star(seqs, center=0)
    rows = msa_rows_to_strings(res.rows)
    assert all(len(r) == len(rows[0]) for r in rows)
    for s, row in zip(["ACGT", "AACGT", "ACGTT"], rows):
        assert row.replace("-", "") == s


@pytest.mark.parametrize("affine", [False, True])
def test_degap_and_projection_random(affine):
    rng = np.random.default_rng(10000)
    from swtpu.core.encode import mutate

    anc = rng.integers(0, 4, size=64).astype(np.uint8)
    seqs = [mutate(rng, anc) for _ in range(7)]
    if affine:
        params = ScoringParams(dna_matrix(2, -3), gap_open=4, gap_extend=1)
    else:
        params = ScoringParams.linear(dna_matrix(2, -3), 2)
    res = msa_center_star(seqs, params=params)
    widths = {len(r) for r in res.rows}
    assert len(widths) == 1
    for s, row in zip(seqs, res.rows):
        assert np.array_equal(_degap(row), s)
    # center-star guarantee: projection (center, k) == pairwise NW
    proj = _proj_score_affine if affine else _proj_score_linear
    for k in range(len(seqs)):
        if k == res.center:
            continue
        got = proj(res.rows[res.center], res.rows[k], params)
        assert got == res.scores[k], (k, got, res.scores[k])
    if affine:
        assert res.sp is None
    else:
        assert res.sp == sp_score(res.rows, params)


def test_protein_blosum62():
    from swtpu.core.protein import blosum62_params, encode_protein

    params = blosum62_params(gap_open=11, gap_extend=1)
    seqs = [
        encode_protein(s)
        for s in ["MKTAYIAKQR", "MKTAYIAKR", "MKTEYIAKQR", "MTAYIAKQR"]
    ]
    res = msa_center_star(seqs, params=params)
    rows = msa_rows_to_strings(res.rows, "protein")
    assert all(len(r) == len(rows[0]) for r in rows)
    for s, row in zip(["MKTAYIAKQR", "MKTAYIAKR", "MKTEYIAKQR", "MTAYIAKQR"], rows):
        assert row.replace("-", "") == s
    for k in range(len(seqs)):
        if k == res.center:
            continue
        got = _proj_score_affine(res.rows[res.center], res.rows[k], params)
        assert got == res.scores[k]


def test_center_override_and_single():
    seqs = [encode_dna(s) for s in ["ACGT", "AGT", "ACT"]]
    res = msa_center_star(seqs, center=2)
    assert res.center == 2
    for s, row in zip(seqs, res.rows):
        assert decode_dna(_degap(row)) == decode_dna(s)
    one = msa_center_star([seqs[0]])
    assert len(one.rows) == 1 and np.array_equal(
        _degap(one.rows[0]), seqs[0]
    )


def test_cli_msa(tmp_path):
    fa = tmp_path / "in.fa"
    fa.write_text(">a\nACGT\n>b\nAGT\n>c\nACT\n")
    # force the CPU backend (a bare `-m swtpu` child would contend for
    # the TPU tunnel with any concurrent device job)
    out = subprocess.run(
        [
            sys.executable, "-c",
            "import jax; jax.config.update('jax_platforms','cpu');"
            f"import sys; sys.argv=['swtpu','msa','--queries',{str(fa)!r}];"
            "from swtpu.cli import main; main()",
        ],
        capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr
    lines = out.stdout.strip().splitlines()
    assert lines == [">a", "ACGT", ">b", "A-GT", ">c", "AC-T"]
    assert '"sp_score": 4' in out.stderr
