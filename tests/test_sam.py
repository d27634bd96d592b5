"""SAM emission: header/record fields, soft clips, AS/NM tags, unmapped
records, and the CLI --sam surface (align / semiglobal / banded)."""

import json
import subprocess
import sys

import numpy as np
import pytest

from swtpu.core import random_dna
from swtpu.core.cigar import cigar_stats
from swtpu.core.sam import sam_header, sam_record


def test_sam_header_dedup():
    h = sam_header([("t0", 64), ("t1", 48), ("t0", 64)])
    lines = h.split("\n")
    assert lines[0] == "@HD\tVN:1.6\tSO:unknown"
    assert lines[1] == "@SQ\tSN:t0\tLN:64"
    assert lines[2] == "@SQ\tSN:t1\tLN:48"
    assert lines[3].startswith("@PG\t")
    assert len(lines) == 4


def test_sam_record_fields():
    # q = ACGT aligned to t = AGGT at target offset 2: path anchored at
    # (0, 2), 4 diagonal steps, one mismatch (C vs G)
    q = np.array([0, 1, 2, 3], np.uint8)
    t = np.array([3, 3, 0, 2, 2, 3], np.uint8)
    path = [(0, 2), (1, 3), (2, 4), (3, 5), (4, 6)]
    rec = sam_record("q0", "t0", q, t, score=5, path=path).split("\t")
    assert rec[0] == "q0" and rec[1] == "0" and rec[2] == "t0"
    assert rec[3] == "3"  # 1-based POS
    assert rec[5] == "1=1X2="
    assert rec[9] == "ACGT"
    assert rec[11] == "AS:i:5" and rec[12] == "NM:i:1"


def test_sam_record_soft_clips_and_nm():
    rng = np.random.default_rng(10000)
    q = random_dna(rng, (32,))
    t = random_dna(rng, (40,))
    # aligned window rows 4..10 (6 columns), with one insertion
    path = [(4, 7), (5, 8), (6, 9), (7, 9), (8, 10), (9, 11), (10, 12)]
    rec = sam_record("q", "t", q, t, score=9, path=path).split("\t")
    st = cigar_stats(rec[5])
    assert st["query_consumed"] == 32
    assert st["clipped"] == 4 + 22
    assert st["insertions"] == 1
    assert rec[3] == "8"
    assert rec[12] == f"NM:i:{st['mismatches'] + 1}"


def test_sam_record_unmapped():
    q = np.array([0, 1, 2], np.uint8)
    rec = sam_record("q0", "t0", q, q, score=0, path=[]).split("\t")
    assert rec[1] == "4" and rec[2] == "*" and rec[3] == "0"
    assert rec[5] == "*" and rec[9] == "ACG"


def _run_sam(cli_args):
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
    return r.stdout.strip().split("\n")


def test_cli_search_tsv():
    """search --tsv: outfmt-6-style rows whose column arithmetic is
    internally consistent (alnlen = aligned + indels; spans match)."""
    lines = _run_sam(
        ["search", "--random", "3x12x48", "--topk", "2", "--tsv"]
    )
    assert len(lines) == 6
    for l in lines:
        f = l.split("\t")
        assert len(f) == 11
        pident, alnlen, mism = float(f[2]), int(f[3]), int(f[4])
        qs_, qe, ts_, te, score = (int(x) for x in f[6:11])
        qspan, tspan = qe - qs_ + 1, te - ts_ + 1
        aligned = qspan + tspan - alnlen  # I = alnlen - tspan, D = ...
        assert aligned > 0 and score > 0
        matches = round(pident * alnlen / 100)
        assert matches + mism == aligned


def test_cli_search_both_strands(tmp_path):
    """--both-strands finds a planted reverse-complement match and tags
    it '-' (SAM FLAG 16); forward-only search scores it low."""
    from swtpu.core.encode import revcomp
    from swtpu.core.io import decode_dna, write_fasta

    rng = np.random.default_rng(10000)
    t_codes = random_dna(rng, (60,))
    # query = revcomp of the target's middle 40-mer
    q_codes = revcomp(t_codes[10:50])
    qf, tf = tmp_path / "q.fa", tmp_path / "t.fa"
    write_fasta(qf, [("q0", decode_dna(q_codes))])
    write_fasta(
        tf,
        [("t0", decode_dna(t_codes)), ("t1", decode_dna(random_dna(rng, (60,))))],
    )
    base = ["search", "--queries", str(qf), "--targets", str(tf),
            "--topk", "1"]
    plus_only = json.loads(_run_sam(base)[0])
    both = json.loads(_run_sam(base + ["--both-strands"])[0])
    assert both["hits"][0]["strand"] == "-"
    assert both["hits"][0]["target"] == "t0"
    assert both["hits"][0]["score"] >= 40  # full 40-mer match
    assert plus_only["hits"][0]["score"] < both["hits"][0]["score"]
    # SAM: reverse-strand hit carries FLAG 16 and the revcomp'd SEQ
    sam = _run_sam(base + ["--both-strands", "--sam"])
    rec = [l for l in sam if not l.startswith("@")][0].split("\t")
    assert rec[1] == "16"
    assert rec[9] == decode_dna(revcomp(q_codes))
    assert "AS:i:" + str(both["hits"][0]["score"]) in rec
    # JSON --cigar: =/X classification must use the strand that was
    # aligned — a perfect revcomp match is all '=' (regression: it was
    # classified against the forward query, reading as all-X)
    cg = json.loads(
        _run_sam(base + ["--both-strands", "--cigar"])[0]
    )["hits"][0]
    assert cg["strand"] == "-"
    assert cigar_stats(cg["cigar"])["mismatches"] == 0


def test_cli_search_sam_and_cigar():
    """search --sam: one record per surviving hit, ranked per query;
    search --cigar: hits gain rescored alignments."""
    lines = _run_sam(
        ["search", "--random", "3x12x48", "--topk", "2", "--sam"]
    )
    body = [l for l in lines if not l.startswith("@")]
    assert len(body) == 6  # 3 queries x 2 hits
    for l in body:
        f = l.split("\t")
        assert f[2].startswith("t") and f[5] != "*"
        assert any(x.startswith("AS:i:") for x in f[11:])
    json_lines = _run_sam(
        ["search", "--random", "3x12x48", "--topk", "2", "--cigar"]
    )
    recs = [json.loads(l) for l in json_lines]
    assert len(recs) == 3
    # rescored traceback scores match the device top-k scores
    plain = [
        json.loads(l)
        for l in _run_sam(["search", "--random", "3x12x48", "--topk", "2"])
    ]
    for r, p in zip(recs, plain):
        assert [h["score"] for h in r["hits"]] == [
            h["score"] for h in p["hits"]
        ]
        assert [h["target"] for h in r["hits"]] == [
            h["target"] for h in p["hits"]
        ]
        assert all("cigar" in h for h in r["hits"])


@pytest.mark.parametrize(
    "cmd",
    [
        ["align", "--random", "3x48x64", "--sam"],
        ["semiglobal", "--random", "2x48x64", "--sam"],
        ["banded", "--random", "2x100x100", "--sam"],
    ],
)
def test_cli_sam(cmd):
    lines = _run_sam(cmd)
    n_pairs = int(cmd[2].split("x")[0])
    hdr = [l for l in lines if l.startswith("@")]
    body = [l for l in lines if not l.startswith("@")]
    assert hdr[0].startswith("@HD") and len(body) == n_pairs
    assert sum(1 for l in hdr if l.startswith("@SQ")) == n_pairs
    # cross-check each record against the JSON traceback output
    json_lines = _run_sam(cmd[:-1] + ["--traceback", "--cigar"])
    recs = [json.loads(l) for l in json_lines]
    for sam_line, rec in zip(body, recs):
        f = sam_line.split("\t")
        assert f"AS:i:{rec['score']}" in f
        path = rec["path"]
        if len(path) >= 2:
            assert int(f[3]) == path[0][1] + 1
            # align emits soft-clipped local cigars; semiglobal/banded
            # JSON cigars omit clips — compare the clip-stripped core
            st_sam = cigar_stats(f[5])
            st_json = cigar_stats(rec["cigar"])
            for key in ("aligned_columns", "insertions", "deletions",
                        "matches", "mismatches"):
                assert st_sam[key] == st_json[key]
