"""CLI end-to-end tests (JSON-lines output, FASTA I/O, config flags)."""

import contextlib
import io
import json
import os
import tempfile

import numpy as np
import pytest

from swtpu.cli import main
from swtpu.core.io import (
    encode_dna,
    decode_dna,
    load_fasta_batch,
    read_fasta,
    write_fasta,
)
from swtpu.core.scoring import DNA_10_30_15
from swtpu.oracle import sw_score


def _run(argv, raw=False):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        main(argv)
    lines = buf.getvalue().splitlines()
    if raw:
        return lines
    return [json.loads(l) for l in lines]


@pytest.fixture
def fastas(rng, tmp_path):
    def seq(n):
        return decode_dna(rng.integers(0, 4, n))

    q = tmp_path / "q.fa"
    t = tmp_path / "t.fa"
    write_fasta(q, [(f"q{i}", seq(80)) for i in range(3)])
    write_fasta(t, [(f"t{i}", seq(90)) for i in range(3)])
    return str(q), str(t)


def test_fasta_roundtrip(rng, tmp_path):
    seqs = [("a", "ACGTACGT"), ("b", "GGGTTTCA")]
    p = tmp_path / "x.fa"
    write_fasta(p, seqs)
    assert list(read_fasta(p)) == seqs
    names, batch, lens = load_fasta_batch(str(p))
    assert names == ["a", "b"] and batch.shape == (2, 8)
    assert np.array_equal(batch[0], encode_dna("ACGTACGT"))


def test_cli_align_scores_match_oracle(fastas):
    q, t = fastas
    recs = _run(
        ["align", "--queries", q, "--targets", t,
         "--scoring", "10,-30", "--gap", "15"]
    )
    _, qs, ql = load_fasta_batch(q)
    _, ts, tl = load_fasta_batch(t, pad_code=5)
    for i, rec in enumerate(recs):
        assert rec["score"] == sw_score(qs[i], ts[i], DNA_10_30_15)


def test_cli_align_traceback(fastas):
    q, t = fastas
    recs = _run(["align", "--queries", q, "--targets", t, "--traceback"])
    assert all("path" in r and r["path"] for r in recs)


def test_cli_banded_and_semiglobal():
    recs = _run(["banded", "--random", "2x200x200"])
    assert all("score" in r and "end" in r for r in recs)
    recs = _run(["semiglobal", "--random", "2x50x50"])
    assert all(r["start"] == [0, 0] for r in recs)


def test_cli_banded_affine():
    recs = _run(
        ["banded", "--random", "2x200x200", "--gap-open", "3",
         "--gap-extend", "1", "--traceback"]
    )
    assert all("score" in r and "path" in r for r in recs)


def test_cli_search(fastas):
    q, t = fastas
    recs = _run(
        ["search", "--queries", q, "--targets", t, "--topk", "2",
         "--chunk", "2"]
    )
    assert len(recs) == 3
    assert all(len(r["hits"]) == 2 for r in recs)
    # hits sorted by score desc
    for r in recs:
        ss = [h["score"] for h in r["hits"]]
        assert ss == sorted(ss, reverse=True)
    # --verbose routes the search loop's JSON lines through RunLog
    recs_v = _run(
        ["search", "--queries", q, "--targets", t, "--topk", "2",
         "--chunk", "2", "--verbose"]
    )
    assert recs_v == recs


def test_cli_assemble():
    """assemble --random reconstructs the genome; --sam places reads."""
    out = _run(["assemble", "--random", "240x60x30"], raw=True)
    assert json.loads(out[0])["contig_len"] == 240
    assert out[1] == ">contig" and len(out[2]) == 240
    out = _run(["assemble", "--random", "240x60x30", "--sam"], raw=True)
    body = [
        l for l in out if "\t" in l and not l.startswith("@")
    ]
    # every read placed as a perfect match on the contig
    assert body and all("NM:i:0" in l and "60=" in l for l in body)


def test_cli_selftest():
    recs = _run(["selftest"])
    assert recs[0]["ok"] is True


def test_cli_banded_fixed():
    recs = _run(
        ["banded", "--random", "2x100x100", "--fixed", "--bandwidth", "16"]
    )
    assert all("score" in r for r in recs)


def test_cli_protein_search(tmp_path):
    rng = np.random.default_rng(7)
    aa = "ARNDCQEGHILKMFPSTWYV"
    mk = lambda L: "".join(aa[i] for i in rng.integers(0, 20, L))
    qf, tf = tmp_path / "q.fa", tmp_path / "t.fa"
    qf.write_text("".join(f">q{i}\n{mk(32)}\n" for i in range(2)))
    tf.write_text("".join(f">t{i}\n{mk(40)}\n" for i in range(8)))
    recs = _run(
        ["search", "--queries", str(qf), "--targets", str(tf),
         "--alphabet", "protein", "--gap", "11", "--topk", "2",
         "--chunk", "4"]
    )
    assert len(recs) == 2 and all(len(r["hits"]) == 2 for r in recs)


def test_cli_protein_semiglobal(tmp_path):
    rng = np.random.default_rng(11)
    aa = "ARNDCQEGHILKMFPSTWYV"
    mk = lambda L: "".join(aa[i] for i in rng.integers(0, 20, L))
    qf, tf = tmp_path / "q.fa", tmp_path / "t.fa"
    qf.write_text("".join(f">q{i}\n{mk(40)}\n" for i in range(2)))
    tf.write_text("".join(f">t{i}\n{mk(48)}\n" for i in range(2)))
    recs = _run(
        ["semiglobal", "--queries", str(qf), "--targets", str(tf),
         "--alphabet", "protein", "--gap-open", "11", "--gap-extend", "1",
         "--traceback"]
    )
    assert len(recs) == 2
    assert all(r["start"] == [0, 0] and r["path"] for r in recs)


def test_cli_protein_banded(tmp_path):
    rng = np.random.default_rng(13)
    aa = "ARNDCQEGHILKMFPSTWYV"
    base = [aa[i] for i in rng.integers(0, 20, 100)]
    mut = list(base)
    for i in rng.integers(0, 100, 12):
        mut[i] = aa[rng.integers(0, 20)]
    qf, tf = tmp_path / "q.fa", tmp_path / "t.fa"
    qf.write_text(f">q0\n{''.join(base)}\n")
    tf.write_text(f">t0\n{''.join(mut)}\n")
    recs = _run(
        ["banded", "--queries", str(qf), "--targets", str(tf),
         "--alphabet", "protein", "--gap-open", "11", "--gap-extend", "1",
         "--x-drop", "120", "--traceback"]
    )
    assert len(recs) == 1 and recs[0]["path"]


def test_cli_protein_varlen_pads(tmp_path):
    """Unequal-length protein FASTA must pad with the reserved 24/25
    codes, not the DNA 4/5 (= residues C/Q, BLOSUM62 C-C is +9): a short
    all-C query vs a long C-rich target is the adversarial case — DNA
    pads would extend the alignment through fake C matches."""
    from swtpu.core.protein import BLOSUM62, encode_protein
    from swtpu.core.scoring import ScoringParams
    from swtpu.oracle import sw_score

    q1, q2 = "CCCCCCCC", "ARNDCQEGHILKMFPSTWYV"
    t1, t2 = "CCCCCCCCCCCC", "ARNDCQEG"
    qf, tf = tmp_path / "q.fa", tmp_path / "t.fa"
    qf.write_text(f">q1\n{q1}\n>q2\n{q2}\n")
    tf.write_text(f">t1\n{t1}\n>t2\n{t2}\n")
    params = ScoringParams(BLOSUM62, gap_open=11, gap_extend=11)
    want = [
        sw_score(encode_protein(q), encode_protein(t), params)
        for q, t in [(q1, t1), (q2, t2)]
    ]
    recs = _run(
        ["align", "--queries", str(qf), "--targets", str(tf),
         "--alphabet", "protein", "--gap", "11"]
    )
    assert [r["score"] for r in recs] == want  # q1|t1: 8 C's = 72
    # semiglobal rides the varlen masked-argmax path for these shapes
    recs = _run(
        ["semiglobal", "--queries", str(qf), "--targets", str(tf),
         "--alphabet", "protein", "--cigar"]
    )
    assert recs[0]["cigar"] == "8="  # no pad-extended tail
    assert recs[0]["end"] == [8, 8]


def test_cli_global(tmp_path):
    """`swtpu global`: NW scores + corner-to-corner paths vs the oracle."""
    from swtpu.core.io import decode_dna as dec
    from swtpu.oracle import nw_full

    rng = np.random.default_rng(23)
    qs = rng.integers(0, 4, (2, 30))
    ts = rng.integers(0, 4, (2, 34))
    qf, tf = tmp_path / "q.fa", tmp_path / "t.fa"
    write_fasta(qf, [(f"q{i}", dec(qs[i])) for i in range(2)])
    write_fasta(tf, [(f"t{i}", dec(ts[i])) for i in range(2)])
    recs = _run(
        ["global", "--queries", str(qf), "--targets", str(tf),
         "--scoring", "2,-1", "--gap", "1", "--traceback"]
    )
    for i, r in enumerate(recs):
        sc, path = nw_full(qs[i], ts[i], 2, 1, 1)
        assert r["score"] == sc
        assert r["start"] == [0, 0] and r["end"] == [30, 34]
        assert [tuple(p) for p in r["path"]] == path


def test_cli_longpair(tmp_path):
    rng = np.random.default_rng(17)
    q = decode_dna(rng.integers(0, 4, 256))
    t = decode_dna(rng.integers(0, 4, 256))
    qf, tf = tmp_path / "q.fa", tmp_path / "t.fa"
    qf.write_text(f">q0\n{q}\n")
    tf.write_text(f">t0\n{t}\n")
    recs = _run(
        ["longpair", "--queries", str(qf), "--targets", str(tf),
         "--scoring", "10,-30", "--gap", "15", "--block", "64",
         "--devices", "8", "--traceback"]
    )
    assert len(recs) == 1 and recs[0]["path"]


def test_packed_batch_preserves_ambiguity_codes(tmp_path):
    """ACGTNACGT must NOT round-trip to ACGTAACGT (advisor r03):
    save_packed_batch records in-length codes >3 in an ambig bitmask and
    load restores them as pad codes, so Ns never score as 'A'."""
    from swtpu.core.io import (
        decode_dna,
        encode_dna,
        load_packed_batch,
        save_packed_batch,
    )

    seqs = ["ACGTNACGT", "NNACGT", "ACGT"]
    batch = np.full((3, 9), 4, np.uint8)
    lens = np.array([len(s) for s in seqs])
    for i, s in enumerate(seqs):
        batch[i, : len(s)] = encode_dna(s)
    npz = tmp_path / "amb.npz"
    save_packed_batch(str(npz), ["a", "b", "c"], batch, lens)
    _, got, got_lens = load_packed_batch(str(npz))
    for i, s in enumerate(seqs):
        assert decode_dna(got[i, : got_lens[i]]) == s
        assert (got[i, got_lens[i] :] == 4).all()
    # device decode path applies the same mask
    _, got_d, _ = load_packed_batch(str(npz), device=True)
    assert np.array_equal(np.asarray(got_d), got)
    # clean batches don't grow an ambig array (format unchanged)
    npz2 = tmp_path / "clean.npz"
    save_packed_batch(
        str(npz2), ["c"], batch[2:3, :4], np.array([4])
    )
    assert "ambig" not in np.load(str(npz2), allow_pickle=True).files


def test_cli_pack_roundtrip_and_2bit_inputs(rng, tmp_path):
    """2-bit container e2e: pack -> packed .npz accepted by align/search
    directly (≙ the reference's unpack family feeding its kernels,
    source.cpp:1580-1774), and pack --unpack restores the FASTA."""
    from swtpu.core.io import load_packed_batch

    n = [17, 32, 9]
    seqs = [rng.integers(0, 4, L).astype(np.uint8) for L in n]
    fa = tmp_path / "db.fa"
    write_fasta(fa, [(f"s{i}", decode_dna(s)) for i, s in enumerate(seqs)])
    npz = tmp_path / "db.npz"
    (rec,) = _run(["pack", str(fa), str(npz)])
    assert rec["records"] == 3

    names, batch, lens = load_packed_batch(str(npz))
    assert names == ["s0", "s1", "s2"]
    assert list(lens) == n
    for i, s in enumerate(seqs):
        assert np.array_equal(batch[i, : lens[i]], s)
        assert (batch[i, lens[i] :] == 4).all()  # re-padded

    # device-side decode path returns the same codes
    names_d, batch_d, lens_d = load_packed_batch(str(npz), device=True)
    assert np.array_equal(np.asarray(batch_d), batch)

    # packed input accepted end-to-end by search (vs the FASTA itself)
    got_fa = _run(
        ["search", "--queries", str(fa), "--targets", str(fa), "--topk", "2"]
    )
    got_npz = _run(
        ["search", "--queries", str(npz), "--targets", str(npz),
         "--topk", "2"]
    )
    assert got_fa == got_npz

    # pack --unpack restores the FASTA records exactly
    fa2 = tmp_path / "back.fa"
    _run(["pack", str(npz), str(fa2), "--unpack"])
    assert list(read_fasta(str(fa2))) == list(read_fasta(str(fa)))
