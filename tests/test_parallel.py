"""Distributed-layer tests on the virtual 8-device CPU mesh.

The reference has no multi-node code; SURVEY.md §4.7 prescribes validating
sharded results against single-host results on a virtual mesh.
"""

import os
import tempfile

import numpy as np

from swtpu.core import random_dna
from swtpu.core.scoring import DNA_111, DNA_10_30_15
from swtpu.kernels.xla import sw_batch_diag
from swtpu.oracle import sw_score_batch
from swtpu.parallel import (
    make_mesh,
    data_parallel_scores,
    all_vs_all_topk,
    sharded_all_vs_all_topk,
    SearchCheckpoint,
)


def _brute_topk(Q, T, params, k):
    ref = np.stack(
        [
            sw_score_batch(np.repeat(Q[i : i + 1], len(T), 0), T, params)
            for i in range(len(Q))
        ]
    )
    ids = np.arange(len(T))[None, :].repeat(len(Q), 0)
    order = np.lexsort((ids, -ref), axis=1)[:, :k]
    return np.take_along_axis(ref, order, axis=1).astype(np.int32), order


def test_data_parallel_matches_single_host(rng):
    mesh = make_mesh(8)
    qs = random_dna(rng, (64, 48))
    ts = random_dna(rng, (64, 48))
    with mesh:
        sharded = np.asarray(data_parallel_scores(qs, ts, DNA_10_30_15, mesh))
    single = np.asarray(sw_batch_diag(qs, ts, DNA_10_30_15))
    assert np.array_equal(sharded, single)


def test_all_vs_all_topk_deterministic(rng):
    Q = random_dna(rng, (4, 64))
    T = random_dna(rng, (48, 64))
    engine = lambda q, t: sw_batch_diag(q, t, DNA_111)
    s, i = all_vs_all_topk(Q, T, DNA_111, k=5, chunk_size=16, engine=engine)
    rs, ri = _brute_topk(Q, T, DNA_111, 5)
    assert np.array_equal(s, rs) and np.array_equal(i, ri)


def test_sharded_topk_matches_brute(rng):
    mesh = make_mesh(8)
    Q = random_dna(rng, (4, 64))
    T = random_dna(rng, (64, 64))
    s, i = sharded_all_vs_all_topk(Q, T, DNA_111, mesh, k=5)
    rs, ri = _brute_topk(Q, T, DNA_111, 5)
    assert np.array_equal(s, rs) and np.array_equal(i, ri)


def test_search_checkpoint_resume(rng):
    Q = random_dna(rng, (2, 48))
    T = random_dna(rng, (32, 48))
    engine = lambda q, t: sw_batch_diag(q, t, DNA_111)
    path = os.path.join(tempfile.mkdtemp(), "cursor.npz")
    ckpt = SearchCheckpoint(path)
    full_s, full_i = all_vs_all_topk(
        Q, T, DNA_111, k=4, chunk_size=8, engine=engine
    )
    # run chunks 0..1, then "crash" and resume
    s, i = all_vs_all_topk(
        Q, T[:16], DNA_111, k=4, chunk_size=8, engine=engine, checkpoint=ckpt
    )
    assert ckpt.load()["cursor"] == 16
    # resume against full DB from the recorded cursor + partial state
    s2, i2 = all_vs_all_topk(
        Q, T, DNA_111, k=4, chunk_size=8, engine=engine, checkpoint=ckpt
    )
    assert np.array_equal(s2, full_s) and np.array_equal(i2, full_i)


def test_chunk_retry_on_transient_failure(rng):
    """A fault at *runtime* (not trace time — the engine is traced once
    into the fused search step) is retried and the result is unaffected.
    The fault is injected through a pure_callback so it fires inside the
    compiled executable on the second chunk's execution."""
    import jax
    import jax.numpy as jnp

    Q = random_dna(rng, (2, 48))
    T = random_dna(rng, (16, 48))
    calls = {"n": 0}

    def fault_once(x):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected fault")
        return x

    def flaky(q, t):
        s = sw_batch_diag(q, t, DNA_111)
        return jax.pure_callback(
            fault_once, jax.ShapeDtypeStruct(s.shape, s.dtype), s
        )

    s, i = all_vs_all_topk(Q, T, DNA_111, k=3, chunk_size=8, engine=flaky)
    assert calls["n"] >= 3  # chunk 1 ok, chunk 2 faulted then retried
    good = lambda q, t: sw_batch_diag(q, t, DNA_111)
    s2, i2 = all_vs_all_topk(Q, T, DNA_111, k=3, chunk_size=8, engine=good)
    assert np.array_equal(s, s2) and np.array_equal(i, i2)


def test_search_tail_chunk_padding(rng):
    """Nt not divisible by chunk_size: the tail chunk is padded on device
    and the pad targets' hits are masked out of the merge."""
    Q = random_dna(rng, (3, 56))
    T = random_dna(rng, (21, 56))  # 8 + 8 + tail of 5
    engine = lambda q, t: sw_batch_diag(q, t, DNA_111)
    s, i = all_vs_all_topk(Q, T, DNA_111, k=6, chunk_size=8, engine=engine)
    rs, ri = _brute_topk(Q, T, DNA_111, 6)
    assert np.array_equal(s, rs) and np.array_equal(i, ri)
    assert (i < len(T)).all()


def test_sharded_topk_uneven_db_and_affine(rng):
    """DB not divisible by the mesh: internal padding, pad hits masked;
    affine params route through best_engine inside the shard_map."""
    from swtpu.core.scoring import ScoringParams, dna_matrix
    from swtpu.oracle.affine import sw_affine_score_batch

    mesh = make_mesh(8)
    Q = random_dna(rng, (3, 48))
    T = random_dna(rng, (53, 48))  # 53 % 8 != 0
    params = ScoringParams(dna_matrix(10, -30), gap_open=40, gap_extend=15)
    s, i = sharded_all_vs_all_topk(Q, T, params, mesh, k=5)
    ref = np.stack(
        [
            sw_affine_score_batch(np.repeat(Q[x : x + 1], len(T), 0), T, params)
            for x in range(len(Q))
        ]
    )
    rids = np.arange(len(T))[None, :].repeat(len(Q), 0)
    order = np.lexsort((rids, -ref), axis=1)[:, :5]
    assert np.array_equal(i, order)
    assert np.array_equal(
        s, np.take_along_axis(ref, order, axis=1).astype(np.int32)
    )


def test_sharded_topk_protein(rng):
    """Protein/BLOSUM62 DB through the sharded path."""
    from swtpu.core.protein import blosum62_params, random_protein
    from swtpu.oracle.affine import sw_affine_score_batch

    mesh = make_mesh(8)
    params = blosum62_params()
    Q = random_protein(rng, (2, 32))
    T = random_protein(rng, (19, 32))
    s, i = sharded_all_vs_all_topk(Q, T, params, mesh, k=4)
    ref = np.stack(
        [
            sw_affine_score_batch(np.repeat(Q[x : x + 1], len(T), 0), T, params)
            for x in range(len(Q))
        ]
    )
    rids = np.arange(len(T))[None, :].repeat(len(Q), 0)
    order = np.lexsort((rids, -ref), axis=1)[:, :4]
    assert np.array_equal(i, order)
    assert np.array_equal(
        s, np.take_along_axis(ref, order, axis=1).astype(np.int32)
    )


def test_search_deterministic_error_not_retried(rng):
    """A deterministic (shape/config) failure raises immediately instead
    of being retried max_retries times."""
    Q = random_dna(rng, (2, 48))
    T = random_dna(rng, (16, 48))
    calls = {"n": 0}

    def broken(q, t):
        calls["n"] += 1
        raise ValueError("deterministic config error")

    try:
        all_vs_all_topk(Q, T, DNA_111, k=3, chunk_size=8, engine=broken)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
    assert calls["n"] == 1


def test_search_affine_scoring(rng):
    """all_vs_all_topk with Gotoh params: best_engine routes the affine
    scorer; hits match a brute-force affine rescore."""
    from swtpu.core.scoring import ScoringParams, dna_matrix
    from swtpu.oracle.affine import sw_affine_score_batch

    params = ScoringParams(dna_matrix(10, -30), gap_open=40, gap_extend=15)
    Q = random_dna(rng, (4, 40))
    T = random_dna(rng, (16, 40))
    scores, ids = all_vs_all_topk(Q, T, params, k=3, chunk_size=8)
    ref = np.stack(
        [
            sw_affine_score_batch(np.repeat(Q[i : i + 1], len(T), 0), T, params)
            for i in range(len(Q))
        ]
    )
    rids = np.arange(len(T))[None, :].repeat(len(Q), 0)
    order = np.lexsort((rids, -ref), axis=1)[:, :3]
    assert np.array_equal(ids, order)
    assert np.array_equal(
        scores, np.take_along_axis(ref, order, axis=1).astype(np.int32)
    )


def test_search_packed_wire_matches_raw(rng):
    """all_vs_all_topk with the 2-bit packed wire (device decode) is
    bit-identical to the raw-byte path — scores, ids, tie order —
    including a non-multiple-of-4 target length and a tail chunk."""
    from swtpu.core.scoring import DNA_10_30_15
    from swtpu.parallel.search import all_vs_all_topk

    Nq, Nt, n, m = 4, 70, 32, 33  # m % 4 != 0; Nt % chunk != 0
    qs = rng.integers(0, 4, (Nq, n)).astype(np.uint8)
    ts = rng.integers(0, 4, (Nt, m)).astype(np.uint8)
    s0, i0 = all_vs_all_topk(
        qs, ts, DNA_10_30_15, k=5, chunk_size=32, packed=False
    )
    s1, i1 = all_vs_all_topk(
        qs, ts, DNA_10_30_15, k=5, chunk_size=32, packed=True
    )
    assert np.array_equal(s0, s1)
    assert np.array_equal(i0, i1)
    # auto engages the packed wire for DNA codes
    s2, i2 = all_vs_all_topk(qs, ts, DNA_10_30_15, k=5, chunk_size=32)
    assert np.array_equal(s0, s2) and np.array_equal(i0, i2)


def test_search_resident_matches_streaming(rng):
    """Device-resident DB sweep (in-jit chunk slices, zero per-chunk
    wire) is bit-identical to the streaming path, packed and raw."""
    from swtpu.core.scoring import DNA_10_30_15
    from swtpu.parallel.search import all_vs_all_topk

    qs = rng.integers(0, 4, (3, 24)).astype(np.uint8)
    ts = rng.integers(0, 4, (50, 26)).astype(np.uint8)
    ref = all_vs_all_topk(
        qs, ts, DNA_10_30_15, k=4, chunk_size=16, resident=False,
        packed=False,
    )
    for packed in (False, True):
        got = all_vs_all_topk(
            qs, ts, DNA_10_30_15, k=4, chunk_size=16, resident=True,
            packed=packed,
        )
        assert np.array_equal(ref[0], got[0])
        assert np.array_equal(ref[1], got[1])


def test_search_fused_sweep_matches_streaming(rng):
    """Max-throughput fused sweep (one jitted scan over a resident DB,
    engaged at max_retries=0 with no checkpoint) is bit-identical to
    the streaming loop."""
    from swtpu.core.scoring import DNA_10_30_15
    from swtpu.parallel.search import all_vs_all_topk

    qs = rng.integers(0, 4, (3, 24)).astype(np.uint8)
    ts = rng.integers(0, 4, (50, 26)).astype(np.uint8)
    ref = all_vs_all_topk(
        qs, ts, DNA_10_30_15, k=4, chunk_size=16, resident=False,
        packed=False,
    )
    got = all_vs_all_topk(
        qs, ts, DNA_10_30_15, k=4, chunk_size=16, resident=True,
        packed=True, max_retries=0,
    )
    assert np.array_equal(ref[0], got[0])
    assert np.array_equal(ref[1], got[1])
