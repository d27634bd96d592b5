"""Soak-scale randomized differential testing.

The reference validates every kernel with 10M-iteration fixed-seed random
differential loops (``TestSimdSmithWaterman*``, source.cpp:2943-3030;
``TestSemiGlobal``'s mutation-model generator, :2733-2786). swtpu's pytest
suite reproduces the *strategy* at small scale; this module reproduces the
*scale*: a time-bounded loop that streams seed-derived random batches
through every engine tier and counts mismatches against the tier's oracle.

Design:
- Each round draws a config from a rotating family list (uniform DNA,
  tie-rich scoring, general 4x4 matrix, affine, protein/BLOSUM62,
  semi-global, banded mutation-model, fixed-band, streaming-search
  top-k merge, CIGAR/score re-derivation), generates a fresh batch from
  ``seed + round`` (reproducible: any failing round can be re-run alone),
  and differential-tests all applicable engines.
- Local families use the *vectorized* numpy oracle full-batch (the
  throughput anchor) plus a per-pair traceback-oracle endpoint subsample.
  Semi-global/banded use cross-engine equality full-batch plus a per-pair
  scalar-oracle subsample (their scalar oracles are python loops).
- On mismatch, the failing batch is saved as an .npz repro and the loop
  continues; the run fails at the end (exit code / raised error).

CLI: ``python -m swtpu fuzz --minutes 2`` (see cli.py). A short soak is
wired into ``python -m swtpu selftest`` on TPU.
"""

from __future__ import annotations

import dataclasses
import json
import time
from typing import Callable, Dict, List, Optional

import numpy as np

from swtpu.core import mutate, random_dna
from swtpu.core.scoring import ScoringParams, dna_matrix

#: general (non-uniform) DNA matrix exercising the packed-profile path
GENERAL4 = np.array(
    [[3, -2, -1, -2], [-2, 3, -2, -1], [-1, -2, 3, -2], [-2, -1, -2, 3]],
    dtype=np.int32,
)


@dataclasses.dataclass
class FuzzStats:
    rounds: int = 0
    #: engine-evaluations: each engine's differential run over a batch
    #: counts that batch once (a round testing 3 engines on B pairs adds
    #: 3B), mirroring the reference's per-kernel iteration counts
    pairs: int = 0
    cells: int = 0
    mismatches: int = 0
    failures: List[str] = dataclasses.field(default_factory=list)


def _engines_local(params: ScoringParams, use_pallas: bool):
    """name -> fn(qs, ts) -> scores, every applicable local tier."""
    from swtpu.kernels.pallas.sw_batch import _uniform_match_mismatch

    eng: Dict[str, Callable] = {}
    if params.is_linear:
        from swtpu.kernels.xla import sw_batch_diag
        from swtpu.kernels.xla.colscan import sw_batch_colscan

        eng["xla_diag"] = lambda q, t: sw_batch_diag(q, t, params)
        eng["colscan"] = lambda q, t: sw_batch_colscan(q, t, params)
    else:
        from swtpu.kernels.xla.affine_scan import sw_affine_batch_diag

        eng["xla_affine"] = lambda q, t: sw_affine_batch_diag(q, t, params)
    if use_pallas:
        mm = _uniform_match_mismatch(params)
        if params.is_linear and mm is not None and mm[1] < 0 < params.gap:
            from swtpu.kernels.pallas import sw_batch_pallas

            eng["rowscan"] = lambda q, t: sw_batch_pallas(q, t, params)
        elif not params.is_linear and mm is not None:
            from swtpu.kernels.pallas.sw_affine import sw_affine_pallas

            eng["rowscan_affine"] = lambda q, t: sw_affine_pallas(
                q, t, params
            )
        if (
            mm is None
            and params.matrix.min() >= -127
            and params.matrix.max() <= 127
            and (params.gap if params.is_linear else params.gap_extend) > 0
        ):
            from swtpu.kernels.pallas.sw_profile import (
                sw_batch_profile_pallas,
            )

            eng["rowscan_prof"] = lambda q, t: sw_batch_profile_pallas(
                q, t, params
            )
    return eng


def _oracle_local(qs, ts, params: ScoringParams) -> np.ndarray:
    if params.is_linear:
        from swtpu.oracle import sw_score_batch

        return sw_score_batch(qs, ts, params).astype(np.int64)
    from swtpu.oracle.affine import sw_affine_score_batch

    return sw_affine_score_batch(qs, ts, params).astype(np.int64)


def _record_failure(stats: FuzzStats, family, rnd, detail, repro: dict,
                    save_dir: Optional[str]):
    stats.mismatches += 1
    msg = f"round {rnd} family {family}: {detail}"
    stats.failures.append(msg)
    if save_dir:
        import os

        os.makedirs(save_dir, exist_ok=True)
        path = os.path.join(save_dir, f"fuzz_r{rnd}_{family}.npz")
        np.savez_compressed(path, **repro)
        stats.failures[-1] += f" (repro: {path})"


def _round_local(rng, stats, family, rnd, params, B, n, m, use_pallas,
                 save_dir, ends_check=True, pad_tail=True):
    qs = random_dna(rng, (B, n))
    ts = random_dna(rng, (B, m))
    want = _oracle_local(qs, ts, params)
    # engines see a pad-extended batch on ~1/3 of rounds: the pad
    # contract (q:4/t:5 never raise the max) is part of the spec.
    # (rng-drawn, NOT rnd % 3: with the family list rotating by rnd %
    # n_families, rnd-residue gates pin each family to one arm forever)
    if pad_tail and rng.integers(3) == 0:
        qe = np.concatenate([qs, np.full((B, 8), 4, np.uint8)], axis=1)
        te = np.concatenate([ts, np.full((B, 8), 5, np.uint8)], axis=1)
    else:
        qe, te = qs, ts
    for name, fn in _engines_local(params, use_pallas).items():
        got = np.asarray(fn(qe, te)).astype(np.int64)
        if not np.array_equal(got, want):
            bad = int(np.flatnonzero(got != want)[0])
            _record_failure(
                stats, family, rnd,
                f"{name} score mismatch at pair {bad}: "
                f"{got[bad]} != {want[bad]}",
                dict(qs=qs, ts=ts, matrix=params.matrix,
                     go=params.gap_open, ge=params.gap_extend), save_dir,
            )
        stats.pairs += B
        stats.cells += B * n * m
    if ends_check:
        # endpoints: device argmax vs the traceback oracle on a subsample
        from swtpu.ops.variants import best_ends_engine

        nsub = min(B, 4)
        sub = slice(0, nsub)
        sc, ei, ej = (
            np.asarray(x) for x in best_ends_engine(params)(qe[sub], te[sub])
        )
        if params.is_linear:
            from swtpu.oracle import sw_traceback as tb
        else:
            from swtpu.oracle.affine import sw_affine_traceback as tb
        for b in range(nsub):
            s0, path = tb(qs[b], ts[b], params)
            if not (s0 == sc[b] and path[-1] == (ei[b], ej[b])):
                _record_failure(
                    stats, family, rnd,
                    f"endpoint mismatch at pair {b}: "
                    f"({sc[b]},{ei[b]},{ej[b]}) vs {s0}@{path[-1]}",
                    dict(qs=qs[:4], ts=ts[:4], matrix=params.matrix,
                         go=params.gap_open, ge=params.gap_extend),
                    save_dir,
                )


def _round_protein(rng, stats, rnd, B, use_pallas, save_dir):
    from swtpu.core.protein import blosum62_params, random_protein

    params = blosum62_params()
    n, m = 48, 64
    qs = random_protein(rng, (B, n))
    ts = random_protein(rng, (B, m))
    want = _oracle_local(qs, ts, params)
    for name, fn in _engines_local(params, use_pallas).items():
        got = np.asarray(fn(qs, ts)).astype(np.int64)
        if not np.array_equal(got, want):
            bad = int(np.flatnonzero(got != want)[0])
            _record_failure(
                stats, "protein", rnd,
                f"{name} mismatch at pair {bad}: {got[bad]} != {want[bad]}",
                dict(qs=qs, ts=ts, matrix=params.matrix,
                     go=params.gap_open, ge=params.gap_extend), save_dir,
            )
        stats.pairs += B
        stats.cells += B * n * m


def _round_semiglobal(rng, stats, rnd, B, use_pallas, save_dir):
    from swtpu.kernels.xla.semiglobal_scan import semiglobal_batch_diag
    from swtpu.oracle.semiglobal import semiglobal_full

    n, m = 48, 64
    qs = random_dna(rng, (B, n))
    ts = random_dna(rng, (B, m))
    # tie-rich (2,-1,1) on ~half the rounds: endpoint tie-breaks are spec
    ma, mi, g = (2, 1, 1) if rng.integers(2) else (1, 1, 1)
    fwd = [np.asarray(x) for x in
           semiglobal_batch_diag(qs, ts, ma, mi, g)]
    # Pallas twin: self-pads the batch axis to its 1024-pair tile
    if use_pallas and n % 8 == 0 and m % 16 == 0:
        from swtpu.kernels.pallas.semiglobal_batch import (
            semiglobal_batch_pallas,
        )

        fwd2 = [np.asarray(x) for x in
                semiglobal_batch_pallas(qs, ts, ma, mi, g)]
        for a, b, what in zip(fwd, fwd2, ("score", "end_i", "end_j")):
            if not np.array_equal(a, b):
                bad = int(np.flatnonzero(a != b)[0])
                _record_failure(
                    stats, "semiglobal", rnd,
                    f"pallas/xla {what} mismatch at pair {bad}",
                    dict(qs=qs, ts=ts, scoring=np.array([ma, mi, g])),
                    save_dir,
                )
        stats.pairs += B
    # scalar-oracle anchor on a subsample
    for b in range(min(B, 4)):
        s0, path = semiglobal_full(qs[b], ts[b], ma, mi, g)
        if not (s0 == fwd[0][b] and path[-1] == (fwd[1][b], fwd[2][b])):
            _record_failure(
                stats, "semiglobal", rnd,
                f"oracle mismatch at pair {b}: "
                f"({fwd[0][b]},{fwd[1][b]},{fwd[2][b]}) vs {s0}@{path[-1]}",
                dict(qs=qs[:4], ts=ts[:4], scoring=np.array([ma, mi, g])),
                save_dir,
            )
    stats.pairs += B
    stats.cells += B * n * m
    # global/NW read-out of the same family (pin_end): engine vs oracle
    from swtpu.kernels.xla.semiglobal_scan import nw_batch_diag
    from swtpu.oracle.semiglobal import nw_full

    nsc = np.asarray(nw_batch_diag(qs, ts, ma, mi, g))
    for b in range(min(B, 4)):
        s0 = nw_full(qs[b], ts[b], ma, mi, g)[0]
        if s0 != nsc[b]:
            _record_failure(
                stats, "semiglobal", rnd,
                f"nw mismatch at pair {b}: {nsc[b]} vs {s0}",
                dict(qs=qs[:4], ts=ts[:4], scoring=np.array([ma, mi, g])),
                save_dir,
            )
    stats.pairs += B
    stats.cells += B * n * m


def _round_banded(rng, stats, rnd, B, save_dir):
    from swtpu.kernels.xla.banded_scan import banded_xdrop_batch
    from swtpu.oracle.semiglobal import banded_xdrop

    from swtpu.oracle.banded_affine import banded_affine_xdrop

    L = 192
    qs = random_dna(rng, (B, L))
    ts = np.stack([mutate(rng, qs[b], out_len=L) for b in range(B)])
    # alternate linear / Gotoh rounds (the affine extension rides the
    # same H-only band history); rng-drawn so both arms run whatever the
    # family rotation period is
    affine = bool(rng.integers(2))
    kw = dict(gap_open=3, gap_extend=1) if affine else {}
    res = banded_xdrop_batch(qs, ts, with_history=False, **kw)
    for b in range(min(B, 8)):
        if affine:
            score0, _ = banded_affine_xdrop(qs[b], ts[b], **kw)
        else:
            score0, _ = banded_xdrop(qs[b], ts[b])
        if int(res.score[b]) != score0:
            _record_failure(
                stats, "banded", rnd,
                f"score mismatch at pair {b} ({kw or 'linear'}): "
                f"{int(res.score[b])} != {score0}",
                dict(qs=qs[:8], ts=ts[:8]), save_dir,
            )
    stats.pairs += B
    stats.cells += B * 32 * 2 * L  # band cells upper bound


def _round_banded_block(rng, stats, rnd, B, use_pallas, save_dir):
    """Block-adaptive tier vs ITS oracle (oracle/banded_block.py —
    band-clipped tiers get band-clipped oracles): scores + endpoints on
    every checked pair, full history + host walk on a few. The Pallas
    engine runs on TPU only; the round is skipped elsewhere (the CPU
    pytest suite covers it in interpret mode)."""
    if not use_pallas:
        return
    from swtpu.kernels.pallas.banded_block import (
        banded_block_batch_pallas,
        banded_block_traceback_host,
    )
    from swtpu.oracle.banded_block import banded_xdrop_block

    # geometry/scoring arms rng-drawn (never rnd residues — see the
    # round-rotation rule in run())
    W, K = [(32, 16), (64, 32), (64, 64), (48, 16)][int(rng.integers(4))]
    L = int(rng.integers(80, 220))
    match, mismatch, gap, X = [
        (1, 1, 1, 70), (2, 1, 1, 40), (1, 3, 2, 30)
    ][int(rng.integers(3))]
    qs = random_dna(rng, (B, L))
    ts = np.stack([mutate(rng, qs[b], out_len=L) for b in range(B)])
    if rng.integers(2):  # non-homologous arm: per-pair death/freeze
        ts[: B // 2] = random_dna(rng, (B // 2, L))
    # varlen arm (round 5): rng-drawn per-pair lens exercise the kernel
    # row freezes, per-pair n_rows, and the final-row X-drop fixup
    varlen = bool(rng.integers(2))
    lens_q = lens_t = None
    if varlen:
        lens_q = rng.integers(max(K // 2, 8), L + 1, B).astype(np.int64)
        lens_t = rng.integers(max(L // 2, 8), L + 1, B).astype(np.int64)
    res = banded_block_batch_pallas(
        qs, ts, match=match, mismatch=mismatch, gap=gap, width=W,
        block=K, x_threshold=X, with_history=True, with_meta=True,
        lens_q=lens_q, lens_t=lens_t,
    )
    paths = banded_block_traceback_host(
        res, qs, ts, match=match, mismatch=mismatch, gap=gap, block=K,
        x_threshold=X,
    )
    for b in range(min(B, 6)):
        oq = qs[b] if not varlen else qs[b][: lens_q[b]]
        ot = ts[b] if not varlen else ts[b][: lens_t[b]]
        ora = banded_xdrop_block(
            oq, ot, match=match, mismatch=mismatch, gap=gap,
            width=W, block=K, x_threshold=X, return_state=True,
        )
        ok = (
            int(res.score[b]) == ora.score
            and (int(res.end_y[b]), int(res.end_j[b])) == ora.end
            and int(res.n_rows[b]) == ora.n_rows
            and np.array_equal(
                res.band_history[: ora.n_rows, :, b], ora.band_history
            )
            and paths[b] == ora.path
        )
        if not ok:
            _record_failure(
                stats, "banded_block", rnd,
                f"mismatch at pair {b} (W={W} K={K} "
                f"{match}/{mismatch}/{gap} X={X}): "
                f"{int(res.score[b])} != {ora.score}",
                dict(qs=qs[:8], ts=ts[:8]), save_dir,
            )
    stats.pairs += B
    stats.cells += B * W * L


def _round_fixed_band(rng, stats, rnd, B, use_pallas, save_dir):
    """Static-corridor (|i-j| <= W) Pallas tier vs its scalar oracle
    (device tier exists on TPU only; the round is skipped elsewhere)."""
    if not use_pallas:
        return
    from swtpu.kernels.pallas.sw_banded import sw_banded_static_pallas
    from swtpu.oracle.banded_static import sw_banded_static_score_batch

    L, W = 128, 16
    p = (
        ScoringParams.linear(dna_matrix(2, -1), 1)
        if rng.integers(2)
        else ScoringParams(dna_matrix(10, -30), gap_open=40, gap_extend=15)
    )
    qs = random_dna(rng, (B, L))
    ts = np.stack([mutate(rng, qs[b], out_len=L) for b in range(B)])
    got = np.asarray(sw_banded_static_pallas(qs, ts, p, bandwidth=W))
    want = sw_banded_static_score_batch(
        qs[:16], ts[:16], p, W
    ).astype(np.int64)
    if not np.array_equal(got[:16].astype(np.int64), want):
        bad = int(np.flatnonzero(got[:16] != want)[0])
        _record_failure(
            stats, "fixed_band", rnd,
            f"score mismatch at pair {bad}: {got[bad]} != {want[bad]}",
            dict(qs=qs[:16], ts=ts[:16], matrix=p.matrix,
                 go=p.gap_open, ge=p.gap_extend), save_dir,
        )
    stats.pairs += B
    stats.cells += B * (2 * W + 1) * L


def _round_search(rng, stats, rnd, use_pallas, save_dir):
    """Streaming all-vs-all top-k (device-resident merge state) vs a
    brute-force numpy rescore, incl. the deterministic tie order
    (score desc, id asc) and the padded tail chunk. Geometry comes from
    a fixed 2-entry palette so compiled step shapes amortize across the
    soak."""
    from swtpu.parallel.search import all_vs_all_topk

    Nq, L, Nt, chunk, k = [(4, 64, 37, 16, 5), (3, 48, 24, 8, 8)][
        int(rng.integers(2))
    ]
    # tie-rich (2,-1,1) on half the rounds: merge tie order is spec
    ma, mi, g = (2, -1, 1) if rng.integers(2) else (1, -1, 1)
    params = ScoringParams.linear(dna_matrix(ma, mi), g)
    Q = random_dna(rng, (Nq, L))
    T = random_dna(rng, (Nt, L))
    got_s, got_i = all_vs_all_topk(Q, T, params, k=k, chunk_size=chunk)
    ref = np.stack(
        [
            _oracle_local(np.repeat(Q[b : b + 1], Nt, 0), T, params)
            for b in range(Nq)
        ]
    )
    ids = np.arange(Nt)[None, :].repeat(Nq, 0)
    order = np.lexsort((ids, -ref), axis=1)[:, :k]
    want_s = np.take_along_axis(ref, order, axis=1).astype(np.int64)
    if not (
        np.array_equal(got_i.astype(np.int64), order)
        and np.array_equal(got_s.astype(np.int64), want_s)
    ):
        _record_failure(
            stats, "search", rnd,
            f"top-{k} mismatch (Nq={Nq} Nt={Nt} chunk={chunk} "
            f"scoring=({ma},{mi},{g}))",
            dict(Q=Q, T=T, matrix=params.matrix, gap=np.array([g]),
                 k=np.array([k]), chunk=np.array([chunk])), save_dir,
        )
    stats.pairs += Nq * Nt
    stats.cells += Nq * Nt * L * L


def _round_cigar(rng, stats, rnd, use_pallas, save_dir):
    """Traceback path -> CIGAR -> independent score re-derivation.
    sw_align_batch paths are re-walked column by column (matrix score per
    =/X/M, linear or Gotoh gap-run costs for I/D runs) and the re-derived
    score must equal the engine score; CIGAR op counts must consume
    exactly the query (soft clips included) and the path's target span."""
    from swtpu.batch.traceback import sw_align_batch
    from swtpu.core.cigar import cigar_stats, path_to_cigar

    B, n, m = 8, 64, 80
    affine = bool(rng.integers(2))
    params = (
        ScoringParams(dna_matrix(2, -1), gap_open=3, gap_extend=1)
        if affine
        else ScoringParams.linear(dna_matrix(2, -1), 1)
    )
    qs = random_dna(rng, (B, n))
    # mutation-model on half the rounds: long homologous paths with runs
    if rng.integers(2):
        ts = np.stack([mutate(rng, qs[b], out_len=m) for b in range(B)])
    else:
        ts = random_dna(rng, (B, m))
    for b, (score, path) in enumerate(
        sw_align_batch(qs, ts, params)
    ):
        cg = path_to_cigar(path, qs[b], ts[b], query_len=n)
        st = cigar_stats(cg)
        # consumption invariants
        ok = st["query_consumed"] == n
        if len(path) >= 2:
            ok = ok and st["target_consumed"] == path[-1][1] - path[0][1]
        # independent score re-derivation from the path
        rescore = 0
        run = None  # current gap-run op or None
        for (i0, j0), (i1, j1) in zip(path, path[1:]):
            if i1 > i0 and j1 > j0:
                rescore += int(
                    params.matrix[qs[b][i1 - 1], ts[b][j1 - 1]]
                )
                run = None
            else:
                op = "I" if i1 > i0 else "D"
                rescore -= int(
                    params.gap_extend
                    + (0 if run == op else params.gap_open - params.gap_extend)
                    if not params.is_linear
                    else params.gap
                )
                run = op
        ok = ok and rescore == int(score)
        if not ok:
            _record_failure(
                stats, "cigar", rnd,
                f"pair {b}: cigar={cg} stats={st} rescore={rescore} "
                f"score={int(score)} ({'affine' if affine else 'linear'})",
                dict(qs=qs, ts=ts, matrix=params.matrix,
                     go=params.gap_open, ge=params.gap_extend), save_dir,
            )
    stats.pairs += B
    stats.cells += B * n * m


def run_fuzz(
    minutes: float = 1.0,
    seed: int = 10000,
    pairs_per_round: int = 512,
    families: Optional[List[str]] = None,
    use_pallas: Optional[bool] = None,
    save_dir: Optional[str] = "fuzz_failures",
    log: Optional[Callable[[str], None]] = print,
    max_rounds: Optional[int] = None,
) -> FuzzStats:
    """Run the soak loop for ~minutes of wall time. Returns FuzzStats;
    raises AssertionError at the end if any mismatch was recorded."""
    import jax

    if use_pallas is None:
        use_pallas = jax.devices()[0].platform == "tpu"
    all_families = [
        "uniform", "tie_rich", "general4", "affine",
        "protein", "semiglobal", "banded", "fixed_band",
        "search", "cigar", "banded_block",
    ]
    families = families or all_families
    for f in families:
        if f not in all_families:
            raise ValueError(f"unknown family {f!r}; have {all_families}")
    stats = FuzzStats()
    B = pairs_per_round
    deadline = time.monotonic() + minutes * 60.0
    rnd = 0
    while time.monotonic() < deadline:
        if max_rounds is not None and rnd >= max_rounds:
            break
        fam = families[rnd % len(families)]
        # per-round RNG: failing rounds re-run standalone. All intra-
        # family config choices (geometry, scoring arm, pad gate) are
        # drawn from THIS rng, never from rnd residues: the family
        # itself is rnd % len(families), so an `rnd % k` gate with
        # k | len(families) would pin a family to one arm forever.
        rng = np.random.default_rng(seed + rnd)
        # geometry from a fixed palette (incl. non-tile-aligned lengths):
        # varied coverage without unbounded recompilation
        n, m = [(64, 96), (128, 128), (100, 137), (48, 64)][
            int(rng.integers(4))
        ]
        if fam == "uniform":
            sc = [(1, -1, 1), (10, -30, 15)][int(rng.integers(2))]
            _round_local(
                rng, stats, fam, rnd,
                ScoringParams.linear(dna_matrix(sc[0], sc[1]), sc[2]),
                B, n, m, use_pallas, save_dir,
            )
        elif fam == "tie_rich":
            _round_local(
                rng, stats, fam, rnd,
                ScoringParams.linear(dna_matrix(2, -1), 1),
                B, n, m, use_pallas, save_dir,
            )
        elif fam == "general4":
            _round_local(
                rng, stats, fam, rnd, ScoringParams.linear(GENERAL4, 2),
                B, n, m, use_pallas, save_dir,
            )
        elif fam == "affine":
            _round_local(
                rng, stats, fam, rnd,
                ScoringParams(dna_matrix(2, -1), gap_open=3, gap_extend=1),
                B, n, m, use_pallas, save_dir,
            )
        elif fam == "protein":
            _round_protein(rng, stats, rnd, max(B // 4, 32), use_pallas,
                           save_dir)
        elif fam == "semiglobal":
            _round_semiglobal(rng, stats, rnd, B, use_pallas, save_dir)
        elif fam == "banded":
            _round_banded(rng, stats, rnd, max(B // 8, 16), save_dir)
        elif fam == "fixed_band":
            _round_fixed_band(
                rng, stats, rnd, max(B // 8, 16), use_pallas, save_dir
            )
        elif fam == "banded_block":
            _round_banded_block(
                rng, stats, rnd, max(B // 8, 16), use_pallas, save_dir
            )
        elif fam == "search":
            _round_search(rng, stats, rnd, use_pallas, save_dir)
        elif fam == "cigar":
            _round_cigar(rng, stats, rnd, use_pallas, save_dir)
        stats.rounds = rnd = rnd + 1
        if log and rnd % 20 == 0:
            log(
                f"fuzz: {rnd} rounds, {stats.pairs} pairs, "
                f"{stats.cells / 1e9:.2f} Gcells, "
                f"{stats.mismatches} mismatches"
            )
    if log:
        log(json.dumps(dict(
            rounds=stats.rounds, pairs=stats.pairs, cells=stats.cells,
            mismatches=stats.mismatches,
        )))
        for f in stats.failures[:20]:
            log("FAIL: " + f)
    if stats.mismatches:
        raise AssertionError(
            f"fuzz found {stats.mismatches} mismatches "
            f"({stats.rounds} rounds, {stats.pairs} pairs)"
        )
    return stats
