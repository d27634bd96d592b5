"""swtpu command-line interface.

The reference's "config system" is comment-toggling calls in main()
(source.cpp:3275-3301) and constants baked into function names (_111,
_32_70). swtpu replaces that with a real CLI: every name-encoded constant
is a validated flag (scoring, gap model, band geometry, kernel variant,
batch size), while jax.jit static arguments keep the
specialized-constant-compilation property the reference got from C++
constexpr.

Usage:
  python -m swtpu align    --random 1024x128x128 --scoring 10,-30 --gap 15
  python -m swtpu align    --queries q.fa --targets t.fa --traceback
  python -m swtpu semiglobal --random 8x200x200
  python -m swtpu banded   --random 8x2048x2048 --bandwidth 32 --x-drop 70
  python -m swtpu search   --queries q.fa --targets db.fa --topk 10
  python -m swtpu bench    [--quick]
  python -m swtpu selftest
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def _pad_codes(alphabet):
    """Alphabet-correct FASTA pad codes (query, target).

    DNA uses 4/5 (first codes past the 0..3 alphabet). Protein must NOT:
    4/5 are real residues (C, Q — BLOSUM62 C-C is +9), so its pads are
    the reserved 24/25 just past the 24-letter NCBI alphabet.
    """
    if alphabet == "protein":
        from swtpu.core.protein import PROTEIN_Q_PAD, PROTEIN_T_PAD

        return PROTEIN_Q_PAD, PROTEIN_T_PAD
    return 4, 5


def _load_seq_batch(path, alphabet, pad_code, pad_to=0):
    """Load a sequence batch: FASTA, or a 2-bit-packed .npz container
    (swtpu pack; the reference's packed wire format) by extension."""
    from swtpu.core.io import load_fasta_batch, load_packed_batch

    if path.endswith(".npz"):
        if alphabet != "dna":
            raise SystemExit("2-bit packed input is DNA-only")
        return load_packed_batch(path, pad_to=pad_to, pad_code=pad_code)
    return load_fasta_batch(path, alphabet, pad_to=pad_to,
                            pad_code=pad_code)


def _load_pair_inputs(args, pad_q=None, pad_t=None):
    dq, dt = _pad_codes(args.alphabet)
    pad_q = dq if pad_q is None else pad_q
    pad_t = dt if pad_t is None else pad_t

    if args.random:
        b, n, m = (int(x) for x in args.random.split("x"))
        rng = np.random.default_rng(args.seed)
        hi = 4 if args.alphabet == "dna" else 20
        qs = rng.integers(0, hi, size=(b, n)).astype(np.uint8)
        ts = rng.integers(0, hi, size=(b, m)).astype(np.uint8)
        names = [f"pair{i}" for i in range(b)]
        return names, qs, ts, np.full(b, n), np.full(b, m)
    if not (args.queries and args.targets):
        raise SystemExit("need --random BxNxM or --queries/--targets FASTA")
    qn, qs, ql = _load_seq_batch(
        args.queries, args.alphabet, pad_code=pad_q
    )
    tn, ts, tl = _load_seq_batch(
        args.targets, args.alphabet, pad_code=pad_t
    )
    if len(qs) != len(ts):
        raise SystemExit(
            f"pairwise mode needs equal counts, got {len(qs)} vs {len(ts)}"
        )
    return [f"{a}|{b}" for a, b in zip(qn, tn)], qs, ts, ql, tl


def _scoring(args):
    from swtpu.core.scoring import ScoringParams, dna_matrix

    if args.alphabet == "protein":
        from swtpu.core.protein import BLOSUM62

        mat = BLOSUM62
    else:
        match, mismatch = (int(x) for x in args.scoring.split(","))
        mat = dna_matrix(match, mismatch)
    if args.gap_open is not None:
        return ScoringParams(
            mat, gap_open=args.gap_open, gap_extend=args.gap_extend
        )
    return ScoringParams.linear(mat, args.gap)


def _emit_sam(names, qs, ts, ql, tl, alphabet, results):
    """Print SAM 1.6 (header + one record per pair) for an iterable of
    (score, path) results; pair names 'q|t' split into QNAME/RNAME."""
    from swtpu.core.sam import sam_header, sam_record

    qn = [n.split("|", 1)[0] for n in names]
    tn = [
        n.split("|", 1)[1] if "|" in n else f"{n}:target" for n in names
    ]
    print(sam_header(list(zip(tn, [int(x) for x in tl]))))
    for k, (score, path) in enumerate(results):
        print(
            sam_record(
                qn[k], tn[k], qs[k], ts[k], score, path, alphabet,
                query_len=int(ql[k]),
            )
        )


def cmd_align(args):
    names, qs, ts, ql, tl = _load_pair_inputs(args)
    params = _scoring(args)
    if args.sam:
        from swtpu.batch import sw_align_batch

        _emit_sam(
            names, qs, ts, ql, tl, args.alphabet,
            sw_align_batch(qs, ts, params),
        )
        return
    if args.traceback or args.cigar:
        from swtpu.batch import sw_align_batch

        for k, (name, (score, path)) in enumerate(
            zip(names, sw_align_batch(qs, ts, params))
        ):
            rec = dict(pair=name, score=score)
            if args.traceback:
                rec["path"] = path
            if args.cigar:
                from swtpu.core.cigar import path_to_cigar

                rec["cigar"] = path_to_cigar(
                    path, qs[k], ts[k], query_len=int(ql[k])
                )
            print(json.dumps(rec))
        return
    if params.is_linear and args.engine != "xla":
        try:
            from swtpu.ops import get_variant

            scores = np.asarray(get_variant(args.engine)(qs, ts, params))
        except (KeyError, NotImplementedError):
            from swtpu.kernels.xla import sw_batch_diag

            scores = np.asarray(sw_batch_diag(qs, ts, params))
    elif params.is_linear:
        from swtpu.kernels.xla import sw_batch_diag

        scores = np.asarray(sw_batch_diag(qs, ts, params))
    else:
        from swtpu.kernels.xla.affine_scan import sw_affine_batch_diag

        scores = np.asarray(sw_affine_batch_diag(qs, ts, params))
    for name, s in zip(names, scores):
        print(json.dumps(dict(pair=name, score=int(s))))


def cmd_semiglobal(args, pin_end=False):
    names, qs, ts, ql, tl = _load_pair_inputs(args)
    from swtpu.batch import semiglobal_align_batch

    # varlen FASTA batches ride the exact masked-argmax path; uniform
    # batches skip the lens args so the Pallas fast path stays eligible
    varlen = bool(
        (np.asarray(ql) != qs.shape[1]).any()
        or (np.asarray(tl) != ts.shape[1]).any()
    )
    lens_kw = dict(lens_q=ql, lens_t=tl) if varlen else {}
    if pin_end:
        # global/NW: endpoints pinned at each pair's corner
        lens_kw["pin_end"] = True
    if args.alphabet == "protein":
        # general-substitution-matrix mode (BLOSUM62 table engine)
        out = semiglobal_align_batch(qs, ts, params=_scoring(args), **lens_kw)
    else:
        match, mismatch = (int(x) for x in args.scoring.split(","))
        out = semiglobal_align_batch(
            qs, ts, match, abs(mismatch), args.gap,
            gap_open=args.gap_open,
            gap_extend=args.gap_extend if args.gap_open is not None else None,
            **lens_kw,
        )
    if args.sam:
        _emit_sam(names, qs, ts, ql, tl, args.alphabet, out)
        return
    for k, (name, (score, path)) in enumerate(zip(names, out)):
        rec = dict(pair=name, score=score, start=path[0], end=path[-1])
        if args.traceback:
            rec["path"] = path
        if args.cigar:
            from swtpu.core.cigar import path_to_cigar

            # semi-global: the alignment window is the path itself, no
            # soft clips (it starts at the top-left by definition)
            rec["cigar"] = path_to_cigar(path, qs[k], ts[k])
        print(json.dumps(rec))


def cmd_banded(args):
    names, qs, ts, ql, tl = _load_pair_inputs(args)
    match, mismatch = (int(x) for x in args.scoring.split(","))
    if args.fixed:
        # fixed diagonal corridor |i-j| <= W (BASELINE configs 1-2
        # geometry); supports DNA and protein scoring via --alphabet
        import jax

        params = _scoring(args)
        if args.traceback or args.cigar or args.sam:
            from swtpu.batch.traceback import banded_static_align_batch

            out = banded_static_align_batch(
                qs, ts, params, bandwidth=args.bandwidth
            )
            if args.sam:
                _emit_sam(names, qs, ts, ql, tl, args.alphabet, out)
                return
            for k, (name, (score, path)) in enumerate(zip(names, out)):
                rec = dict(pair=name, score=score)
                if args.traceback:
                    rec["path"] = path
                if args.cigar:
                    from swtpu.core.cigar import path_to_cigar

                    rec["cigar"] = path_to_cigar(
                        path, qs[k], ts[k], query_len=int(ql[k])
                    )
                print(json.dumps(rec))
            return
        if jax.devices()[0].platform == "tpu":
            from swtpu.kernels.pallas.sw_batch import (
                _uniform_match_mismatch,
            )
            from swtpu.kernels.pallas.sw_banded import (
                sw_banded_profile_pallas,
                sw_banded_static_pallas,
            )

            fwd = (
                sw_banded_static_pallas
                if _uniform_match_mismatch(params) is not None
                else sw_banded_profile_pallas
            )
            scores = np.asarray(
                fwd(qs, ts, params, bandwidth=args.bandwidth)
            )
        else:
            from swtpu.oracle.banded_static import (
                sw_banded_static_score_batch,
            )

            scores = sw_banded_static_score_batch(
                qs, ts, params, bandwidth=args.bandwidth
            )
        for name, s in zip(names, scores):
            print(json.dumps(dict(pair=name, score=int(s))))
        return
    if args.block_adaptive:
        # block-adaptive tier (round 4; round 5 adds per-pair varlen
        # on the linear engines): linear/affine/protein, device walk
        import jax

        varlen = not (np.all(ql == ql[0]) and np.all(tl == tl[0]))
        if varlen and args.gap_open is not None:
            raise SystemExit(
                "--block-adaptive affine needs uniform lengths; the "
                "linear engines take per-pair lens (round 5)"
            )
        if jax.devices()[0].platform != "tpu":
            raise SystemExit(
                "--block-adaptive is the Pallas tier (TPU only); the "
                "default engine has a portable XLA path"
            )
        from swtpu.kernels.pallas.banded_block import (
            banded_block_align_device,
            banded_block_batch_pallas,
        )

        kw = dict(
            match=match, mismatch=abs(mismatch),
            width=args.bandwidth * 2, block=args.bandwidth,
            x_threshold=args.x_drop,
            matrix=(
                _scoring(args).matrix
                if args.alphabet == "protein" else None
            ),
        )
        qs2 = qs[:, : int(ql.max())]
        ts2 = ts[:, : int(tl.max())]
        if varlen:
            kw["lens_q"] = ql
            kw["lens_t"] = tl
        if args.traceback or args.cigar:
            if args.gap_open is not None:
                raise SystemExit(
                    "--block-adaptive affine traceback: use the python "
                    "API (banded_block_traceback_host); the CLI device "
                    "walk is linear-gap"
                )
            out = banded_block_align_device(qs2, ts2, gap=args.gap, **kw)
            for k, (name, (score, path)) in enumerate(zip(names, out)):
                rec = dict(
                    pair=name, score=score, start=path[0], end=path[-1]
                )
                if args.traceback:
                    rec["path"] = path
                if args.cigar:
                    from swtpu.core.cigar import path_to_cigar

                    rec["cigar"] = path_to_cigar(path, qs2[k], ts2[k])
                print(json.dumps(rec))
            return
        res = banded_block_batch_pallas(
            qs2, ts2,
            gap=args.gap if args.gap_open is None else 1,
            gap_open=args.gap_open,
            gap_extend=(
                args.gap_extend if args.gap_open is not None else None
            ),
            **kw,
        )
        for k, name in enumerate(names):
            print(
                json.dumps(
                    dict(
                        pair=name, score=int(res.score[k]),
                        end=[int(res.end_y[k]), int(res.end_j[k])],
                    )
                )
            )
        return
    from swtpu.batch import banded_align_batch

    # linear and affine ride the same device forward pass; affine paths
    # come from the host Gotoh walker over the device band history.
    # --alphabet protein selects the general-matrix (BLOSUM62) mode.
    out = banded_align_batch(
        qs,
        ts,
        list(ql),
        list(tl),
        match=match,
        mismatch=abs(mismatch),
        gap=args.gap,
        bandwidth=args.bandwidth,
        x_threshold=args.x_drop,
        gap_open=args.gap_open,
        gap_extend=args.gap_extend if args.gap_open is not None else None,
        matrix=_scoring(args).matrix if args.alphabet == "protein" else None,
    )
    if args.sam:
        _emit_sam(names, qs, ts, ql, tl, args.alphabet, out)
        return
    for k, (name, (score, path)) in enumerate(zip(names, out)):
        rec = dict(pair=name, score=score, start=path[0], end=path[-1])
        if args.traceback:
            rec["path"] = path
        if args.cigar:
            from swtpu.core.cigar import path_to_cigar

            # banded semi-global: path starts at the top-left, no clips
            rec["cigar"] = path_to_cigar(path, qs[k], ts[k])
        print(json.dumps(rec))


def cmd_longpair(args):
    """Sequence-parallel single-pair alignment: the query strips over the
    mesh's sp axis, strip boundaries over ICI (parallel/longpair.py)."""
    import jax

    from swtpu.parallel import longpair_sw_align, longpair_sw_score, make_mesh

    names, qs, ts, ql, tl = _load_pair_inputs(args)
    params = _scoring(args)
    n_dev = args.devices or len(jax.devices())
    mesh = make_mesh(n_dev, axis="sp")
    sam_rows = []  # (name, trimmed q, trimmed t, score, path)
    for name, q, t, lq, lt in zip(names, qs, ts, ql, tl):
        q, t = q[:lq], t[:lt]
        # strip/block divisibility: trim to the mesh/block grid
        if len(q) < n_dev or len(t) < (args.block or 1):
            blk = args.block if args.block is not None else "auto"
            raise SystemExit(
                f"longpair needs len(q) >= devices ({n_dev}) and len(t) >="
                f" --block ({blk}); got {len(q)}x{len(t)} for"
                f" {name} — lower --block/--devices or use `align`"
            )
        if len(q) % n_dev:
            new_lq = len(q) - len(q) % n_dev
            print(
                f"warning: {name}: query trimmed {len(q)} -> {new_lq} to a"
                f" multiple of --devices ({n_dev}); reported score is for"
                " the TRIMMED pair",
                file=sys.stderr,
            )
            q = q[:new_lq]
        block = args.block
        if block is None:
            # auto: the step-count-optimal divisor of len(t) — always
            # divides, so the target is never trimmed
            from swtpu.parallel.longpair import _auto_block

            block = _auto_block(len(q), len(t), n_dev)
        elif len(t) % block:
            new_lt = len(t) - len(t) % block
            print(
                f"warning: {name}: target trimmed {len(t)} -> {new_lt} to a"
                f" multiple of --block ({block}); reported score is for"
                " the TRIMMED pair",
                file=sys.stderr,
            )
            t = t[:new_lt]
        if args.traceback or args.cigar or args.sam:
            score, path = longpair_sw_align(
                q, t, params, mesh, block=block
            )
            if args.sam:
                sam_rows.append((name, q, t, score, path))
                continue
            rec = dict(pair=name, score=score)
            if args.traceback:
                rec["path"] = path
            if args.cigar:
                from swtpu.core.cigar import path_to_cigar

                rec["cigar"] = path_to_cigar(path, q, t, query_len=len(q))
            print(json.dumps(rec))
        else:
            score = longpair_sw_score(q, t, params, mesh, block=block)
            print(json.dumps(dict(pair=name, score=score)))
    if sam_rows:
        _emit_sam(
            [r[0] for r in sam_rows],
            [r[1] for r in sam_rows],
            [r[2] for r in sam_rows],
            [len(r[1]) for r in sam_rows],
            [len(r[2]) for r in sam_rows],
            args.alphabet,
            [(r[3], r[4]) for r in sam_rows],
        )


def cmd_search(args):
    from swtpu.parallel.search import all_vs_all_topk, SearchCheckpoint
    from swtpu.utils.obs import RunLog

    params = _scoring(args)
    if args.random:
        nq, nt, L = (int(x) for x in args.random.split("x"))
        rng = np.random.default_rng(args.seed)
        hi = 4 if args.alphabet == "dna" else 20
        Q = rng.integers(0, hi, size=(nq, L)).astype(np.uint8)
        T = rng.integers(0, hi, size=(nt, L)).astype(np.uint8)
        qn = [f"q{i}" for i in range(nq)]
        tn = [f"t{i}" for i in range(nt)]
        ql = np.full(nq, L)
        tl = np.full(nt, L)
    else:
        pad_q, pad_t = _pad_codes(args.alphabet)
        qn, Q, ql = _load_seq_batch(
            args.queries, args.alphabet, pad_code=pad_q
        )
        tn, T, tl = _load_seq_batch(
            args.targets, args.alphabet, pad_code=pad_t
        )
    log = RunLog()
    ckpt = SearchCheckpoint(args.checkpoint) if args.checkpoint else None
    Nq = len(Q)
    if args.both_strands:
        if args.alphabet != "dna":
            raise SystemExit("--both-strands is DNA-only")
        from swtpu.core.encode import revcomp

        # stack the reverse complements as extra query rows: one search
        # over [2*Nq] queries, then a per-query merge of the two strands
        Qrc = np.stack([revcomp(Q[i], ql[i]) for i in range(Nq)])
        Qx = np.concatenate([Q, Qrc])
    else:
        Qrc = None
        Qx = Q
    scores, ids = all_vs_all_topk(
        Qx,
        T,
        params,
        k=args.topk,
        chunk_size=args.chunk,
        checkpoint=ckpt,
        # the search loop emits pre-serialized JSON lines; re-structure
        # them into RunLog records (adds the ts field)
        log=(lambda line: log.emit(**json.loads(line)))
        if args.verbose
        else None,
    )
    if args.both_strands:
        # deterministic per-query strand merge: score desc, then target
        # id asc, then '+' strand before '-'
        s2 = np.concatenate([scores[:Nq], scores[Nq:]], axis=1)
        i2 = np.concatenate([ids[:Nq], ids[Nq:]], axis=1)
        st2 = np.concatenate(
            [np.zeros_like(ids[:Nq]), np.ones_like(ids[Nq:])], axis=1
        )
        order = np.lexsort((st2, i2, -s2), axis=1)[:, : args.topk]
        scores = np.take_along_axis(s2, order, axis=1)
        ids = np.take_along_axis(i2, order, axis=1)
        strands = np.take_along_axis(st2, order, axis=1)
    else:
        strands = np.zeros_like(ids)
    if args.sam or args.cigar or args.traceback or args.tsv:
        # BLAST-like end-to-end: traceback every surviving (query, hit)
        # pair in one batched device pass and emit alignments
        from swtpu.batch import sw_align_batch

        hits_ijs = [
            (i, int(j), int(st))
            for i in range(len(qn))
            for s, j, st in zip(scores[i], ids[i], strands[i])
            if s >= 0
        ]
        pj = [h[1] for h in hits_ijs]
        # the aligned query row is the strand that actually hit
        qrow = lambda i, st: Qrc[i] if st else Q[i]
        Qsel = (
            np.stack([qrow(i, st) for i, _, st in hits_ijs])
            if hits_ijs
            else Q[:0]
        )
        aligned = (
            sw_align_batch(Qsel, T[pj], params) if hits_ijs else []
        )
        if args.sam:
            from swtpu.core.sam import sam_header, sam_record

            print(
                sam_header([(tn[j], int(tl[j])) for j in sorted(set(pj))])
            )
            for (i, j, st), (score, path) in zip(hits_ijs, aligned):
                print(
                    sam_record(
                        qn[i], tn[j], qrow(i, st), T[j], score, path,
                        args.alphabet, query_len=int(ql[i]),
                        flag=16 if st else 0,
                    )
                )
            return
        if args.tsv:
            # BLAST outfmt-6-style: qname tname pident alnlen mismatches
            # gapopens qstart qend tstart tend + either the raw SW score
            # (--stats none, 11 cols) or the standard evalue/bitscore
            # pair (--stats auto/preset/calibrate: full outfmt 6).
            # 1-based inclusive coordinates.
            from swtpu.core.cigar import cigar_stats, path_to_cigar

            ka = None
            if args.stats != "none":
                from swtpu.core.stats import (
                    bit_score,
                    e_value,
                    resolve_stats,
                )

                # calibrate at the search's own geometry (median lengths
                # rounded to the engines' 8/16 tile quanta): the fitted
                # Gumbel then models the score distribution at exactly
                # this problem size, edge effects included
                mean_tl = float(np.mean(tl)) if len(tl) else 1.0
                m_cal = max(8, int(round(np.median(ql) / 8)) * 8)
                n_cal = max(16, int(round(np.median(tl) / 16)) * 16)
                ka = resolve_stats(
                    params,
                    args.alphabet,
                    mode=args.stats,
                    calibrate_pairs=args.calibrate_pairs,
                    seed=args.seed,
                    m=m_cal,
                    n=n_cal,
                )
                print(
                    f"# karlin-altschul: lambda={ka.lam:.4f} "
                    f"K={ka.K:.4g} source={ka.source}",
                    file=sys.stderr,
                )
            for (i, j, strand), (score, path) in zip(hits_ijs, aligned):
                if len(path) < 2:
                    continue
                st = cigar_stats(
                    path_to_cigar(path, qrow(i, strand), T[j])
                )
                cols = st["aligned_columns"] + st["insertions"] + st[
                    "deletions"
                ]
                # gap openings = gap RUNS, not gap steps
                runs = 0
                prev = None
                for (a, b), (c, d) in zip(path, path[1:]):
                    stp = (c - a, d - b)
                    if stp != (1, 1) and stp != prev:
                        runs += 1
                    prev = stp
                pid = 100.0 * st["matches"] / cols if cols else 0.0
                if ka is not None:
                    ev = float(
                        e_value(
                            score, int(ql[i]), mean_tl, ka,
                            db_seqs=len(T),
                        )
                    )
                    if (
                        args.evalue_max is not None
                        and ev > args.evalue_max
                    ):
                        continue
                    tail = (f"{ev:.2g}", f"{float(bit_score(score, ka)):.1f}")
                else:
                    tail = (int(score),)
                print(
                    "\t".join(
                        str(x)
                        for x in (
                            qn[i], tn[j], f"{pid:.1f}", cols,
                            st["mismatches"], runs,
                            path[0][0] + 1, path[-1][0],
                            path[0][1] + 1, path[-1][1],
                        )
                        + tail
                        + (("-" if strand else "+",)
                           if args.both_strands else ())
                    )
                )
            return
        out = {i: [] for i in range(len(qn))}
        for (i, j, strand), (score, path) in zip(hits_ijs, aligned):
            hit = dict(target=tn[j], score=int(score))
            if args.both_strands:
                hit["strand"] = "-" if strand else "+"
            if args.traceback:
                hit["path"] = path
            if args.cigar:
                from swtpu.core.cigar import path_to_cigar

                # the path was walked on the strand that hit (qrow), so
                # =/X classification must use that orientation too
                hit["cigar"] = path_to_cigar(
                    path, qrow(i, strand), T[j], query_len=int(ql[i])
                )
            out[i].append(hit)
        for i, name in enumerate(qn):
            print(json.dumps(dict(query=name, hits=out[i])))
        return
    for i, name in enumerate(qn):
        hits = [
            dict(
                target=tn[j] if j < len(tn) else int(j),
                score=int(s),
                **(
                    dict(strand="-" if st else "+")
                    if args.both_strands
                    else {}
                ),
            )
            for s, j, st in zip(scores[i], ids[i], strands[i])
            if s >= 0
        ]
        print(json.dumps(dict(query=name, hits=hits)))


def cmd_map(args):
    """Seed-and-extend read mapping: k-mer seeding (host) + batched
    adaptive-banded X-drop glocal extension (device) — the mapping
    pipeline the reference's banded family (source.cpp:1836-2725) and
    mutation-model generator (source.cpp:2750-2771) are built for."""
    from swtpu.models.mapper import build_index, map_reads

    rng = np.random.default_rng(args.seed)
    if args.random:
        # GxRxL: random G-mer genome, R reads of length L sampled at
        # random loci and pushed through the mutation model
        from swtpu.core.encode import mutate, revcomp

        G, R, L = (int(x) for x in args.random.split("x"))
        genome = rng.integers(0, 4, size=G).astype(np.uint8)
        starts = rng.integers(0, G - L, size=R)
        reads = np.stack(
            [mutate(rng, genome[s : s + L], out_len=L) for s in starts]
        )
        if args.both_strands:
            flip = rng.random(R) < 0.5
            for i in np.nonzero(flip)[0]:
                reads[i] = revcomp(reads[i])
        rnames = [f"read{i}" for i in range(R)]
        rlens = np.full(R, L)
        contigs, cnames, clens = [genome], ["genome"], [G]
    else:
        if not (args.reads and args.ref):
            raise SystemExit("need --reads and --ref FASTAs or --random")
        rnames, reads, rlens = _load_seq_batch(
            args.reads, "dna", pad_code=4
        )
        cnames, carr, clens = _load_seq_batch(args.ref, "dna", pad_code=5)
        contigs = [carr[i] for i in range(len(carr))]
    k = args.k if args.k is not None else (9 if args.random else 13)
    idx = build_index(contigs, cnames, k=k, lens=clens)
    want_path = args.traceback or args.cigar or args.sam
    hits = map_reads(
        reads,
        rlens,
        index=idx,
        min_seeds=args.min_seeds,
        max_occ=args.max_occ,
        max_loci=args.max_loci,
        match=args.match,
        mismatch=args.mismatch,
        gap=args.gap,
        gap_open=args.gap_open,
        gap_extend=args.gap_extend,
        bandwidth=args.bandwidth,
        x_threshold=args.x_drop,
        min_score=args.min_score,
        both_strands=args.both_strands,
        traceback=want_path,
    )
    n_mapped = sum(h is not None for h in hits)
    if args.random:
        # reconstruction report: how many reads land on their true locus
        ok = sum(
            1
            for i, h in enumerate(hits)
            if h is not None and abs(h.pos - int(starts[i])) <= args.bandwidth
        )
        print(
            json.dumps(
                dict(
                    reads=len(hits), mapped=n_mapped,
                    correct_locus=ok,
                )
            )
        )
        return
    if args.sam:
        from swtpu.core.encode import revcomp
        from swtpu.core.sam import sam_header, sam_record

        print(sam_header(list(zip(cnames, [int(x) for x in clens]))))
        for i, h in enumerate(hits):
            q = reads[i]
            if h is not None and h.strand == "-":
                q = revcomp(reads[i], int(rlens[i]))
            if h is None or not h.path:
                print(
                    sam_record(
                        rnames[i], "*", reads[i][: int(rlens[i])],
                        reads[i][:0], 0, [], "dna",
                        query_len=int(rlens[i]),
                    )
                )
                continue
            cid = idx.contig_names.index(h.contig)
            cstart = int(idx.contig_starts[cid])
            tseq = idx.ref[cstart : cstart + int(idx.contig_lens[cid])]
            print(
                sam_record(
                    rnames[i], h.contig, q, tseq, h.score, h.path, "dna",
                    query_len=int(rlens[i]),
                    flag=16 if h.strand == "-" else 0,
                )
            )
        return
    for i, h in enumerate(hits):
        rec = dict(read=rnames[i])
        if h is None:
            rec["mapped"] = False
        else:
            rec.update(
                mapped=True, contig=h.contig, pos=h.pos, score=h.score,
                strand=h.strand, n_seeds=h.n_seeds,
            )
            if args.traceback and h.path:
                rec["path"] = [list(p) for p in h.path]
            if args.cigar and h.path:
                from swtpu.core.cigar import path_to_cigar

                q = reads[i]
                if h.strand == "-":
                    from swtpu.core.encode import revcomp

                    q = revcomp(reads[i], int(rlens[i]))
                cid = idx.contig_names.index(h.contig)
                cstart = int(idx.contig_starts[cid])
                tseq = idx.ref[
                    cstart : cstart + int(idx.contig_lens[cid])
                ]
                rec["cigar"] = path_to_cigar(
                    h.path, q, tseq, query_len=int(rlens[i])
                )
        print(json.dumps(rec))


def cmd_pack(args):
    """DNA FASTA <-> 2-bit packed .npz batch container."""
    from swtpu.core.io import (
        decode_dna,
        load_fasta_batch,
        load_packed_batch,
        save_packed_batch,
        write_fasta,
    )

    if args.unpack:
        names, batch, lens = load_packed_batch(args.input)
        write_fasta(
            args.output,
            [
                (n, decode_dna(batch[i, : lens[i]]))
                for i, n in enumerate(names)
            ],
        )
        print(json.dumps(dict(records=len(names), out=args.output)))
        return
    names, batch, lens = load_fasta_batch(args.input, "dna", pad_code=0)
    save_packed_batch(args.output, names, batch, lens)
    import os

    print(
        json.dumps(
            dict(
                records=len(names),
                packed_bytes=os.path.getsize(args.output),
                out=args.output,
            )
        )
    )


def cmd_assemble(args):
    """Greedy overlap-layout-consensus assembly (the reference's intended
    but never-written assembly() consumer, source.cpp:2729-2731)."""
    from swtpu.core.io import decode_dna, load_fasta_batch, write_fasta
    from swtpu.models.assembly import assemble_greedy, make_reads

    rng = np.random.default_rng(args.seed)
    if args.random:
        # GxLxS: random G-mer genome tiled into L-mers every S bases
        G, L, S = (int(x) for x in args.random.split("x"))
        genome = rng.integers(0, 4, size=G).astype(np.uint8)
        reads = make_reads(rng, genome, read_len=L, step=S)
        names = [f"read{i}" for i in range(len(reads))]
    else:
        if not args.reads:
            raise SystemExit("need --reads FASTA or --random GxLxS")
        names, arr, lens = load_fasta_batch(args.reads, "dna", pad_code=4)
        reads = [arr[i][: lens[i]] for i in range(len(arr))]
    contig = assemble_greedy(
        reads, min_overlap=args.min_overlap, slack=args.slack
    )
    if args.out:
        write_fasta(args.out, [("contig", decode_dna(contig))])
    elif not args.sam:
        print(json.dumps(dict(contig_len=len(contig), reads=len(reads))))
        print(">contig")
        print(decode_dna(contig))
    else:
        # --sam keeps stdout pure SAM (pipeable to samtools); the contig
        # itself goes to --out or, failing that, only its summary to
        # stderr below
        print(
            json.dumps(dict(contig_len=len(contig), reads=len(reads))),
            file=sys.stderr,
        )
    if args.random:
        # demo mode: report whether the assembly reproduced the genome
        ok = len(contig) == len(genome) and bool(
            np.array_equal(contig, genome)
        )
        print(
            json.dumps(dict(genome_len=len(genome), reconstructed=ok)),
            file=sys.stderr,
        )
    if args.sam:
        # read placements: local-align every read back to the contig
        from swtpu.batch import sw_align_batch
        from swtpu.core.sam import sam_header, sam_record

        L = max(len(r) for r in reads)
        qs = np.stack(
            [
                np.concatenate(
                    [r, np.full(L - len(r), 4, np.uint8)]
                )
                for r in reads
            ]
        )
        ts = np.broadcast_to(
            contig[None, :], (len(reads), len(contig))
        )
        print(sam_header([("contig", len(contig))]))
        for k, (score, path) in enumerate(
            sw_align_batch(qs, np.ascontiguousarray(ts), _scoring(args))
        ):
            print(
                sam_record(
                    names[k], "contig", qs[k], contig, score, path,
                    "dna", query_len=len(reads[k]),
                )
            )


def cmd_msa(args):
    """Center-star multiple sequence alignment (models/msa.py): batched
    device NW forwards pick the center and align every sequence to it;
    the merged alignment goes to stdout as gapped FASTA."""
    from swtpu.core.io import read_fasta
    from swtpu.models.msa import msa_center_star, msa_rows_to_strings

    if args.random:
        # NxL: N mutation-model descendants of one random L-mer ancestor
        N, L = (int(x) for x in args.random.split("x"))
        rng = np.random.default_rng(args.seed)
        from swtpu.core.encode import mutate

        hi = 4 if args.alphabet == "dna" else 20
        ancestor = rng.integers(0, hi, size=L).astype(np.uint8)
        seqs = [mutate(rng, ancestor) for _ in range(N)]
        names = [f"seq{i}" for i in range(N)]
    else:
        if not args.queries:
            raise SystemExit("need --queries FASTA or --random NxL")
        if args.alphabet == "protein":
            from swtpu.core.protein import encode_protein as enc
        else:
            from swtpu.core.io import encode_dna as enc
        names, seqs = [], []
        for name, s in read_fasta(args.queries):
            names.append(name)
            seqs.append(enc(s))
    if len(seqs) < 2:
        raise SystemExit("msa needs >= 2 sequences")
    params = _scoring(args)
    center = None
    if args.center is not None:
        if args.center not in names:
            raise SystemExit(f"--center {args.center!r} not in inputs")
        center = names.index(args.center)
    res = msa_center_star(seqs, params=params, center=center)
    print(
        json.dumps(
            dict(
                n=len(seqs),
                width=len(res.rows[0]),
                center=names[res.center],
                sp_score=res.sp,
            )
        ),
        file=sys.stderr,
    )
    for name, row in zip(names, msa_rows_to_strings(res.rows, args.alphabet)):
        print(f">{name}")
        print(row)


def cmd_bench(args):
    from swtpu import bench_suite

    sys.argv = ["bench_suite"] + (["--quick"] if args.quick else [])
    bench_suite.main()


def cmd_selftest(args):
    """End-to-end differential checks (oracle vs every engine tier that
    runs on the current backend). One JSON line per check; exits 1 if any
    fails."""
    import jax

    from swtpu.core import random_dna
    from swtpu.core.encode import mutate
    from swtpu.core.scoring import DNA_10_30_15, ScoringParams
    from swtpu.kernels.xla import sw_batch_diag
    from swtpu.oracle import sw_score_batch

    rng = np.random.default_rng(10000)
    qs, ts = random_dna(rng, (32, 128)), random_dna(rng, (32, 128))
    orc = sw_score_batch(qs, ts, DNA_10_30_15)
    checks = []

    dev = np.asarray(sw_batch_diag(qs, ts, DNA_10_30_15))
    checks.append(("xla_vs_oracle", np.array_equal(dev, orc)))

    # global/NW: corner-pinned read-out of the semiglobal scan
    from swtpu.kernels.xla.semiglobal_scan import nw_batch_diag
    from swtpu.oracle import nw_full

    nsc = np.asarray(nw_batch_diag(qs[:8], ts[:8], 2, 1, 1))
    nref = [nw_full(qs[b], ts[b], 2, 1, 1)[0] for b in range(8)]
    checks.append(("nw_vs_oracle", list(nsc) == nref))

    if jax.devices()[0].platform == "tpu":
        from swtpu.core.protein import BLOSUM62
        from swtpu.kernels.pallas import sw_batch_pallas
        from swtpu.kernels.pallas.banded_batch import (
            banded_xdrop_batch_pallas,
        )
        from swtpu.kernels.pallas.sw_affine import sw_affine_pallas
        from swtpu.kernels.pallas.sw_profile import sw_batch_profile_pallas
        from swtpu.kernels.xla.banded_scan import banded_xdrop_batch
        from swtpu.oracle.affine import sw_affine_score_batch

        dev = np.asarray(sw_batch_pallas(qs, ts, DNA_10_30_15))
        checks.append(("rowscan_vs_oracle", np.array_equal(dev, orc)))

        pp = ScoringParams.linear(BLOSUM62, 11)
        pq = rng.integers(0, 24, size=(16, 64)).astype(np.uint8)
        pt = rng.integers(0, 24, size=(16, 64)).astype(np.uint8)
        dev = np.asarray(sw_batch_profile_pallas(pq, pt, pp))
        checks.append(
            (
                "rowscan_prof_blosum62_vs_oracle",
                np.array_equal(dev, sw_score_batch(pq, pt, pp)),
            )
        )

        aff = ScoringParams(
            matrix=DNA_10_30_15.matrix, gap_open=40, gap_extend=15
        )
        dev = np.asarray(sw_affine_pallas(qs, ts, aff))
        checks.append(
            (
                "affine_rowscan_vs_oracle",
                np.array_equal(dev, sw_affine_score_batch(qs, ts, aff)),
            )
        )

        paff = ScoringParams(BLOSUM62, gap_open=11, gap_extend=1)
        dev = np.asarray(sw_batch_profile_pallas(pq, pt, paff))
        checks.append(
            (
                "affine_profile_blosum62_vs_oracle",
                np.array_equal(dev, sw_affine_score_batch(pq, pt, paff)),
            )
        )

        bq = random_dna(rng, (8, 256))
        bt = np.stack([mutate(rng, bq[b]) for b in range(8)])
        ref = banded_xdrop_batch(bq, bt, with_history=False)
        dev = banded_xdrop_batch_pallas(bq, bt, with_history=False)
        checks.append(
            (
                "banded_pallas_vs_xla",
                np.array_equal(ref.score, dev.score)
                and np.array_equal(ref.n_rounds, dev.n_rounds),
            )
        )

        ref = banded_xdrop_batch(
            bq, bt, gap_open=3, gap_extend=1, with_history=False
        )
        dev = banded_xdrop_batch_pallas(
            bq, bt, gap_open=3, gap_extend=1, with_history=False
        )
        checks.append(
            (
                "banded_affine_pallas_vs_xla",
                np.array_equal(ref.score, dev.score)
                and np.array_equal(ref.n_rounds, dev.n_rounds),
            )
        )

        bpq = rng.integers(0, 24, size=(8, 200)).astype(np.uint8)
        bpt = bpq.copy()
        for b in range(8):
            idx = rng.integers(0, 200, 30)
            bpt[b, idx] = rng.integers(0, 24, 30)
        ref = banded_xdrop_batch(
            bpq, bpt, matrix=BLOSUM62, gap_open=11, gap_extend=1,
            x_threshold=120, with_history=False,
        )
        dev = banded_xdrop_batch_pallas(
            bpq, bpt, matrix=BLOSUM62, gap_open=11, gap_extend=1,
            x_threshold=120, with_history=False,
        )
        checks.append(
            (
                "banded_blosum62_pallas_vs_xla",
                np.array_equal(ref.score, dev.score)
                and np.array_equal(ref.n_rounds, dev.n_rounds),
            )
        )
        from swtpu.kernels.pallas.banded_packed import (
            banded_xdrop_batch_packed,
        )

        dev = banded_xdrop_batch_packed(
            bpq, bpt, matrix=BLOSUM62, gap_open=11, gap_extend=1,
            x_threshold=120, with_history=False,
        )
        checks.append(
            (
                "banded_blosum62_packed_vs_xla",
                np.array_equal(ref.score, dev.score)
                and np.array_equal(ref.n_rounds, dev.n_rounds),
            )
        )

        from swtpu.kernels.pallas.semiglobal_profile import (
            semiglobal_batch_profile_pallas,
        )
        from swtpu.kernels.xla.semiglobal_scan import (
            semiglobal_batch_general,
        )

        spq = rng.integers(0, 24, size=(1024, 24)).astype(np.uint8)
        spt = rng.integers(0, 24, size=(1024, 32)).astype(np.uint8)
        dev = tuple(
            np.asarray(x)
            for x in semiglobal_batch_profile_pallas(spq, spt, paff)
        )
        ref3 = tuple(
            np.asarray(x) for x in semiglobal_batch_general(spq, spt, paff)
        )
        checks.append(
            (
                "semiglobal_prof_blosum62_vs_xla",
                all(np.array_equal(a, b) for a, b in zip(dev, ref3)),
            )
        )

        from swtpu.kernels.pallas.sw_banded import sw_banded_static_pallas
        from swtpu.oracle.banded_static import (
            sw_banded_static_score_batch,
        )

        dev = np.asarray(
            sw_banded_static_pallas(bq, bt, DNA_10_30_15, bandwidth=32)
        )
        checks.append(
            (
                "fixed_band_vs_oracle",
                np.array_equal(
                    dev,
                    sw_banded_static_score_batch(
                        bq, bt, DNA_10_30_15, 32
                    ).astype(np.int32),
                ),
            )
        )

        # block-adaptive banded tier (round 4): forward + history + host
        # walk AND the device walker, bit-exact vs the block oracle
        from swtpu.kernels.pallas.banded_block import (
            banded_block_align_device,
            banded_block_batch_pallas,
            banded_block_traceback_host,
        )
        from swtpu.oracle.banded_block import banded_xdrop_block

        res = banded_block_batch_pallas(
            bq, bt, width=64, block=32, with_history=True, with_meta=True
        )
        paths = banded_block_traceback_host(res, bq, bt, block=32)
        ok_blk = True
        for p in range(len(bq)):
            os_, op = banded_xdrop_block(bq[p], bt[p], width=64, block=32)
            ok_blk &= int(res.score[p]) == os_ and paths[p] == op
        checks.append(("banded_block_vs_oracle", bool(ok_blk)))

        dv = banded_block_align_device(bq, bt, width=64, block=32)
        ok_blk = all(
            dv[p] == (int(res.score[p]), paths[p]) for p in range(len(bq))
        )
        checks.append(("banded_block_device_walk_vs_host", bool(ok_blk)))

        # longpair Pallas strip tile (round 5): one hardware tile vs the
        # XLA column-scan tile, every return (boundaries, best, endpoint)
        from swtpu.kernels.pallas.longpair_strip import (
            strip_tile,
            strip_tile_affine,
        )
        from swtpu.kernels.xla.sw_scan import _extended_table
        from swtpu.parallel.longpair import (
            _tile_colscan,
            _tile_colscan_affine,
        )
        import jax.numpy as jnp

        Rs, Cs = 512, 384
        sq = rng.integers(0, 4, Rs)
        st = rng.integers(0, 4, Cs)
        stop = rng.integers(0, 50, Cs)
        sleft = rng.integers(0, 50, Rs)
        scorn = int(rng.integers(0, 50))
        tbl = jnp.asarray(_extended_table(DNA_10_30_15))
        ref_t = _tile_colscan(
            jnp.asarray(sq, jnp.int32), jnp.asarray(st, jnp.int32),
            jnp.asarray(stop, jnp.int32), jnp.asarray(sleft, jnp.int32),
            jnp.asarray(scorn, jnp.int32), tbl, 4, jnp.int32(15),
        )
        got_t = strip_tile(sq, st, stop, sleft, scorn, DNA_10_30_15)
        ok_st = all(
            np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(ref_t, got_t)
        )
        checks.append(("longpair_strip_tile_vs_xla", bool(ok_st)))
        saff = ScoringParams(
            matrix=DNA_10_30_15.matrix, gap_open=40, gap_extend=15
        )
        stopf = rng.integers(-30, 40, Cs)
        slefte = rng.integers(-30, 40, Rs)
        tbla = jnp.asarray(_extended_table(saff))
        ref_t = _tile_colscan_affine(
            jnp.asarray(sq, jnp.int32), jnp.asarray(st, jnp.int32),
            jnp.asarray(stop, jnp.int32), jnp.asarray(stopf, jnp.int32),
            jnp.asarray(sleft, jnp.int32), jnp.asarray(slefte, jnp.int32),
            jnp.asarray(scorn, jnp.int32), tbla, 4,
            jnp.int32(40), jnp.int32(15),
        )
        got_t = strip_tile_affine(
            sq, st, stop, stopf, sleft, slefte, scorn, saff
        )
        ok_st = all(
            np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(ref_t, got_t)
        )
        checks.append(("longpair_strip_affine_tile_vs_xla", bool(ok_st)))

        # endpoint kernels (score, end_i, end_j) vs the XLA ends anchor
        from swtpu.kernels.pallas.sw_batch import sw_batch_pallas_ends
        from swtpu.kernels.pallas.sw_affine import sw_affine_pallas_ends
        from swtpu.kernels.pallas.sw_profile import (
            sw_batch_profile_pallas_ends,
        )
        from swtpu.kernels.xla.sw_scan import sw_batch_diag_ends
        from swtpu.kernels.xla.affine_scan import sw_affine_batch_diag_ends

        tie = ScoringParams.linear(
            np.where(np.eye(4, dtype=bool), 2, -1).astype(np.int32), 1
        )
        dev = tuple(np.asarray(x) for x in sw_batch_pallas_ends(qs, ts, tie))
        ref3 = tuple(np.asarray(x) for x in sw_batch_diag_ends(qs, ts, tie))
        checks.append(
            (
                "rowscan_ends_vs_xla",
                all(np.array_equal(a, b) for a, b in zip(dev, ref3)),
            )
        )
        taff = ScoringParams(tie.matrix, gap_open=3, gap_extend=1)
        dev = tuple(
            np.asarray(x) for x in sw_affine_pallas_ends(qs, ts, taff)
        )
        ref3 = tuple(
            np.asarray(x) for x in sw_affine_batch_diag_ends(qs, ts, taff)
        )
        checks.append(
            (
                "affine_rowscan_ends_vs_xla",
                all(np.array_equal(a, b) for a, b in zip(dev, ref3)),
            )
        )
        dev = tuple(
            np.asarray(x) for x in sw_batch_profile_pallas_ends(pq, pt, paff)
        )
        ref3 = tuple(
            np.asarray(x)
            for x in sw_affine_batch_diag_ends(pq, pt, paff)
        )
        checks.append(
            (
                "profile_ends_blosum62_vs_xla",
                all(np.array_equal(a, b) for a, b in zip(dev, ref3)),
            )
        )

        # Karlin-Altschul calibration: fit (lambda, K) for the standard
        # protein config on the device engine and compare to NCBI's own
        # simulation-fitted preset (0.267 / 0.041). At 256x256 the
        # finite-size bias is ~2% on lambda (see core/stats.py).
        from swtpu.core.stats import calibrate_stats

        ka = calibrate_stats(
            paff, "protein", m=256, pairs=4096, seed=10000, chunk=4096
        )
        checks.append(
            (
                "ka_calibration_vs_ncbi_preset",
                abs(ka.lam - 0.267) < 0.267 * 0.12
                and 0.015 < ka.K < 0.12,
            )
        )

    # reference-scale geometry: one 16384-mer mutation pair end to end
    # (SemiGlobal_111's shape, source.cpp:1776-1834) — device banded
    # forward + host walk, cross-checked against the scalar banded oracle
    from swtpu.batch import banded_align_batch
    from swtpu.oracle import banded_xdrop

    q16 = random_dna(rng, (1, 16384))
    t16 = np.stack([mutate(rng, q16[0], out_len=16384)])
    out16 = banded_align_batch(q16, t16, [16384], [16384])
    s16, p16 = banded_xdrop(q16[0], t16[0])
    checks.append(
        ("banded_16k_e2e_vs_scalar_oracle", out16[0] == (s16, p16))
    )

    # center-star MSA: degap + the exact projection invariant (the
    # MSA's (center, k) column score equals the device NW score)
    from swtpu.models.msa import GAP, msa_center_star

    manc = random_dna(rng, (1, 96))[0]
    mseqs = [mutate(rng, manc) for _ in range(6)]
    mres = msa_center_star(mseqs, match=2, mismatch=3, gap=2)
    ok_msa = all(
        np.array_equal(r[r != GAP].astype(np.uint8), s)
        for r, s in zip(mres.rows, mseqs)
    )
    for k in range(len(mseqs)):
        if k == mres.center:
            continue
        ra, rb = mres.rows[mres.center], mres.rows[k]
        keep = ~((ra == GAP) & (rb == GAP))
        a, b = ra[keep], rb[keep]
        both = (a != GAP) & (b != GAP)
        proj = int(
            np.where(a[both] == b[both], 2, -3).sum()
        ) - 2 * int(((a != GAP) ^ (b != GAP)).sum())
        ok_msa &= proj == mres.scores[k]
    checks.append(("msa_center_star_projection", ok_msa))

    # short soak: one round of every fuzz family (the full harness is
    # `python -m swtpu fuzz`; reference-scale soaks are source.cpp:2943+)
    from swtpu.fuzz import run_fuzz

    try:
        run_fuzz(minutes=30, max_rounds=10, log=None, save_dir=None,
                 pairs_per_round=256)
        checks.append(("fuzz_soak_short", True))
    except AssertionError:
        checks.append(("fuzz_soak_short", False))

    ok_all = True
    for name, ok in checks:
        ok = bool(ok)
        ok_all &= ok
        print(json.dumps(dict(selftest=name, ok=ok)))
    if not ok_all:
        raise SystemExit(1)


def cmd_fuzz(args):
    """Soak-scale randomized differential testing (swtpu.fuzz)."""
    from swtpu.fuzz import run_fuzz

    families = args.families.split(",") if args.families else None
    use_pallas = None
    if args.interpret:
        import jax
        from jax.experimental.pallas import tpu as pltpu

        if jax.devices()[0].platform != "tpu":
            with pltpu.force_tpu_interpret_mode():
                run_fuzz(
                    minutes=args.minutes, seed=args.seed,
                    pairs_per_round=args.pairs, families=families,
                    use_pallas=True, save_dir=args.save_dir,
                    max_rounds=args.rounds,
                )
            return
        use_pallas = True
    run_fuzz(
        minutes=args.minutes, seed=args.seed, pairs_per_round=args.pairs,
        families=families, use_pallas=use_pallas, save_dir=args.save_dir,
        max_rounds=args.rounds,
    )


def build_parser():
    ap = argparse.ArgumentParser(prog="swtpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    def common(p):
        p.add_argument("--queries", help="FASTA of query sequences")
        p.add_argument("--targets", help="FASTA of target sequences")
        p.add_argument(
            "--random",
            help="BxNxM: generate B random pairs of lengths N, M",
        )
        p.add_argument("--seed", type=int, default=10000)
        p.add_argument(
            "--alphabet", choices=["dna", "protein"], default="dna"
        )
        p.add_argument(
            "--scoring",
            default="1,-1",
            help="match,mismatch (DNA; protein uses BLOSUM62)",
        )
        p.add_argument("--gap", type=int, default=1)
        p.add_argument("--gap-open", type=int, default=None)
        p.add_argument("--gap-extend", type=int, default=1)
        p.add_argument("--traceback", action="store_true")
        p.add_argument(
            "--cigar",
            action="store_true",
            help="emit a SAM-style extended CIGAR (=/X/I/D, soft clips "
            "for local alignments) derived from the traceback path",
        )
        p.add_argument(
            "--sam",
            action="store_true",
            help="emit full SAM 1.6 records (header + one line per pair, "
            "AS/NM tags) instead of JSON; implies traceback",
        )

    p = sub.add_parser("align", help="local (Smith-Waterman) alignment")
    common(p)
    p.add_argument(
        "--engine",
        default="xla_diag",
        help="kernel variant (oracle|xla_diag|wavefront|colscan|rowscan|"
        "rowscan_prof|rowscan_bf16); unsupported params fall back to the "
        "XLA engine",
    )
    p.set_defaults(fn=cmd_align)

    p = sub.add_parser("semiglobal", help="semi-global alignment")
    common(p)
    p.set_defaults(fn=cmd_semiglobal)

    p = sub.add_parser(
        "global",
        help="global (Needleman-Wunsch) alignment — the semi-global "
        "forward pass with the endpoint pinned at each pair's corner",
    )
    common(p)
    p.set_defaults(fn=lambda args: cmd_semiglobal(args, pin_end=True))

    p = sub.add_parser("banded", help="adaptive-banded X-drop semi-global")
    common(p)
    p.add_argument("--bandwidth", type=int, default=32)
    p.add_argument("--x-drop", type=int, default=70)
    p.add_argument(
        "--fixed",
        action="store_true",
        help="fixed diagonal corridor |i-j| <= bandwidth (local SW, "
        "score-only, issue-bound engine)",
    )
    p.add_argument(
        "--block-adaptive",
        action="store_true",
        help="the round-4 block-adaptive tier (TPU, uniform lengths): "
        "corridor width 2*bandwidth re-centered per bandwidth-row "
        "block — ~8-25x the per-round tier's throughput; scores follow "
        "oracle/banded_block.py, not the per-round X-drop contract",
    )
    p.set_defaults(fn=cmd_banded)

    p = sub.add_parser(
        "longpair", help="one long pair, sequence-parallel over the mesh"
    )
    common(p)
    p.add_argument(
        "--block", type=int, default=None,
        help="column-block width (default: auto — the step-count-optimal "
        "divisor of the trimmed target length)",
    )
    p.add_argument(
        "--devices", type=int, default=None,
        help="mesh size (default: all local devices)",
    )
    p.set_defaults(fn=cmd_longpair)

    p = sub.add_parser("search", help="all-vs-all top-k database search")
    common(p)
    p.add_argument("--topk", type=int, default=10)
    p.add_argument("--chunk", type=int, default=1024)
    p.add_argument("--checkpoint", help="resume cursor .npz path")
    p.add_argument("--verbose", action="store_true")
    p.add_argument(
        "--tsv",
        action="store_true",
        help="BLAST outfmt-6-style tabular hits (qname tname pident "
        "alnlen mismatches gapopens qstart qend tstart tend score), "
        "computed from a batched traceback of every hit",
    )
    p.add_argument(
        "--both-strands",
        action="store_true",
        help="DNA only: also search the reverse complement of every "
        "query; hits carry a strand (+/-; SAM FLAG 16), merged "
        "deterministically (score desc, id asc, '+' first)",
    )
    p.add_argument(
        "--stats",
        choices=["none", "auto", "preset", "calibrate"],
        default="none",
        help="Karlin-Altschul significance layer: --tsv emits the "
        "standard evalue/bitscore columns (full BLAST outfmt 6). "
        "preset = NCBI tabulated parameters (BLOSUM62 + gap 11/1); "
        "calibrate = fit (lambda, K) for the EXACT scoring in use by "
        "aligning random background pairs on the device engine (the "
        "methodology behind BLAST's own gapped tables); auto = preset "
        "when tabulated, else calibrate",
    )
    p.add_argument(
        "--calibrate-pairs",
        type=int,
        default=8192,
        help="random pairs scored by --stats calibrate (default 8192)",
    )
    p.add_argument(
        "--evalue-max",
        type=float,
        default=None,
        help="with --stats: drop hits whose E-value exceeds this",
    )
    p.set_defaults(fn=cmd_search)

    p = sub.add_parser(
        "map",
        help="seed-and-extend read mapping: k-mer seeds + batched "
        "adaptive-banded X-drop glocal extension on device",
    )
    p.add_argument("--reads", help="FASTA of reads (DNA)")
    p.add_argument("--ref", help="FASTA of reference contigs")
    p.add_argument(
        "--random",
        metavar="GxRxL",
        help="demo: random G-mer genome, R mutation-model reads of "
        "length L; reports how many map back to their true locus",
    )
    p.add_argument("--seed", type=int, default=10000)
    p.add_argument(
        "--k", type=int, default=None,
        help="seed k-mer size (default 13; 9 for the --random demo, "
        "whose mutation-model reads are only ~70%% identity)",
    )
    p.add_argument("--min-seeds", type=int, default=2)
    p.add_argument(
        "--max-occ", type=int, default=64,
        help="ignore k-mers occurring more often than this (repeats)",
    )
    p.add_argument("--max-loci", type=int, default=8)
    p.add_argument("--match", type=int, default=1)
    p.add_argument(
        "--mismatch", type=int, default=1, help="penalty (positive)"
    )
    p.add_argument("--gap", type=int, default=1, help="penalty (positive)")
    p.add_argument("--gap-open", type=int, default=None)
    p.add_argument("--gap-extend", type=int, default=1)
    p.add_argument("--bandwidth", type=int, default=32)
    p.add_argument("--x-drop", type=int, default=70)
    p.add_argument("--min-score", type=int, default=20)
    p.add_argument("--both-strands", action="store_true")
    p.add_argument("--traceback", action="store_true")
    p.add_argument("--cigar", action="store_true")
    p.add_argument("--sam", action="store_true")
    p.set_defaults(fn=cmd_map)

    p = sub.add_parser(
        "assemble",
        help="greedy overlap-layout-consensus assembly (the reference's "
        "empty assembly() stub, implemented)",
    )
    p.add_argument("--reads", help="FASTA of reads")
    p.add_argument(
        "--random",
        metavar="GxLxS",
        help="demo: random G-mer genome tiled into L-mer reads every S "
        "bases (reports whether the contig reconstructs the genome)",
    )
    p.add_argument("--seed", type=int, default=10000)
    p.add_argument("--min-overlap", type=int, default=20)
    p.add_argument(
        "--slack", type=int, default=0,
        help="error tolerance: overlap endpoints may miss the read ends "
        "by up to this many bases and the consensus majority-votes "
        "substitution errors out (0 = exact suffix-prefix splice)",
    )
    p.add_argument("--out", help="write the contig FASTA here")
    p.add_argument(
        "--sam",
        action="store_true",
        help="also emit SAM placements of every read on the contig",
    )
    p.add_argument(
        "--scoring", default="1,-1", help="match,mismatch for --sam"
    )
    p.add_argument("--gap", type=int, default=1)
    p.add_argument("--gap-open", type=int, default=None)
    p.add_argument("--gap-extend", type=int, default=1)
    p.add_argument(
        "--alphabet", choices=["dna"], default="dna", help=argparse.SUPPRESS
    )
    p.set_defaults(fn=cmd_assemble)

    p = sub.add_parser(
        "msa",
        help="center-star multiple sequence alignment on the batched "
        "NW engine (gapped FASTA to stdout)",
    )
    p.add_argument("--queries", help="FASTA of sequences to align")
    p.add_argument(
        "--random",
        metavar="NxL",
        help="demo: N mutation-model descendants of one random L-mer",
    )
    p.add_argument("--seed", type=int, default=10000)
    p.add_argument(
        "--alphabet", choices=["dna", "protein"], default="dna"
    )
    p.add_argument(
        "--scoring", default="1,-1",
        help="match,mismatch (DNA; protein uses BLOSUM62)",
    )
    p.add_argument("--gap", type=int, default=1)
    p.add_argument("--gap-open", type=int, default=None)
    p.add_argument("--gap-extend", type=int, default=1)
    p.add_argument(
        "--center",
        help="star around this named sequence instead of the "
        "max-total-similarity pick",
    )
    p.set_defaults(fn=cmd_msa)

    p = sub.add_parser(
        "pack",
        help="convert DNA FASTA to/from the 2-bit packed .npz container "
        "(≙ the reference's packed format, source.cpp:1580-1583; "
        "align/search/map accept .npz inputs directly)",
    )
    p.add_argument("input", help="FASTA (or .npz with --unpack)")
    p.add_argument("output", help=".npz out (or FASTA with --unpack)")
    p.add_argument(
        "--unpack", action="store_true", help=".npz -> FASTA instead"
    )
    p.set_defaults(fn=cmd_pack)

    p = sub.add_parser("bench", help="benchmark suite")
    p.add_argument("--quick", action="store_true")
    p.set_defaults(fn=cmd_bench)

    p = sub.add_parser("selftest", help="quick differential self-check")
    p.set_defaults(fn=cmd_selftest)

    p = sub.add_parser(
        "fuzz",
        help="soak-scale randomized differential testing (the reference's "
        "10M-iteration harness pattern, time-bounded)",
    )
    p.add_argument("--minutes", type=float, default=1.0)
    p.add_argument("--rounds", type=int, default=None,
                   help="stop after N rounds (default: time-bounded only)")
    p.add_argument("--seed", type=int, default=10000)
    p.add_argument("--pairs", type=int, default=512,
                   help="pairs per round")
    p.add_argument("--families", default=None,
                   help="comma list: uniform,tie_rich,general4,affine,"
                   "protein,semiglobal,banded,fixed_band,search,cigar")
    p.add_argument("--save-dir", default="fuzz_failures",
                   help="where to write .npz repros on mismatch")
    p.add_argument("--interpret", action="store_true",
                   help="on CPU: also run the Pallas tiers in interpret "
                   "mode (slow)")
    p.set_defaults(fn=cmd_fuzz)
    return ap


def main(argv=None):
    args = build_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
