"""Seed-and-extend read mapping on the banded X-drop engine.

The reference builds an adaptive-banded X-drop kernel family and a
mutation-model test generator (source.cpp:1836-2725, 2750-2771) — the
components of a read mapper — but never assembles them into one (its
`assembly` driver is an empty stub, source.cpp:2729-2731). This module is
that assembly for the mapping use case, the standard seed-and-extend
pipeline (BLAST/minimap lineage) built TPU-first:

1. **Index** (host): sorted k-mer table over the reference — positions
   argsorted by k-mer code, queried by binary search. Multi-contig
   references are concatenated with runs of the target pad code (5) so no
   k-mer spans a boundary and extensions die at -mismatch/matrix.min()
   per column ("pads can only lose").
2. **Seed** (host, fully vectorized numpy): every read k-mer is looked
   up; hits become (read, diagonal, position) triples; repetitive k-mers
   above --max-occ are dropped (the minimap practice). Seeds are
   clustered by quantized diagonal (adjacent buckets merged) and clusters
   with >= min_seeds become candidate loci.
3. **Extend** (device, batched): every candidate locus is one glocal
   alignment — the read vs a fixed-width reference window anchored at the
   cluster's minimum diagonal — through the adaptive-banded X-drop
   forward (`with_history=False`: scores only, nothing big crosses the
   host link). One batched call scores ALL loci of ALL reads.
4. **Traceback** (survivors only): the winning locus per read re-runs
   through `banded_align_batch` (device forward + band-history host
   walk) when a path/CIGAR is requested; path coordinates are shifted
   back to reference space.

Candidate windows have ONE static shape (read_width + 2*bandwidth), so
the whole pipeline compiles exactly one extension executable per
configuration — XLA-friendly by construction.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

#: Reference separator/pad: the DNA target pad code (pads can only lose).
REF_PAD = 5


# ---------------------------------------------------------------------------
# 1. Index


@dataclasses.dataclass
class KmerIndex:
    """Sorted k-mer table over a (concatenated) reference."""

    k: int
    ref: np.ndarray  # [N] uint8 concatenated reference (REF_PAD separators)
    codes: np.ndarray  # [P] int64 k-mer codes, sorted
    #: [P] positions ordered by code — int32 (half the random-access
    #: footprint; seeding is DRAM-latency bound) unless the reference
    #: exceeds int32 range
    pos: np.ndarray
    contig_starts: np.ndarray  # [C] int64 offset of each contig in ref
    contig_names: List[str]
    contig_lens: np.ndarray  # [C] int64
    #: direct-addressed int32 CSR row starts ([4^k + 1]) when 4^k is
    #: small (k <= 11): O(1) lookups instead of binary search
    starts: Optional[np.ndarray] = None
    #: 2-bit packed ref (len rounded to %4; separators/pads pack as base
    #: 0 — see ref_sepmask): the extension stage gathers packed window
    #: BYTES and decodes on device, 4x less ingress traffic
    ref_packed: Optional[np.ndarray] = None
    #: 1 bit per char (little-endian), set where ref holds a separator/
    #: pad (> 3): the device restores T_PAD at masked positions so
    #: packed windows keep the exact "pads can only lose" semantics
    #: across contig boundaries
    ref_sepmask: Optional[np.ndarray] = None

    def locate(self, ref_pos: np.ndarray):
        """Map concatenated positions -> (contig_id, local_pos)."""
        p = np.asarray(ref_pos, dtype=np.int64)
        cid = np.searchsorted(self.contig_starts, p, side="right") - 1
        return cid, p - self.contig_starts[cid]


def _kmer_codes(rows: np.ndarray, k: int) -> np.ndarray:
    """[.., L] uint8 -> [.., L-k+1] int64 base-4 codes; windows containing
    any char >= 4 (pads/separators) get code -1."""
    rows = np.asarray(rows)
    L = rows.shape[-1]
    n = L - k + 1
    if n <= 0:
        return np.full(rows.shape[:-1] + (0,), -1, dtype=np.int64)
    codes = np.zeros(rows.shape[:-1] + (n,), dtype=np.int64)
    bad = np.zeros(rows.shape[:-1] + (n,), dtype=bool)
    for j in range(k):
        c = rows[..., j : j + n].astype(np.int64)
        codes = (codes << 2) | (c & 3)
        bad |= c >= 4
    return np.where(bad, -1, codes)


def build_index(
    contigs: Sequence[np.ndarray],
    names: Optional[Sequence[str]] = None,
    k: int = 13,
    lens: Optional[Sequence[int]] = None,
) -> KmerIndex:
    """Build the sorted k-mer table. `contigs` are uint8 code arrays
    (0..3); `lens` trims padded rows (e.g. from load_fasta_batch)."""
    names = (
        list(names)
        if names is not None
        else [f"contig{i}" for i in range(len(contigs))]
    )
    sep = np.full(k, REF_PAD, dtype=np.uint8)
    parts, starts, clens = [], [], []
    off = 0
    for i, c in enumerate(contigs):
        c = np.asarray(c, dtype=np.uint8)
        if lens is not None:
            c = c[: int(lens[i])]
        starts.append(off)
        clens.append(len(c))
        parts.append(c)
        parts.append(sep)
        off += len(c) + k
    ref = np.concatenate(parts) if parts else np.zeros(0, np.uint8)
    codes = _kmer_codes(ref, k)
    valid = np.nonzero(codes >= 0)[0]
    order = valid[np.argsort(codes[valid], kind="stable")]
    sorted_codes = codes[order]
    csr = None
    small = len(ref) < 2**31 - 1 and len(order) < 2**31 - 1
    if k <= 11:  # 4^11 + 1 entries = 16 MB of int32
        counts = np.bincount(sorted_codes, minlength=4**k)
        csr = np.concatenate(
            [[0], np.cumsum(counts, dtype=np.int64)]
        )
        csr = csr.astype(np.int32) if small else csr
    from swtpu.core.encode import pack_2bit

    pad8 = (-len(ref)) % 8
    ref8 = np.pad(ref, (0, pad8), constant_values=REF_PAD)
    return KmerIndex(
        k=k,
        ref=ref,
        codes=sorted_codes,
        pos=order.astype(np.int32 if small else np.int64),
        contig_starts=np.asarray(starts, dtype=np.int64),
        contig_names=names,
        contig_lens=np.asarray(clens, dtype=np.int64),
        starts=csr,
        ref_packed=pack_2bit(np.where(ref8 > 3, 0, ref8)),
        ref_sepmask=np.packbits(ref8 > 3, bitorder="little"),
    )


# ---------------------------------------------------------------------------
# 2. Seeding


@dataclasses.dataclass
class Candidates:
    """Candidate loci: one row per (read, reference window) to extend."""

    read: np.ndarray  # [C] int64 read row index
    tstart: np.ndarray  # [C] int64 window start in the concatenated ref
    n_seeds: np.ndarray  # [C] int64 seeds supporting the cluster


def find_candidates(
    index: KmerIndex,
    reads: np.ndarray,
    lens: Optional[np.ndarray] = None,
    min_seeds: int = 2,
    max_occ: int = 64,
    max_loci: int = 8,
    diag_window: Optional[int] = None,
) -> Candidates:
    """Vectorized seeding: k-mer lookups -> (read, diag) clusters.

    Diagonals (tpos - qpos) are quantized to `diag_window` buckets
    (default: the extension bandwidth, 32); adjacent buckets of one read
    merge into one cluster, so an alignment straddling a bucket boundary
    is never lost. Clusters need >= min_seeds seeds; each read keeps its
    top `max_loci` clusters by seed count. The cluster anchor is the
    diagonal of its EARLIEST seed (minimum qpos): the banded extension
    is origin-anchored, so the window origin must sit at the read
    start's diagonal, and indel drift before the first seed is the only
    unaccounted offset (absorbed by the margin in `extend` + the band)."""
    from swtpu import native

    reads = np.asarray(reads, dtype=np.uint8)
    R, L = reads.shape
    dw = 32 if diag_window is None else int(diag_window)
    qcodes = _kmer_codes(reads, index.k)  # [R, n]
    n = qcodes.shape[1]
    if lens is not None:
        lens = np.asarray(lens)
        qpos_grid = np.arange(n)[None, :]
        in_len = qpos_grid <= (lens[:, None] - index.k)
        qcodes = np.where(in_len, qcodes, -1)
    if (
        index.starts is not None
        and native.available()
        and n > 0
        and index.pos.dtype == np.int32
        and index.starts.dtype == np.int32
    ):
        # C++ seeding twin (bit-equal, OpenMP across reads): the numpy
        # path below is the reference implementation and stays the
        # differential-test anchor (test_mapper.py)
        read, anchor, nseeds = native.seed_candidates(
            qcodes, index.starts, index.pos, L, dw, max_occ, min_seeds,
            max_loci,
        )
        return Candidates(read=read, tstart=anchor, n_seeds=nseeds)
    rid, qpos = np.nonzero(qcodes >= 0)
    flat = qcodes[rid, qpos]
    if index.starts is not None:  # O(1) direct-addressed lookup
        lo = index.starts[flat]
        occ = index.starts[flat + 1] - lo
    else:
        lo = np.searchsorted(index.codes, flat, side="left")
        occ = np.searchsorted(index.codes, flat, side="right") - lo
    keep = (occ > 0) & (occ <= max_occ)
    rid, qpos, lo, occ = rid[keep], qpos[keep], lo[keep], occ[keep]
    if len(rid) == 0:
        z = np.zeros(0, dtype=np.int64)
        return Candidates(read=z, tstart=z.copy(), n_seeds=z.copy())
    total = int(occ.sum())
    # expand [lo, lo+occ) ranges without a Python loop
    ends = np.cumsum(occ, dtype=np.int64)
    within = np.arange(total) - np.repeat(ends - occ, occ)
    tpos = index.pos[np.repeat(lo, occ) + within]
    h_rid = np.repeat(rid, occ)
    h_qpos = np.repeat(qpos, occ)
    diag = tpos - h_qpos  # can be negative near contig starts
    # cluster on (read, diag bucket); bucket ids made non-negative
    bucket = (diag + L) // dw
    key = h_rid * np.int64(2**40) + bucket
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    # per-seed packed (qpos, diag) so a min reduction yields the diagonal
    # of the earliest seed; diag + L >= 0 keeps the low field non-negative
    packed = (h_qpos[order] << np.int64(32)) | (diag[order] + L)
    # key_s is already sorted: derive run starts directly (np.unique
    # would sort a second time)
    first = np.concatenate([[0], np.nonzero(np.diff(key_s))[0] + 1])
    uniq = key_s[first]
    counts = np.diff(np.append(first, len(key_s)))
    pmin = np.minimum.reduceat(packed, first)
    # merge runs of adjacent buckets (same read, consecutive bucket ids);
    # reduceat over run starts (ufunc.at is orders slower at this size)
    new_cluster = np.ones(len(uniq), dtype=bool)
    new_cluster[1:] = np.diff(uniq) != 1
    firsts = np.nonzero(new_cluster)[0]
    cl_counts = np.add.reduceat(counts, firsts)
    cl_pmin = np.minimum.reduceat(pmin, firsts)
    cl_anchor = (cl_pmin & np.int64(2**32 - 1)) - L
    cl_read = (uniq[firsts] // np.int64(2**40)).astype(np.int64)
    ok = cl_counts >= min_seeds
    cl_read, cl_anchor, cl_counts = (
        cl_read[ok], cl_anchor[ok], cl_counts[ok],
    )
    # top max_loci clusters per read, sorted by (read, -count, anchor);
    # clusters far below the read's best (< top/3 seeds) are random
    # k-mer noise on a big reference — drop them rather than extend them
    order = np.lexsort((cl_anchor, -cl_counts, cl_read))
    cl_read, cl_anchor, cl_counts = (
        cl_read[order], cl_anchor[order], cl_counts[order],
    )
    grp0 = np.searchsorted(cl_read, cl_read, side="left")
    rank = np.arange(len(cl_read)) - grp0
    ok = (rank < max_loci) & (
        cl_counts >= np.maximum(min_seeds, cl_counts[grp0] // 3)
    )
    return Candidates(
        read=cl_read[ok],
        tstart=cl_anchor[ok],  # earliest-seed diagonal; margin in extend
        n_seeds=cl_counts[ok],
    )


# ---------------------------------------------------------------------------
# 3. Extension


def _banded_scores(qs, ts, lens_q, lens_t, **kw):
    """Adaptive-banded X-drop forward, scores only, best tier for the
    backend (the tiering mirrors batch.traceback.banded_align_batch)."""
    import jax

    from swtpu.kernels.xla.banded_scan import banded_xdrop_batch

    forward = banded_xdrop_batch
    bandwidth = kw.get("bandwidth", 32)
    if jax.devices()[0].platform == "tpu":
        if bandwidth in (32, 64):
            from swtpu.kernels.pallas.banded_packed import (
                banded_xdrop_batch_packed as forward,
            )
        elif bandwidth <= 96:
            from swtpu.kernels.pallas.banded_batch import (
                banded_xdrop_batch_pallas as forward,
            )
    res = forward(qs, ts, lens_q, lens_t, with_history=False, **kw)
    return np.asarray(res.score)


def _fixed_scores(
    qs, ts, lens_q, lens_t, match, mismatch, gap, gap_open, gap_extend,
    bandwidth, matrix,
):
    """Fixed-corridor (|i - j| <= W) local scores for the extension stage.

    The candidate windows are origin-anchored static corridors — exactly
    the fixed-band kernel's contract — and that kernel is issue-bound
    (~220+ band GCUPS) where the adaptive tier is permute-bound, so the
    screening stage runs ~10x faster here. Scores follow
    swtpu.oracle.banded_static (local, zero-floored), not the X-drop
    glocal contract; winners that need paths are re-scored through the
    adaptive engine (map_reads' traceback branch), which keeps reported
    hit+path scores on the X-drop contract."""
    import jax

    from swtpu.core.scoring import ScoringParams, dna_matrix

    go = int(gap_open) if gap_open is not None else int(gap)
    ge = int(gap_extend) if gap_open is not None else int(gap)
    if matrix is None:
        params = ScoringParams(dna_matrix(match, -mismatch), go, ge)
    else:
        params = ScoringParams(np.asarray(matrix), go, ge)
    if jax.devices()[0].platform == "tpu":
        from swtpu.kernels.pallas.sw_batch import _uniform_match_mismatch
        from swtpu.kernels.pallas.sw_banded import (
            sw_banded_profile_pallas,
            sw_banded_static_pallas,
        )

        fwd = (
            sw_banded_static_pallas
            if _uniform_match_mismatch(params) is not None
            else sw_banded_profile_pallas
        )
        return np.asarray(
            fwd(qs, ts, params, bandwidth, lens_q=lens_q, lens_t=lens_t)
        )
    # CPU: the exact scalar oracle on a pad-extended matrix (window
    # separators carry code A+1; pads can only lose)
    from swtpu.oracle.banded_static import sw_banded_static_score

    A = params.alphabet_size
    ext = np.full((A + 2, A + 2), int(params.matrix.min()), np.int32)
    ext[:A, :A] = params.matrix
    pe = ScoringParams(ext, go, ge)
    return np.array(
        [
            sw_banded_static_score(
                qs[b, : lens_q[b]], ts[b, : lens_t[b]], pe, bandwidth
            )
            for b in range(len(qs))
        ],
        np.int64,
    )


_FIXED_PACKED_CACHE: dict = {}


def _fixed_scores_packed(
    qbytes, wbytes, mbytes, lens_q, lens_t, params, bandwidth, n, m
):
    """Fixed-corridor scores from the 2-bit wire: the host ships packed
    read bytes, packed window bytes, and the windows' separator bitmask;
    the device decodes, restores T_PAD at separator positions, applies
    lengths and runs the fixed-band kernel — all in one jit. The wire is
    ~4x smaller than raw codes (the tunnel ingress is the extension
    stage's bottleneck at mapper batch sizes)."""
    import jax
    import jax.numpy as jnp

    from swtpu.kernels.pallas.sw_banded import (
        sw_banded_profile_pallas,
        sw_banded_static_pallas,
    )
    from swtpu.kernels.pallas.sw_batch import _uniform_match_mismatch
    from swtpu.kernels.xla.unpack import unpack_2bit_device
    from swtpu.ops.variants import cached_build

    fwd = (
        sw_banded_static_pallas
        if _uniform_match_mismatch(params) is not None
        else sw_banded_profile_pallas
    )
    t_pad = params.alphabet_size + 1
    key = (
        params.matrix.tobytes(), params.gap_open, params.gap_extend,
        int(bandwidth), n, m, fwd.__name__,
    )

    def build():
        @jax.jit
        def run(qb, wb, mb, lq, lt):
            qs = unpack_2bit_device(qb)[:, :n]
            ts = unpack_2bit_device(wb)[:, :m]
            bits = (
                mb[:, :, None] >> jnp.arange(8, dtype=jnp.uint8)
            ) & 1
            sep = bits.reshape(mb.shape[0], -1)[:, :m]
            ts = jnp.where(sep == 1, jnp.uint8(t_pad), ts)
            return fwd(
                qs, ts, params, bandwidth, lens_q=lq, lens_t=lt
            )

        return run

    return cached_build(_FIXED_PACKED_CACHE, key, build)(
        qbytes, wbytes, mbytes, lens_q, lens_t
    )


@dataclasses.dataclass
class MapHit:
    read: int
    contig: str
    #: 0-based alignment start on the contig: the extension window origin,
    #: refined to the first aligned column when a path was requested
    pos: int
    score: int
    strand: str = "+"
    n_seeds: int = 0
    path: Optional[List[Tuple[int, int]]] = None  # read/contig coords, 1-based
    #: window origin in the concatenated reference (debug/parity checks)
    window_start: int = 0


def _window_geometry(read_width: int, bandwidth: int):
    """(margin, window_len): the extension is origin-anchored, so the
    window origin sits exactly ON the anchor diagonal (margin 0: a left
    margin would cost margin*gap of leading target-gap on every hit);
    drift before the earliest seed is charged its own indel cost and
    absorbed by the band. The window spans the read plus band drift."""
    return 0, read_width + 2 * bandwidth


def extend_candidates(
    index: KmerIndex,
    reads: np.ndarray,
    lens: np.ndarray,
    cands: Candidates,
    match: int = 1,
    mismatch: int = 1,
    gap: int = 1,
    gap_open: Optional[int] = None,
    gap_extend: Optional[int] = None,
    bandwidth: int = 32,
    x_threshold: int = 70,
    matrix: Optional[np.ndarray] = None,
    extend: str = "auto",
) -> Tuple[np.ndarray, np.ndarray]:
    """Score every candidate locus in ONE batched device call.

    ``extend`` picks the screening engine: "fixed" = the issue-bound
    fixed-corridor kernel (scores per swtpu.oracle.banded_static; on
    TPU it auto-upgrades to the 2-bit packed wire for pure-ACGT reads,
    with the index's separator bitmask restoring exact pad semantics),
    "fixed-packed" = force the packed wire (tests), "adaptive" = the
    banded X-drop tier (scores per the X-drop oracle), "auto" = fixed
    on TPU, adaptive elsewhere (the fixed path's exact CPU fallback is
    the scalar oracle — fine for tests, slow at scale).

    Returns (scores [C], tstart [C]) — tstart is the window origin the
    path coordinates are relative to (8-aligned on the packed wire)."""
    import jax

    reads = np.asarray(reads, dtype=np.uint8)
    R, L = reads.shape
    margin, Lw = _window_geometry(L, bandwidth)
    tstart = np.clip(cands.tstart - margin, 0, max(len(index.ref) - 1, 0))
    if extend == "auto":
        extend = (
            "fixed" if jax.devices()[0].platform == "tpu" else "adaptive"
        )
    C = len(cands.read)
    if C == 0:
        return np.zeros(0, np.int32), tstart
    lq = np.asarray(lens)[cands.read]
    # 2-bit wire only carries A/C/G/T: reads with in-length ambiguity
    # codes route through the raw wire (they score as mismatches there)
    ambig = bool(
        (
            (reads > 3)
            & (np.arange(L)[None, :] < np.asarray(lens)[:, None])
        ).any()
    )
    use_packed_wire = extend == "fixed-packed" or (
        extend == "fixed"
        and not ambig
        and index.ref_packed is not None
        and jax.devices()[0].platform == "tpu"
    )
    if use_packed_wire:
        # 2-bit wire: align window origins to 8 (clean byte slices in
        # both the packed chars and the separator bitmask), widen the
        # window to keep the original right edge covered (the band has
        # W columns of slack past the read, so the <=7-char origin
        # shift never clips a reachable cell)
        tstart = tstart & ~np.int64(7)
        Lwp = -(-(Lw + 8) // 8) * 8
        cols, mcols = Lwp // 4, Lwp // 8
        wbytes = np.take(
            index.ref_packed,
            (tstart // 4)[:, None] + np.arange(cols)[None, :],
            mode="clip",
        )
        mbytes = np.take(
            index.ref_sepmask,
            (tstart // 8)[:, None] + np.arange(mcols)[None, :],
            mode="clip",
        )
        lens_t = np.minimum(Lwp, len(index.ref) - tstart)
        from swtpu.core.encode import pack_2bit
        from swtpu.core.scoring import ScoringParams, dna_matrix

        L4 = -(-L // 4) * 4
        reads4 = (
            reads if L4 == L
            else np.pad(reads, ((0, 0), (0, L4 - L)))
        )
        reads_b = pack_2bit(np.where(reads4 > 3, 0, reads4))
        qbytes = reads_b[cands.read]
        # reads can carry pad codes past their length; lens masks them
        Cp = max(1024, -(-C // 1024) * 1024)
        if Cp > C:
            padrow = lambda a: np.concatenate(
                [a, np.repeat(a[:1] * 0, Cp - C, axis=0)], axis=0
            )
            qbytes, wbytes, mbytes = (
                padrow(qbytes), padrow(wbytes), padrow(mbytes),
            )
            lq = np.concatenate([lq, np.zeros(Cp - C, lq.dtype)])
            lens_t = np.concatenate(
                [lens_t, np.zeros(Cp - C, lens_t.dtype)]
            )
        go = int(gap_open) if gap_open is not None else int(gap)
        ge = int(gap_extend) if gap_open is not None else int(gap)
        params = ScoringParams(
            dna_matrix(match, -mismatch) if matrix is None
            else np.asarray(matrix),
            go, ge,
        )
        scores = np.asarray(
            _fixed_scores_packed(
                qbytes, wbytes, mbytes, lq.astype(np.int32),
                lens_t.astype(np.int32), params, bandwidth, L4, Lwp,
            )
        )[:C]
        return scores, tstart
    idx = tstart[:, None] + np.arange(Lw)[None, :]
    # mode='clip' clamps inside the take (no materialized clipped copy)
    windows = np.take(index.ref, idx, mode="clip")
    lens_t = np.minimum(Lw, len(index.ref) - tstart)
    # pad the batch to the kernel grid step (512 for the packed adaptive
    # kernel, 1024 pairs/tile for the fixed-band kernel): candidate
    # counts vary run to run, and a stable shape keeps ONE compiled
    # extension executable per configuration
    step = 512 if extend == "adaptive" else 1024
    Cp = max(step, -(-C // step) * step)
    qsel = reads[cands.read]
    if Cp > C:
        padrow = lambda a: np.concatenate(
            [a, np.repeat(a[:1] * 0, Cp - C, axis=0)], axis=0
        )
        qsel, windows = padrow(qsel), padrow(windows)
        lq = np.concatenate([lq, np.zeros(Cp - C, lq.dtype)])
        lens_t = np.concatenate([lens_t, np.zeros(Cp - C, lens_t.dtype)])
    if extend != "adaptive":
        scores = _fixed_scores(
            qsel, windows, lq, lens_t, match, mismatch, gap, gap_open,
            gap_extend, bandwidth, matrix,
        )[:C]
        return scores, tstart
    kw = dict(bandwidth=bandwidth, x_threshold=x_threshold)
    if matrix is not None:
        kw["matrix"] = matrix
    else:
        kw.update(match=match, mismatch=mismatch, gap=gap)
    if gap_open is not None and gap_open != gap_extend:
        kw.update(gap_open=gap_open, gap_extend=gap_extend)
    elif gap_open is not None:
        kw["gap"] = gap_open
    scores = _banded_scores(qsel, windows, lq, lens_t, **kw)[:C]
    return scores, tstart


# ---------------------------------------------------------------------------
# 4. The pipeline


def _seed_rows(
    reads, lens, index, both_strands, min_seeds, max_occ, max_loci,
    bandwidth,
):
    """Host seeding stage: per strand (reads, lens, strand, candidates).

    Pure host work (revcomp + k-mer seeding) split out so
    :func:`map_reads_pipelined` can run it for chunk i+1 while the
    device extends chunk i."""
    rows = [(reads, lens, "+")]
    if both_strands:
        from swtpu.core.encode import revcomp

        rc = np.stack(
            [revcomp(reads[i], int(lens[i])) for i in range(len(reads))]
        )
        rows.append((rc, lens, "-"))
    return [
        (
            q,
            ql,
            strand,
            find_candidates(
                index, q, ql, min_seeds=min_seeds, max_occ=max_occ,
                max_loci=max_loci, diag_window=bandwidth,
            ),
        )
        for q, ql, strand in rows
    ]


def map_reads_pipelined(
    reads: np.ndarray,
    lens: Optional[Sequence[int]] = None,
    index: Optional[KmerIndex] = None,
    chunk_reads: int = 1024,
    **kw,
) -> List[Optional[MapHit]]:
    """map_reads with a two-stage software pipeline over read chunks.

    A one-worker thread seeds chunk i+1 (k-mer lookups + clustering —
    pure host work; the C++ seeder releases the GIL) while the main
    thread waits on chunk i's device extension, so seeding leaves the
    device's critical path. Hit-for-hit identical to ``map_reads``
    (chunks only partition reads; per-read results are independent) —
    asserted by test_mapper.py.

    Chunk-size adaptation (round 5): every extra ``map_reads`` call pays
    a FIXED tunnel cost (several ~30 ms fetch round-trips), so the r4
    4-way split LOST 19 ms despite balanced stages (seed 121 ms /
    extend ~127 ms — BENCHSUITE_r04_all.txt:149-152). The pipeline now
    runs at most TWO chunks: one extra fixed cost against a reclaim of
    min(seed, extend)/2, which wins whenever half a stage exceeds one
    round-trip and degrades to a tie (never a 4x fixed-cost loss)
    otherwise. ``chunk_reads`` remains the engage threshold: workloads
    of <= chunk_reads reads take the plain sync path.
    """
    reads = np.asarray(reads, dtype=np.uint8)
    R, L = reads.shape
    lens = (
        np.full(R, L, dtype=np.int64)
        if lens is None
        else np.asarray(lens, dtype=np.int64)
    )
    if index is None:
        if "contigs" not in kw:
            raise ValueError("need index= or contigs=")
        index = build_index(
            kw.pop("contigs"), kw.pop("contig_names", None),
            k=kw.get("k", 13),
        )
    if R <= chunk_reads:
        return map_reads(reads, lens, index=index, **kw)
    chunk_reads = max(chunk_reads, -(-R // 2))  # at most two chunks
    import concurrent.futures as cf

    seed_kw = dict(
        both_strands=kw.get("both_strands", False),
        min_seeds=kw.get("min_seeds", 2),
        max_occ=kw.get("max_occ", 64),
        max_loci=kw.get("max_loci", 8),
        bandwidth=kw.get("bandwidth", 32),
    )
    bounds = list(range(0, R, chunk_reads))
    hits: List[Optional[MapHit]] = []
    with cf.ThreadPoolExecutor(max_workers=1) as ex:
        fut = ex.submit(
            _seed_rows, reads[: chunk_reads], lens[: chunk_reads],
            index, **seed_kw,
        )
        for ci, lo in enumerate(bounds):
            hi = min(lo + chunk_reads, R)
            seeded = fut.result()
            if ci + 1 < len(bounds):
                lo2 = bounds[ci + 1]
                hi2 = min(lo2 + chunk_reads, R)
                fut = ex.submit(
                    _seed_rows, reads[lo2:hi2], lens[lo2:hi2], index,
                    **seed_kw,
                )
            chunk_hits = map_reads(
                reads[lo:hi], lens[lo:hi], index=index, _seeded=seeded,
                **kw,
            )
            hits.extend(
                h if h is None else dataclasses.replace(h, read=h.read + lo)
                for h in chunk_hits
            )
    return hits


def map_reads(
    reads: np.ndarray,
    lens: Optional[Sequence[int]] = None,
    index: Optional[KmerIndex] = None,
    contigs: Optional[Sequence[np.ndarray]] = None,
    contig_names: Optional[Sequence[str]] = None,
    k: int = 13,
    min_seeds: int = 2,
    max_occ: int = 64,
    max_loci: int = 8,
    match: int = 1,
    mismatch: int = 1,
    gap: int = 1,
    gap_open: Optional[int] = None,
    gap_extend: Optional[int] = None,
    bandwidth: int = 32,
    x_threshold: int = 70,
    min_score: int = 1,
    both_strands: bool = False,
    traceback: bool = False,
    extend: str = "auto",
    _seeded: Optional[list] = None,
) -> List[Optional[MapHit]]:
    """Map every read to its best reference locus; None = unmapped.

    Deterministic winner selection: per read the best (score desc,
    tstart asc, '+' before '-') candidate above min_score wins.

    ``extend`` (see extend_candidates) picks the screening engine: the
    default "auto" runs the fixed-corridor kernel on TPU (hit scores
    then follow the fixed-band local oracle) and the adaptive X-drop
    tier elsewhere. With ``traceback=True`` the winners re-run through
    the banded family's traceback engine — the block-adaptive tier with
    per-pair lens + device move-wire walk on TPU (round 5; scores/paths
    carry the block-oracle X-drop contract), the per-round adaptive
    engine elsewhere — so hits with paths always
    carry X-drop-contract scores.

    ``_seeded`` (internal, used by :func:`map_reads_pipelined`) injects
    precomputed ``_seed_rows`` output so the host seeding stage can run
    ahead of the device extension."""
    reads = np.asarray(reads, dtype=np.uint8)
    R, L = reads.shape
    lens = (
        np.full(R, L, dtype=np.int64)
        if lens is None
        else np.asarray(lens, dtype=np.int64)
    )
    if index is None:
        if contigs is None:
            raise ValueError("need index= or contigs=")
        index = build_index(contigs, contig_names, k=k)
    seeded = (
        _seed_rows(
            reads, lens, index, both_strands, min_seeds, max_occ,
            max_loci, bandwidth,
        )
        if _seeded is None
        else _seeded
    )
    all_read, all_tstart, all_scores, all_seeds, all_strand = (
        [], [], [], [], [],
    )
    strand_rows = {}
    for q, ql, strand, cands in seeded:
        strand_rows[strand] = q
        if len(cands.read) == 0:
            continue
        scores, tstart = extend_candidates(
            index, q, ql, cands, match=match, mismatch=mismatch, gap=gap,
            gap_open=gap_open, gap_extend=gap_extend, bandwidth=bandwidth,
            x_threshold=x_threshold, extend=extend,
        )
        all_read.append(cands.read)
        all_tstart.append(tstart)
        all_scores.append(scores.astype(np.int64))
        all_seeds.append(cands.n_seeds)
        all_strand.append(
            np.zeros(len(cands.read), np.int64)
            if strand == "+"
            else np.ones(len(cands.read), np.int64)
        )
    hits: List[Optional[MapHit]] = [None] * R
    if not all_read:
        return hits
    read = np.concatenate(all_read)
    tstart = np.concatenate(all_tstart)
    scores = np.concatenate(all_scores)
    seeds = np.concatenate(all_seeds)
    strands = np.concatenate(all_strand)
    ok = scores >= min_score
    read, tstart, scores, seeds, strands = (
        read[ok], tstart[ok], scores[ok], seeds[ok], strands[ok],
    )
    if len(read) == 0:
        return hits
    order = np.lexsort((strands, tstart, -scores, read))
    first = np.searchsorted(read[order], np.arange(R), side="left")
    last = np.searchsorted(read[order], np.arange(R), side="right")
    win = [order[f] for f, l in zip(first, last) if f < l]
    win_reads = [int(read[w]) for w in win]
    paths = [None] * len(win)
    if traceback and win:
        from swtpu.batch import banded_align_batch

        margin, Lw = _window_geometry(L, bandwidth)
        w_tstart = tstart[win]
        idx = w_tstart[:, None] + np.arange(Lw)[None, :]
        windows = index.ref[np.clip(idx, 0, len(index.ref) - 1)]
        qsel = np.stack(
            [
                strand_rows["-" if strands[w] else "+"][r]
                for w, r in zip(win, win_reads)
            ]
        )
        import jax as _jax

        w_lens_q = [int(lens[r]) for r in win_reads]
        w_lens_t = list(np.minimum(Lw, len(index.ref) - w_tstart))
        linear = gap_open is None or gap_open == gap_extend
        g_eff = gap if gap_open is None else gap_open
        if linear and _jax.devices()[0].platform == "tpu":
            # round 5: winners walk on the BLOCK-ADAPTIVE tier (the
            # banded family's flagship — kernels/pallas/banded_block.py,
            # per-pair varlen, device 2-bit move wire), so hit+path
            # scores carry the block-oracle X-drop contract
            # (oracle/banded_block.py: pruning at block granularity)
            from swtpu.kernels.pallas.banded_block import (
                banded_block_align_device,
            )

            out = banded_block_align_device(
                qsel,
                windows,
                match=match,
                mismatch=mismatch,
                gap=g_eff,
                width=bandwidth * 2,
                block=bandwidth,
                x_threshold=x_threshold,
                lens_q=w_lens_q,
                lens_t=w_lens_t,
            )
        else:
            kw = dict(bandwidth=bandwidth, x_threshold=x_threshold)
            if gap_open is not None and gap_open != gap_extend:
                kw.update(gap_open=gap_open, gap_extend=gap_extend)
            elif gap_open is not None:
                kw["gap"] = gap_open
            out = banded_align_batch(
                qsel,
                windows,
                w_lens_q,
                w_lens_t,
                match=match,
                mismatch=mismatch,
                gap=gap,
                **kw,
            )
        # winners carry the banded-family X-drop score for the same
        # window (block-oracle contract on TPU, per-round elsewhere):
        # a rescore of the screening stage's fixed-corridor score
        scores = scores.copy()
        for w, (s, _) in zip(win, out):
            scores[w] = s
        paths = [p for _, p in out]
    if win:
        w_arr = np.asarray(win)
        cids, locals_ = index.locate(tstart[w_arr])
    for k, (w, rd, path) in enumerate(zip(win, win_reads, paths)):
        cid, local = int(cids[k]), int(locals_[k])
        pos = local
        rel_path = None
        if path:
            # path cells are 1-based (y=read, x=window) after a (0, 0)
            # origin; refine pos to the column where read char 1 aligns
            # and rebase x onto the contig
            first = next((x for y, x in path if y == 1), path[0][1] + 1)
            pos = local + first - 1
            rel_path = [(y, x + local) for y, x in path]
        hits[rd] = MapHit(
            read=rd,
            contig=index.contig_names[cid],
            pos=pos,
            score=int(scores[w]),
            strand="-" if strands[w] else "+",
            n_seeds=int(seeds[w]),
            path=rel_path,
            window_start=int(tstart[w]),
        )
    return hits
