"""Pallas block-adaptive banded X-drop engine — the zero-lane-motion
banded tier (round 4).

Contract: bit-exact against ``swtpu.oracle.banded_block.banded_xdrop_block``
(scores, endpoints, band history, per-block bases/deltas). The tier exists
because the per-round adaptive kernels (banded_batch/banded_packed ≙
source.cpp:1978-2725) are permute-bound: ~15 lane-motion ops per 32-cell
round at ~11x ALU cost (README "Hardware notes"). This tier amortizes ALL
adaptive work — re-centering, X-drop, dead-band test, endpoint reduce —
over a block of K rows, and the inner loop is the flagship's layout:

- pairs fill the (8,128) int32 tile (batch on sublanes x lanes, S = B/128
  sublane rows), band slots are the UNROLLED leading axis — so diag is
  ``prev[k]`` (the corridor slides +1 column/row: same slot), up is
  ``prev[k+1]`` (static slot re-index), and left rides the flagship's
  serial chain. Zero lane permutes in the inner loop.
- the per-pair data-dependent part — each pair's corridor base — is
  solved OUTSIDE the kernel: a ``lax.while_loop`` over blocks gathers
  each block's target window (``take_along_axis`` on [B, m], an XLA
  gather) and hands the kernel a corridor-aligned [K+W-1, S, L] char
  slab; inside a block every access is static. This is the TPU-native
  split: XLA owns data motion, Pallas owns the recurrence.
- block end (all in-kernel, ALU only): per-slot block max + first-row
  tracking reduce to the row-major-first endpoint; X-drop zeroes the
  carried row against the updated global max; first-argmax re-centers
  the corridor (delta clipped to ±dmax); the realign
  ``carried[k] = zeroed[k+delta]`` is a chunked barrel shifter over the
  slot axis (log2(2*dmax) select passes) — no gathers.

Band history (optional) is written row-by-row to HBM via async copy, the
last row of each block overwritten with its X-dropped version (the
oracle's ``hist[n_rows-1]`` contract). The host walk is
``oracle.banded_block.walk_block_history`` on the fetched rows.

Scope: uniform scoring or general matrix (baked packed table, the
banded family's ALU select-tree lookup); linear AND affine gaps;
per-pair variable lengths on the linear tiers (round 5 — lens_q rows
freeze in-kernel, lens_t chars pad to -1, the final row's X-drop
zeroing for mid-block enders is a host/walker fixup because the cutoff
is only known at block end). Round 5 also adds the FOLDED small-batch
layout (G = 8/S band segments on the idle sublanes — see
_block_kernel_folded) that lifts batch-256 throughput from 44 to 100+
band GCUPS.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from swtpu.kernels.pallas.banded_batch import _packed_banded_table, _table_lookup
from swtpu.kernels.pallas.sw_batch import LANE, _at

CHUNK = 16  # band slots per unrolled inner group


@dataclasses.dataclass
class BandedBlockBatchResult:
    """Batched block-tier forward results (layout mirrors the oracle's
    :class:`~swtpu.oracle.banded_block.BandedBlockResult`, batched).

    band_history/bases/deltas rows past a pair's ``n_rows`` (its death
    block) are unspecified — all consumers walk ``< n_rows``.
    """

    score: np.ndarray  # [B] int32, max - X
    end_y: np.ndarray  # [B] int32 (0 = all-dead start)
    end_j: np.ndarray  # [B]
    n_rows: np.ndarray  # [B] rows computed (block-granular, <= n)
    bases: Optional[np.ndarray] = None  # [NB, B] block base
    deltas: Optional[np.ndarray] = None  # [NB, B]
    band_history: Optional[np.ndarray] = None  # [n, W, B] int32


def _block_kernel(
    y0_ref,
    q_ref,
    t_ref,
    carried_ref,
    state_ref,
    *rest,
    W,
    K,
    X,
    match,
    mismatch,
    gap,
    D,
    table,
    with_history,
    go=None,
    ge=None,
    varlen=False,
):
    """One K-row block for all pairs: rows y0+1 .. y0+K.

    state rows in: 0 base, 1 max, 2 end_y, 3 end_j;
    state rows out: + 4 alive, 5 delta.

    ``varlen``: an extra lens input follows state (per-pair query
    length); rows y > len commit nothing — per-pair the carried row,
    block max, and endpoint freeze at the pair's own final row, exactly
    the oracle run on that pair's length (the per-pair termination
    geometry of source.cpp:1891-1941 at block granularity). The final
    history row's X-drop zeroing for mid-block enders is applied by the
    consumers (host fixup / the walker's y == n_rows cutoff rule) since
    the cutoff is only known at block end.

    Affine (Gotoh) mode when go is not None: the oracle twin is
    banded_xdrop_block_affine — F rides prev[k+1] exactly like the
    linear up (static slot re-index), E joins the serial chain, both
    with the EF_DEAD dead-blocking convention; history stays H-only
    (E/F host-reconstructible, oracle.banded_block.reconstruct_block_ef).
    The carried state doubles to [2W]: H rows then F rows.
    """
    affine = go is not None
    if varlen:
        lens_ref, carried_out, state_out = rest[0], rest[1], rest[2]
        rest = rest[3:]
    else:
        carried_out, state_out = rest[0], rest[1]
        rest = rest[2:]
    if with_history:
        hist_ref, hrow_ref, sem, prev_ref, bv_ref, rb_ref, ra_ref = rest
    else:
        prev_ref, bv_ref, rb_ref, ra_ref = rest
    S = q_ref.shape[1]
    zero = jnp.zeros((S, LANE), jnp.int32)
    zrow = jnp.zeros((1, S, LANE), jnp.int32)
    m32 = jnp.int32(match)
    mm32 = jnp.int32(-mismatch)
    g32 = jnp.int32(gap)
    X32 = jnp.int32(X)
    MINF = jnp.int32(-(2**30))
    EFD = jnp.int32(-(2**28))
    EFC = jnp.int32(-(2**27))
    go32 = jnp.int32(go if affine else 0)
    ge32 = jnp.int32(ge if affine else 0)
    n_chunks = W // CHUNK
    # prev_ref layout: rows [0, W] = H slots 0..W (slot W dead pad);
    # affine adds rows [W+1, 2W+1] = F slots 0..W (slot W = EF_DEAD)
    FOFF = W + 1

    def chain_a(y):
        # affine leading-gap boundary chain (X at the origin)
        return jnp.where(y == 0, X32, X32 - go32 - (y - 1) * ge32)

    base = state_ref[0]
    y0 = y0_ref[0]

    prev_ref[pl.ds(0, W)] = carried_ref[pl.ds(0, W)]
    prev_ref[pl.ds(W, 1)] = zrow  # slot W: dead up-neighbor of slot W-1
    if affine:
        prev_ref[pl.ds(FOFF, W)] = carried_ref[pl.ds(W, W)]
        prev_ref[pl.ds(FOFF + W, 1)] = jnp.full((1, S, LANE), EFD, jnp.int32)
    bv_ref[:] = jnp.zeros((W, S, LANE), jnp.int32)
    rb_ref[:] = jnp.zeros((W, S, LANE), jnp.int32)

    def row_body(r, _):
        y = y0 + r + 1
        act = (y <= lens_ref[:]) if varlen else None
        if affine:
            pin = jnp.maximum(chain_a(y), 0)  # column-0 pin (H)
            pin_f = chain_a(y)  # raw chain rides the F state
        else:
            pin = jnp.maximum(X32 - y * g32, 0)  # column-0 gap chain
        bpr = base + r
        # left of slot 0 is column base+r-1: the chain when that is
        # column 0, else out-of-corridor (dead)
        h = jnp.where(bpr == 1, pin, zero)
        u = h - g32  # rebias carry for the linear chain (u_{-1})
        e = jnp.full((S, LANE), EFD, jnp.int32)  # E left of slot 0: dead
        qrow = q_ref[pl.ds(r, 1)][0]
        for jc in range(n_chunks):
            j0 = jc * CHUNK
            tw = t_ref[pl.ds(r + j0, CHUNK)]
            prev_a = prev_ref[pl.ds(j0, CHUNK)]
            prev_b = prev_ref[pl.ds(j0 + 1, CHUNK)]
            if table is None:
                s = jnp.where((qrow[None] == tw) & (tw >= 0), m32, mm32)
            else:
                s = _table_lookup(qrow[None], tw, table)
            # dead diag never resurrects; relu folds the oracle's 0 floor
            # (up/left negatives lose to pre2 >= 0 in the chain maxes)
            pre2 = jnp.maximum(jnp.where(prev_a > 0, prev_a + s, 0), 0)
            kio = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, S, LANE), 0)
            pin_mask = (bpr[None] + (kio + j0)) == 0  # slot holds column 0
            if not affine:
                # gap-rebias chain coordinates (see the folded kernel):
                # u_k = h_k + k*g turns the serial left chain into a
                # 1-op/step running max; k is the global slot index so
                # u carries across chunks unchanged
                bjg = (
                    jnp.maximum(pre2, prev_b - g32)
                    + (kio + j0) * g32
                )
            if affine:
                # F off the previous row's slot k+1 (chunk-wide): the
                # affine up, with dead blocking on both branches
                pf = prev_ref[pl.ds(FOFF + j0 + 1, CHUNK)]
                Fc = jnp.maximum(
                    jnp.where(pf > EFC, pf - ge32, MINF),
                    jnp.where(prev_b > 0, prev_b - go32, MINF),
                )
            hs = []
            for k in range(CHUNK):
                if affine:
                    e = jnp.maximum(
                        jnp.where(e > EFC, e - ge32, MINF),
                        jnp.where(h > 0, h - go32, MINF),
                    )
                    h = jnp.maximum(
                        _at(pre2, k), jnp.maximum(_at(Fc, k), e)
                    )
                    h = jnp.where(_at(pin_mask, k), pin, h)
                    # dead blocks E propagation; pin column E is dead
                    e = jnp.where(
                        _at(pin_mask, k) | (h == 0), EFD,
                        jnp.maximum(e, EFD),
                    )
                else:
                    u = jnp.maximum(_at(bjg, k), u)
                    u = jnp.where(
                        _at(pin_mask, k), pin + (j0 + k) * g32, u
                    )
                    h = u - (j0 + k) * g32
                hs.append(h)
            Hc = jnp.stack(hs)
            # per-slot block max with first-row tie-break (strict >)
            bv = bv_ref[pl.ds(j0, CHUNK)]
            upd = Hc > bv
            if varlen:
                upd = upd & act[None]
            bv_ref[pl.ds(j0, CHUNK)] = jnp.where(upd, Hc, bv)
            rb_ref[pl.ds(j0, CHUNK)] = jnp.where(
                upd, r, rb_ref[pl.ds(j0, CHUNK)]
            )
            if affine:
                # F pin + death, then store (writes must follow the
                # chunk's prev-row reads of slots j0..j0+CHUNK)
                Fc = jnp.where(pin_mask, pin_f, Fc)
                Fc = jnp.where(Hc == 0, EFD, jnp.maximum(Fc, EFD))
            if varlen:
                # rows past the pair's length commit nothing: the
                # carried band freezes at its own final row
                Hc = jnp.where(act[None], Hc, prev_a)
                if affine:
                    f_old = prev_ref[pl.ds(FOFF + j0, CHUNK)]
                    Fc = jnp.where(act[None], Fc, f_old)
            prev_ref[pl.ds(j0, CHUNK)] = Hc
            if affine:
                prev_ref[pl.ds(FOFF + j0, CHUNK)] = Fc
            if with_history:
                hrow_ref[0, pl.ds(j0, CHUNK)] = Hc
        if with_history:
            # rows 0..K-2 go out as computed; row K-1 is DMA'd after the
            # block-end X-drop zeroing (the oracle's hist[n_rows-1])
            @pl.when(r < K - 1)
            def _():
                copy = pltpu.make_async_copy(
                    hrow_ref, hist_ref.at[pl.ds(r, 1)], sem
                )
                copy.start()
                copy.wait()

        return 0

    jax.lax.fori_loop(0, K, row_body, 0)

    # --- block end: endpoint reduce (row-major first max) ---
    best_v, best_r, best_k = zero, zero, zero
    for jc in range(n_chunks):
        bvc = bv_ref[pl.ds(jc * CHUNK, CHUNK)]
        rbc = rb_ref[pl.ds(jc * CHUNK, CHUNK)]
        for k in range(CHUNK):
            bk = _at(bvc, k)
            rk = _at(rbc, k)
            better = (bk > best_v) | ((bk == best_v) & (rk < best_r))
            best_v = jnp.where(better, bk, best_v)
            best_r = jnp.where(better, rk, best_r)
            best_k = jnp.where(better, jnp.int32(jc * CHUNK + k), best_k)
    upd = best_v > state_ref[1]
    maxg = jnp.where(upd, best_v, state_ref[1])
    end_y = jnp.where(upd, y0 + best_r + 1, state_ref[2])
    end_j = jnp.where(upd, base + best_r + best_k, state_ref[3])
    cutoff = maxg - X32

    # --- X-drop zeroing + dead test + first-argmax of the carried row ---
    ra_ref[pl.ds(0, D)] = jnp.zeros((D, S, LANE), jnp.int32)
    ra_ref[pl.ds(D + W, D)] = jnp.zeros((D, S, LANE), jnp.int32)
    am_v, am_k = zero, zero
    for jc in range(n_chunks):
        j0 = jc * CHUNK
        c = prev_ref[pl.ds(j0, CHUNK)]
        z = jnp.where(c < cutoff[None], 0, c)
        ra_ref[pl.ds(D + j0, CHUNK)] = z
        if affine:
            # F dies with H (the affine family's dead-blocking rule)
            fz = jnp.where(
                z == 0, EFD, prev_ref[pl.ds(FOFF + j0, CHUNK)]
            )
            prev_ref[pl.ds(FOFF + j0, CHUNK)] = fz
        if with_history:
            hrow_ref[0, pl.ds(j0, CHUNK)] = z
        for k in range(CHUNK):
            zk = _at(z, k)
            am_upd = zk > am_v
            am_v = jnp.where(am_upd, zk, am_v)
            am_k = jnp.where(am_upd, jnp.int32(j0 + k), am_k)
    if with_history:
        copy = pltpu.make_async_copy(
            hrow_ref, hist_ref.at[pl.ds(K - 1, 1)], sem
        )
        copy.start()
        copy.wait()
    alive = (am_v > 0).astype(jnp.int32)
    delta = jnp.clip(am_k - W // 2, -D, D) * alive  # dead: delta 0

    # --- realign: carried[k] = zeroed[k + delta], chunked barrel shift
    # over the slot axis. ra holds ext[p] = zeroed[p - D]; shifting by
    # u = delta + D in binary passes leaves carried[k] = ext[k + u].
    # In-place ascending is safe: reads sit at p + 2^i > p writes.
    u = delta + D  # dead pairs: delta 0 -> u = D keeps the row unshifted
    nbits = max(1, (2 * D).bit_length())
    span = W + 2 * D

    def barrel():
        for i in range(nbits):
            sh = 1 << i
            bit = ((u >> i) & 1) > 0
            for p0 in range(0, span - sh, CHUNK):
                cw = min(CHUNK, span - sh - p0)
                a = ra_ref[pl.ds(p0, cw)]
                b = ra_ref[pl.ds(p0 + sh, cw)]
                ra_ref[pl.ds(p0, cw)] = jnp.where(bit[None], b, a)

    barrel()
    carried_out[pl.ds(0, W)] = ra_ref[pl.ds(0, W)]
    if affine:
        # same realign for the carried F row, EF_DEAD outside
        efrow = jnp.full((1, S, LANE), EFD, jnp.int32)
        for p0 in range(0, D):
            ra_ref[pl.ds(p0, 1)] = efrow
            ra_ref[pl.ds(D + W + p0, 1)] = efrow
        for jc in range(n_chunks):
            j0 = jc * CHUNK
            ra_ref[pl.ds(D + j0, CHUNK)] = prev_ref[
                pl.ds(FOFF + j0, CHUNK)
            ]
        barrel()
        carried_out[pl.ds(W, W)] = ra_ref[pl.ds(0, W)]

    st = jnp.stack(
        [
            base + (jnp.int32(K) + delta) * alive,  # dead: base frozen
            maxg,
            end_y,
            end_j,
            alive,
            delta,
        ]
    )
    state_out[:] = st


def _block_kernel_folded(
    y0_ref,
    qbf_ref,
    twf_ref,
    carried_ref,
    state_ref,
    *rest,
    W,
    K,
    X,
    match,
    mismatch,
    gap,
    D,
    table,
    with_history,
    G,
    varlen=False,
):
    """One K-row block, FOLDED layout — the small-batch fast path.

    With S = B/128 < 8 sublane rows of pairs, every vector op in the
    straight [slot, S, L] layout pays a full (8,128) vreg for an
    (S,128) tile: measured 22.9 us/block at S=2 vs ~30 us at S=8 (4x
    the pairs) — the block tier was sublane-waste-bound, not
    orchestration-bound. This kernel folds G = 8/S band SEGMENTS of
    SEG = W/G slots onto the idle sublanes (slot k = g*SEG + j lives at
    row j, sublane g*S + s), so chunk-wide ops and the serial left
    chain run at full vreg utilization:

    - diag  = prev[j]     (same position, zero motion — the corridor
      slides +1 column/row exactly as in `_block_kernel`);
    - up    = prev[j + 1] with ONE extra row (`prev_ext[SEG]`) holding
      each group's next-group j=0 value (one sublane roll per row);
    - left chain: the G segment chains advance IN THE SAME vreg op
      (serial over j only); the true left boundary of segments > 0 is
      restored by the max-plus two-level decomposition — segment chains
      run with a -inf left, then h[j] = max(h'[j], L_seg - (j+1)*gap)
      where L_seg propagates serially across the G groups (sublane
      rolls, G-1 steps/row). The column-0 pin breaks max-plus
      associativity, so the cross-segment term is suppressed for slots
      at/after the pin (the pin's own effect is exact in phase 1).

    The block-end machinery (X-drop, dead test, endpoint/argmax
    reduce, realign barrel) runs once per K rows: reductions ring
    across the groups (sublane rolls with an explicit slot tie-break),
    the barrel reuses `_block_kernel`'s unfolded code verbatim on the
    unfolded carried row. Carried band and state keep the [W, S, L] /
    [*, S, L] layouts across blocks, so the XLA glue and every output
    contract are unchanged; history rows are written folded
    [K, SEG, 8, L] and unfolded by one XLA transpose in
    `_banded_block_impl`. Bit-exact vs `oracle.banded_block`
    (linear gaps; affine keeps `_block_kernel`).
    """
    if varlen:
        lens_ref, carried_out, state_out = rest[0], rest[1], rest[2]
        rest = rest[3:]
    else:
        carried_out, state_out = rest[0], rest[1]
        rest = rest[2:]
    if with_history:
        (hist_ref, hrow_ref, sem, prevx_ref, bvf_ref, rbf_ref,
         ra_ref) = rest
    else:
        prevx_ref, bvf_ref, rbf_ref, ra_ref = rest
    S = carried_ref.shape[1]
    SEG = W // G
    zero8 = jnp.zeros((8, LANE), jnp.int32)
    m32 = jnp.int32(match)
    mm32 = jnp.int32(-mismatch)
    g32 = jnp.int32(gap)
    X32 = jnp.int32(X)
    MINF = jnp.int32(-(2**30))
    sub_i = jax.lax.broadcasted_iota(jnp.int32, (8, LANE), 0)
    group_id = sub_i // S
    segstart = group_id * SEG  # (8,L): first slot of this row's group
    kio3 = segstart[None] + jax.lax.broadcasted_iota(
        jnp.int32, (SEG, 8, LANE), 0
    )  # global slot index per (j, group)
    gshift = 8 - S  # sublane roll amount for "next group" (≡ -S mod 8)

    base = state_ref[0]
    basef = jnp.concatenate([base] * G, axis=0)  # (8,L)
    lensf = (
        jnp.concatenate([lens_ref[:]] * G, axis=0) if varlen else None
    )
    y0 = y0_ref[0]

    # fold carried [W, S, L] -> prev_ext [SEG(+1), 8, L]
    for j in range(SEG):
        prevx_ref[pl.ds(j, 1)] = jnp.concatenate(
            [carried_ref[g * SEG + j] for g in range(G)], axis=0
        )[None]
    first = prevx_ref[0]
    prevx_ref[pl.ds(SEG, 1)] = jnp.where(
        sub_i >= 8 - S, 0, pltpu.roll(first, gshift, axis=0)
    )[None]
    bvf_ref[:] = jnp.zeros((SEG, 8, LANE), jnp.int32)
    rbf_ref[:] = jnp.zeros((SEG, 8, LANE), jnp.int32)

    def make_row_body(pins):
        # ``pins`` (python flag): whether the column-0 pin machinery is
        # live. base is monotone non-decreasing, so pins (a slot holding
        # column 0: base + r + k == 0) are only possible while
        # base <= 1; the per-block @pl.when below routes every later
        # block through the pin-free body (~25% fewer row ops).
        def row_body(r, _):
            y = y0 + r + 1
            bprf = basef + r
            qrowf = qbf_ref[pl.ds(r, 1)][0]
            tw = twf_ref[pl.ds(r, SEG)]
            prev_a = prevx_ref[pl.ds(0, SEG)]
            prev_b = prevx_ref[pl.ds(1, SEG)]
            if table is None:
                s = jnp.where((qrowf[None] == tw) & (tw >= 0), m32, mm32)
            else:
                s = _table_lookup(qrowf[None], tw, table)
            pre2 = jnp.maximum(jnp.where(prev_a > 0, prev_a + s, 0), 0)
            if pins:
                pinf = jnp.broadcast_to(
                    jnp.maximum(X32 - y * g32, 0), (8, LANE)
                ).astype(jnp.int32)
                pinkf = -bprf  # the pinned slot index, if in [0, W)
                l0f = jnp.where(bprf == 1, pinf, zero8)
                pin_mask = (bprf[None] + kio3) == 0
            else:
                l0f = zero8
            # phase 1: G segment chains in lockstep (left of group 0 =
            # the row edge; other groups -inf, restored by the fix).
            # The chain runs in gap-rebias coordinates u_j = h_j + j*g
            # (the offset-DP idea, source.cpp:985-994): u_j =
            # max(base_j + j*g, u_{j-1}) is ONE serial op per step —
            # the kernel is chain-latency-bound, so the classic 3-op
            # form (max(pre2, max(up, h) - g)) costs ~1.5x the row.
            jio = jax.lax.broadcasted_iota(
                jnp.int32, (SEG, 8, LANE), 0
            ) * g32
            bjg = jnp.maximum(pre2, prev_b - g32) + jio
            useed = jnp.where(sub_i < S, l0f, MINF) - g32
            if pins:
                # serial running max with the column-0 pin forced in
                u = useed
                hs = []
                for j in range(SEG):
                    u = jnp.maximum(_at(bjg, j), u)
                    u = jnp.where(
                        _at(pin_mask, j), pinf + j * g32, u
                    )
                    hs.append(u)
                hs = [u_j - j * g32 for j, u_j in enumerate(hs)]
            else:
                # pin-free: the running max is a max-plus prefix —
                # log-doubling over the LEADING axis (static shifts,
                # no permutes, everything chunk-wide): latency
                # log2(SEG) passes instead of SEG serial steps
                U = jnp.concatenate(
                    [
                        jnp.maximum(_at(bjg, 0), useed)[None],
                        jax.lax.slice_in_dim(bjg, 1, SEG, axis=0),
                    ],
                    axis=0,
                )
                sh = 1
                while sh < SEG:
                    shifted = jnp.concatenate(
                        [
                            jnp.full((sh, 8, LANE), MINF, jnp.int32),
                            jax.lax.slice_in_dim(
                                U, 0, SEG - sh, axis=0
                            ),
                        ],
                        axis=0,
                    )
                    U = jnp.maximum(U, shifted)
                    sh *= 2
                Hstk = U - jio
            # phase 2: true segment left boundaries (serial over groups)
            E0 = hs[SEG - 1] if pins else _at(Hstk, SEG - 1)
            Lvec = jnp.where(sub_i < S, l0f, MINF)
            if pins:
                # int32 mask (Mosaic cannot rotate i1 vectors)
                pis = jnp.where(
                    (pinkf >= segstart) & (pinkf < segstart + SEG), 1, 0
                )
            for st in range(1, G):
                prevL = pltpu.roll(Lvec, S, axis=0)
                endp = pltpu.roll(E0, S, axis=0)
                contrib = prevL - SEG * g32
                if pins:
                    pisp = pltpu.roll(pis, S, axis=0)
                    contrib = jnp.where(pisp > 0, MINF, contrib)
                cand = jnp.maximum(endp, contrib)
                Lvec = jnp.where(group_id == st, cand, Lvec)
            # phase 3: apply the cross-segment term (suppressed
            # at/after the pin) and re-assert the pin
            if pins:
                sup = (pis > 0) & (pinkf <= segstart)  # pin at j == 0
                hf = []
                for j in range(SEG):
                    fixv = jnp.where(sup, MINF, Lvec - (j + 1) * g32)
                    hj = jnp.maximum(hs[j], fixv)
                    hj = jnp.where(_at(pin_mask, j), pinf, hj)
                    if j + 1 < SEG:
                        sup = sup | (pinkf == segstart + j + 1)
                    hf.append(hj)
                Hc = jnp.stack(hf)
            else:
                Hc = jnp.maximum(Hstk, Lvec[None] - (jio + g32))
            bv = bvf_ref[:]
            upd = Hc > bv
            if varlen:
                actf = y <= lensf
                upd = upd & actf[None]
            bvf_ref[:] = jnp.where(upd, Hc, bv)
            rbf_ref[:] = jnp.where(upd, r, rbf_ref[:])
            if varlen:
                # freeze the carried band past the pair's final row
                Hc = jnp.where(actf[None], Hc, prev_a)
            h0 = _at(Hc, 0)
            prevx_ref[pl.ds(0, SEG)] = Hc
            prevx_ref[pl.ds(SEG, 1)] = jnp.where(
                sub_i >= 8 - S, 0, pltpu.roll(h0, gshift, axis=0)
            )[None]
            if with_history:
                hrow_ref[0] = Hc

                @pl.when(r < K - 1)
                def _():
                    copy = pltpu.make_async_copy(
                        hrow_ref, hist_ref.at[pl.ds(r, 1)], sem
                    )
                    copy.start()
                    copy.wait()

            return 0

        return row_body

    pin_possible = jnp.min(base) <= 1

    @pl.when(pin_possible)
    def _():
        jax.lax.fori_loop(0, K, make_row_body(True), 0)

    @pl.when(jnp.logical_not(pin_possible))
    def _():
        jax.lax.fori_loop(0, K, make_row_body(False), 0)

    def ring_reduce(vals, better_fn):
        """Merge per-group candidates across all G groups (wrap rolls
        preserve the pair sub-row, only groups mix)."""
        for _ in range(G - 1):
            rolled = [pltpu.roll(v, S, axis=0) for v in vals]
            bet = better_fn(rolled, vals)
            vals = [jnp.where(bet, rv, v) for rv, v in zip(rolled, vals)]
        return vals

    # --- endpoint reduce (row-major first max; explicit slot tie-break
    # for the cross-group merge) ---
    best_v, best_r, best_k = zero8, zero8, zero8
    for j in range(SEG):
        bk = bvf_ref[j]
        rk = rbf_ref[j]
        better = (bk > best_v) | ((bk == best_v) & (rk < best_r))
        best_v = jnp.where(better, bk, best_v)
        best_r = jnp.where(better, rk, best_r)
        best_k = jnp.where(better, _at(kio3, j), best_k)

    def ep_better(rolled, cur):
        rv, rr, rk = rolled
        cv, cr, ck = cur
        return (rv > cv) | (
            (rv == cv) & ((rr < cr) | ((rr == cr) & (rk < ck)))
        )

    best_v, best_r, best_k = ring_reduce(
        [best_v, best_r, best_k], ep_better
    )
    sl_ = lambda x: jax.lax.slice_in_dim(x, 0, S, axis=0)
    bv_s, br_s, bk_s = sl_(best_v), sl_(best_r), sl_(best_k)
    upd = bv_s > state_ref[1]
    maxg = jnp.where(upd, bv_s, state_ref[1])
    end_y = jnp.where(upd, y0 + br_s + 1, state_ref[2])
    end_j = jnp.where(upd, base + br_s + bk_s, state_ref[3])
    cutoff = maxg - X32
    cutofff = jnp.concatenate([cutoff] * G, axis=0)

    # --- X-drop zeroing + dead test + first-argmax (folded), the
    # zeroed row unfolded into the barrel scratch ---
    ra_ref[pl.ds(0, D)] = jnp.zeros((D, S, LANE), jnp.int32)
    ra_ref[pl.ds(D + W, D)] = jnp.zeros((D, S, LANE), jnp.int32)
    am_v, am_k = zero8, zero8
    for j in range(SEG):
        c = prevx_ref[j]
        z = jnp.where(c < cutofff, 0, c)
        if with_history:
            hrow_ref[0, pl.ds(j, 1)] = z[None]
        for g in range(G):
            ra_ref[pl.ds(D + g * SEG + j, 1)] = jax.lax.slice_in_dim(
                z, g * S, (g + 1) * S, axis=0
            )[None]
        am_upd = z > am_v
        am_v = jnp.where(am_upd, z, am_v)
        am_k = jnp.where(am_upd, _at(kio3, j), am_k)

    def am_better(rolled, cur):
        rv, rk = rolled
        cv, ck = cur
        return (rv > cv) | ((rv == cv) & (rk < ck))

    am_v, am_k = ring_reduce([am_v, am_k], am_better)
    if with_history:
        copy = pltpu.make_async_copy(
            hrow_ref, hist_ref.at[pl.ds(K - 1, 1)], sem
        )
        copy.start()
        copy.wait()
    alive = (sl_(am_v) > 0).astype(jnp.int32)
    delta = jnp.clip(sl_(am_k) - W // 2, -D, D) * alive

    # --- realign barrel: _block_kernel's unfolded code verbatim ---
    u = delta + D
    nbits = max(1, (2 * D).bit_length())
    span = W + 2 * D
    for i in range(nbits):
        sh = 1 << i
        bit = ((u >> i) & 1) > 0
        for p0 in range(0, span - sh, CHUNK):
            cw = min(CHUNK, span - sh - p0)
            a = ra_ref[pl.ds(p0, cw)]
            b = ra_ref[pl.ds(p0 + sh, cw)]
            ra_ref[pl.ds(p0, cw)] = jnp.where(bit[None], b, a)
    carried_out[pl.ds(0, W)] = ra_ref[pl.ds(0, W)]

    state_out[:] = jnp.stack(
        [
            base + (jnp.int32(K) + delta) * alive,
            maxg,
            end_y,
            end_j,
            alive,
            delta,
        ]
    )


@functools.partial(
    jax.jit,
    static_argnames=("W", "K", "X", "match", "mismatch", "gap", "D",
                     "table", "with_history", "G"),
)
def _block_call_folded(
    y0, qbf, twf, carried, state4, W, K, X, match, mismatch, gap, D,
    table, with_history, G, lens=None,
):
    S = carried.shape[1]
    varlen = lens is not None
    SEG = W // G
    out_shape = [
        jax.ShapeDtypeStruct((W, S, LANE), jnp.int32),
        jax.ShapeDtypeStruct((6, S, LANE), jnp.int32),
    ]
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_specs = [vmem, vmem]
    scratch = []
    if with_history:
        out_shape.append(
            jax.ShapeDtypeStruct((K, SEG, 8, LANE), jnp.int32)
        )
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        scratch += [
            pltpu.VMEM((1, SEG, 8, LANE), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ]
    scratch += [
        pltpu.VMEM((SEG + 1, 8, LANE), jnp.int32),  # prev_ext
        pltpu.VMEM((SEG, 8, LANE), jnp.int32),  # per-slot block max
        pltpu.VMEM((SEG, 8, LANE), jnp.int32),  # its first row
        pltpu.VMEM((W + 2 * D, S, LANE), jnp.int32),  # realign barrel
    ]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        vmem, vmem, vmem, vmem,
    ]
    args = [y0, qbf, twf, carried, state4]
    if varlen:
        in_specs.append(vmem)
        args.append(lens)
    return pl.pallas_call(
        functools.partial(
            _block_kernel_folded,
            W=W, K=K, X=X, match=match, mismatch=mismatch, gap=gap, D=D,
            table=table, with_history=with_history, G=G, varlen=varlen,
        ),
        out_shape=tuple(out_shape),
        in_specs=tuple(in_specs),
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
    )(*args)


def _fold_G(S: int, W: int, go) -> int:
    """Sublane fold factor for the block kernel: G segments of W/G
    slots when the batch fills S < 8 sublane rows (linear only — the
    affine E/H coupled chain keeps the straight layout)."""
    if go is not None or S >= 8 or 8 % S:
        return 1
    G = 8 // S
    return G if W % G == 0 and W // G >= 2 else 1


@functools.partial(
    jax.jit,
    static_argnames=(
        "W", "K", "X", "match", "mismatch", "gap", "D", "table",
        "with_history", "go", "ge",
    ),
)
def _block_call(
    y0, qb, twin, carried, state4, W, K, X, match, mismatch, gap, D,
    table, with_history, go=None, ge=None, lens=None,
):
    S = qb.shape[1]
    varlen = lens is not None
    CW = 2 * W if go is not None else W  # affine carries (H, F)
    out_shape = [
        jax.ShapeDtypeStruct((CW, S, LANE), jnp.int32),
        jax.ShapeDtypeStruct((6, S, LANE), jnp.int32),
    ]
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_specs = [vmem, vmem]
    scratch = []
    if with_history:
        out_shape.append(jax.ShapeDtypeStruct((K, W, S, LANE), jnp.int32))
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        scratch += [
            pltpu.VMEM((1, W, S, LANE), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ]
    scratch += [
        pltpu.VMEM((CW + (2 if go is not None else 1), S, LANE),
                   jnp.int32),  # prev H (+F) rows
        pltpu.VMEM((W, S, LANE), jnp.int32),  # per-slot block max
        pltpu.VMEM((W, S, LANE), jnp.int32),  # its first row
        pltpu.VMEM((W + 2 * D, S, LANE), jnp.int32),  # realign barrel
    ]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        vmem, vmem, vmem, vmem,
    ]
    args = [y0, qb, twin, carried, state4]
    if varlen:
        in_specs.append(vmem)
        args.append(lens)
    outs = pl.pallas_call(
        functools.partial(
            _block_kernel,
            W=W, K=K, X=X, match=match, mismatch=mismatch, gap=gap, D=D,
            table=table, with_history=with_history, go=go, ge=ge,
            varlen=varlen,
        ),
        out_shape=tuple(out_shape),
        in_specs=tuple(in_specs),
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
    )(*args)
    return outs


#: front guard of the padded target rows — covers the most negative
#: corridor base (1 - W/2 >= -63 for W <= 128)
T_GUARD = 64


def _gather_kernel(base_ref, trows_ref, out_ref, *, ppg, rpp, Lp):
    """Per-pair 128-char corridor window via the two-row funnel shift
    (the probed refill pattern, see banded_batch.py:169-186): each
    pair's window [off, off+128) is assembled from the two aligned
    128-char rows around ``off`` with dynamic pltpu.roll — Mosaic cannot
    dynamic-slice along lanes. XLA's own per-pair gathers lower to a
    ~10 ns/element scalar loop (measured: 1.3 ms for what this kernel
    does in ~15 us), which is why this kernel exists."""
    g = pl.program_id(0)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
    for p in range(ppg):
        off = base_ref[g * ppg + p] - 1 + T_GUARD
        off = jnp.clip(off, 0, Lp - 2 * LANE)
        rowi = p * rpp + (off >> 7)
        rem = off & (LANE - 1)
        sh = (LANE - rem) & (LANE - 1)
        r0 = pltpu.roll(trows_ref[pl.ds(rowi, 1)], sh, axis=1)
        r1 = pltpu.roll(trows_ref[pl.ds(rowi + 1, 1)], sh, axis=1)
        out_ref[pl.ds(p, 1)] = jnp.where(lane1 < (LANE - rem), r0, r1)


@functools.partial(jax.jit, static_argnames=("ppg", "rpp", "Lp"))
def _gather_call(base_flat, trows, ppg, rpp, Lp):
    Bp = base_flat.shape[0]
    grid = Bp // ppg
    return pl.pallas_call(
        functools.partial(_gather_kernel, ppg=ppg, rpp=rpp, Lp=Lp),
        out_shape=jax.ShapeDtypeStruct((Bp, LANE), jnp.int32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (ppg * rpp, LANE), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (ppg, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
    )(base_flat, trows)


def _gather_twin(trows, base_flat, C, m, ppg, rpp, Lp):
    """[B, C] corridor char window: twin[:, c] = t[base + c - 1] with
    out-of-sequence positions -1 (pads always mismatch). The padded rows
    carry the -1s; the only inexact case is the high clamp in the
    kernel, which can fire only when base >= m + 2 — i.e. when every
    window position is out of sequence — masked here."""
    win = _gather_call(base_flat, trows, ppg, rpp, Lp)
    win = jnp.where(base_flat[:, None] >= m + 2, -1, win)
    return win[:, :C]


@functools.partial(
    jax.jit,
    static_argnames=(
        "n", "m", "W", "K", "X", "match", "mismatch", "gap", "D",
        "table", "with_history", "ppg", "rpp", "Lp", "early_exit",
        "go", "ge",
    ),
)
def _banded_block_impl(
    qT, trows, n, m, W, K, X, match, mismatch, gap, D, table,
    with_history, ppg, rpp, Lp, early_exit=True, go=None, ge=None,
    lens_q=None,
):
    """Full forward: lax.while_loop over blocks, early exit when every
    pair is done. Carries are frozen per pair via the done mask — the
    batched equivalent of the oracle's per-pair break. ``lens_q``
    ([S, L] int32, optional): per-pair query lengths — pairs freeze at
    their own final row (kernel commit masks) and are done once their
    last block has run."""
    nS, S, L = qT.shape
    C = K + W - 1
    NBf, K_tail = n // K, n % K
    NB = NBf + (1 if K_tail else 0)
    base0 = 1 - W // 2
    affine = go is not None
    G = _fold_G(S, W, go)  # >1: small-batch folded fast path
    SEG = W // G
    EFD = -(2**28)
    j0s = base0 - 1 + np.arange(W)
    if affine:
        chain0 = np.where(j0s == 0, X, X - go - (j0s - 1) * ge)
        carried0 = np.where(j0s >= 0, np.maximum(chain0, 0), 0)
        carried0 = np.concatenate(
            [carried0, np.full(W, EFD)]
        ).astype(np.int32)
    else:
        carried0 = np.where(j0s >= 0, X - j0s * gap, 0)
        carried0 = np.maximum(carried0, 0).astype(np.int32)
    CW = carried0.shape[0]
    carried = jnp.broadcast_to(
        jnp.asarray(carried0)[:, None, None], (CW, S, L)
    ).astype(jnp.int32)
    state = jnp.stack(
        [
            jnp.full((S, L), base0, jnp.int32),
            jnp.full((S, L), X, jnp.int32),
            jnp.zeros((S, L), jnp.int32),
            jnp.zeros((S, L), jnp.int32),
        ]
    )
    done = jnp.zeros((S, L), jnp.int32)
    n_rows = jnp.zeros((S, L), jnp.int32)
    bases = jnp.zeros((max(NB, 1), S, L), jnp.int32)
    deltas = jnp.zeros((max(NB, 1), S, L), jnp.int32)
    if with_history:
        hist = (
            jnp.zeros((n, SEG, 8, L), jnp.int32)
            if G > 1
            else jnp.zeros((n, W, S, L), jnp.int32)
        )
    else:
        hist = jnp.zeros((1, 1, 1, 1), jnp.int32)

    def run_block(b, Kb, carried, state, done, n_rows, bases, deltas, hist):
        y0 = (b * K).astype(jnp.int32).reshape(1)
        qb = jax.lax.dynamic_slice(qT, (b * K, 0, 0), (Kb, S, L))
        win = _gather_twin(
            trows, state[0].reshape(-1), Kb + W - 1, m, ppg, rpp, Lp
        )
        if G > 1:
            # folded staging: pairs' q rows tiled across the G sublane
            # groups; target window re-sliced so row (c', g*S+s) holds
            # the char of slot g*SEG + (c' - r) — both pure relayouts
            qbf = jnp.tile(qb, (1, G, 1))
            Cf = Kb + SEG - 1
            win3 = win.T.reshape(Kb + W - 1, S, L)
            twf = jnp.stack(
                [win3[g * SEG : g * SEG + Cf] for g in range(G)], axis=1
            ).reshape(Cf, 8, L)
            outs = _block_call_folded(
                y0, qbf, twf, carried, state, W, Kb, X, match, mismatch,
                gap, D, table, with_history, G, lens=lens_q,
            )
        else:
            twin = win.T.reshape(Kb + W - 1, S, L)
            outs = _block_call(
                y0, qb, twin, carried, state, W, Kb, X, match, mismatch,
                gap, D, table, with_history, go=go, ge=ge, lens=lens_q,
            )
        c_new, st_new = outs[0], outs[1]
        dmask = done > 0
        bases = jax.lax.dynamic_update_slice(
            bases, state[0][None], (b, 0, 0)
        )
        # the oracle zeroes delta whenever the pair is done after this
        # block — dead band OR the final block (n_rows >= n, per-pair
        # lens when varlen)
        last = (
            b * K + Kb >= n
            if lens_q is None
            else b * K + Kb >= lens_q
        )
        deltas = jax.lax.dynamic_update_slice(
            deltas,
            jnp.where(dmask | last | (st_new[4] == 0), 0, st_new[5])[None],
            (b, 0, 0),
        )
        carried = jnp.where(dmask[None], carried, c_new)
        state = jnp.where(dmask[None], state, st_new[:4])
        nr_blk = (
            b * K + Kb
            if lens_q is None
            else jnp.minimum(b * K + Kb, lens_q)
        )
        n_rows = jnp.where(dmask, n_rows, nr_blk)
        done = done | ((st_new[4] == 0) | last).astype(jnp.int32)
        if with_history:
            dm = (
                jnp.concatenate([dmask] * G, axis=0)
                if G > 1
                else dmask
            )
            hist = jax.lax.dynamic_update_slice(
                hist,
                jnp.where(dm[None, None], 0, outs[2]),
                (b * K, 0, 0, 0),
            )
        return carried, state, done, n_rows, bases, deltas, hist

    def cond(c):
        b = c[0]
        if not early_exit:
            # timing mode: the salted bench chain mutates chars, which
            # would X-drop the batch and dishonestly skip blocks — run
            # every block; on live workloads this equals production work
            return b < NBf
        return (b < NBf) & jnp.any(c[3] == 0)

    def body(c):
        b, carried, state, done, n_rows, bases, deltas, hist = c
        out = run_block(
            b, K, carried, state, done, n_rows, bases, deltas, hist
        )
        return (b + 1,) + out

    if NBf:
        c = jax.lax.while_loop(
            cond,
            body,
            (jnp.int32(0), carried, state, done, n_rows, bases, deltas, hist),
        )
        _, carried, state, done, n_rows, bases, deltas, hist = c
    if K_tail:
        carried, state, done, n_rows, bases, deltas, hist = run_block(
            jnp.int32(NBf), K_tail, carried, state, done, n_rows, bases,
            deltas, hist,
        )
    score = state[1] - X
    if with_history and G > 1:
        # unfold the folded history rows back to the [n, W, S, L]
        # contract (slot k = g*SEG + j lived at row j, sublane group g)
        hist = (
            hist.reshape(n, SEG, G, S, L)
            .transpose(0, 2, 1, 3, 4)
            .reshape(n, W, S, L)
        )
    return score, state[2], state[3], n_rows, bases, deltas, hist


def _prep(qs, ts, q_fill=0, lens_t=None):
    """Pad the batch to a whole number of 128-lane rows and stage the
    device layouts: the transposed query (pair p = s * 128 + lane) and
    the guarded 128-char target rows the gather kernel funnels from
    (pair p's char j at row p*rpp + (j + T_GUARD)//128; -1 outside
    [0, m)). ``lens_t``: per-pair target lengths — chars past a pair's
    length become -1 (always-mismatch pads), which is exactly the
    oracle's pad-scoring rule for j > len_t."""
    qs = np.ascontiguousarray(np.asarray(qs, dtype=np.int32))
    ts = np.ascontiguousarray(np.asarray(ts, dtype=np.int32))
    B, n = qs.shape
    m = ts.shape[1]
    if lens_t is not None:
        lt = np.asarray(lens_t, dtype=np.int64)
        ts = ts.copy()
        ts[np.arange(m)[None, :] >= lt[:, None]] = -1
    Bp = -(-B // LANE) * LANE
    if Bp != B:
        # pad pairs: valid q chars vs all-invalid t chars -> the pad
        # pairs' bands decay and die within ~X/gap rows (early exit)
        qs = np.concatenate(
            [qs, np.full((Bp - B, n), q_fill, np.int32)]
        )
        ts = np.concatenate([ts, np.full((Bp - B, m), -1, np.int32)])
    S = Bp // LANE
    qT = qs.T.reshape(n, S, LANE)
    # guarded rows: the high clamp in the gather kernel must only fire
    # when base >= m + 2 (every window char out of sequence), which
    # needs Lp >= T_GUARD + m + 2*128
    rpp = -(-(T_GUARD + m + 2 * LANE) // LANE)
    Lp = rpp * LANE
    trows = np.full((Bp, Lp), -1, dtype=np.int32)
    trows[:, T_GUARD : T_GUARD + m] = ts
    trows = trows.reshape(Bp * rpp, LANE)
    # pairs per gather grid step: largest tile whose target rows fit a
    # ~2 MB VMEM slice (long targets get more, smaller steps)
    ppg = 128
    while ppg > 1 and ppg * rpp * LANE * 4 > 2 * 1024 * 1024:
        ppg //= 2
    if ppg * rpp * LANE * 4 > 8 * 1024 * 1024:
        # one pair's rows alone exceed a sane VMEM slice (~8 Mbp target)
        raise ValueError(
            f"target length {m} too long for the gather kernel's VMEM "
            "window; shard the target (parallel/longpair) instead"
        )
    return jnp.asarray(qT), jnp.asarray(trows), B, S, n, m, ppg, rpp, Lp


def banded_block_batch_pallas(
    qs,
    ts,
    match: int = 1,
    mismatch: int = 1,
    gap: int = 1,
    width: int = 64,
    block: int = 32,
    x_threshold: int = 70,
    dmax: Optional[int] = None,
    matrix=None,
    with_history: bool = False,
    with_meta: bool = False,
    gap_open: Optional[int] = None,
    gap_extend: Optional[int] = None,
    lens_q=None,
    lens_t=None,
) -> BandedBlockBatchResult:
    """Batched block-adaptive banded X-drop forward pass.

    qs [B, n] / ts [B, m] int codes (uniform lengths; any alphabet with
    ``matrix``, 0-3 DNA without). Bit-exact per pair against
    ``oracle.banded_block.banded_xdrop_block`` (linear) /
    ``banded_xdrop_block_affine`` (``gap_open != gap_extend``; history
    stays H-only, E/F host-reconstructible) with the same
    (width, block, x_threshold, dmax). ``with_meta`` also returns the
    per-block bases/deltas; ``with_history`` the int32 band history
    [n, W, B] for the host walker.
    """
    W, K, X = int(width), int(block), int(x_threshold)
    if gap_open is not None and gap_open == gap_extend:
        gap, gap_open, gap_extend = gap_open, None, None  # exactly linear
    if W % CHUNK:
        raise ValueError(f"width must be a multiple of {CHUNK}")
    D = (min(K, W // 2) if dmax is None else int(dmax))
    if D < 1:
        raise ValueError("dmax must be >= 1")
    if K + W > LANE + 1:
        raise ValueError(
            f"block + width must be <= {LANE + 1} (the gather window)"
        )
    table = None if matrix is None else _packed_banded_table(matrix)
    if (lens_q is not None or lens_t is not None) and gap_open is not None:
        raise NotImplementedError(
            "affine block tier does not take per-pair lens yet"
        )
    qT, trows, B, S, n, m, ppg, rpp, Lp = _prep(qs, ts, lens_t=lens_t)
    lq_dev = None
    if lens_q is not None:
        lq = np.asarray(lens_q, dtype=np.int32)
        lq_pad = np.full(S * LANE, n, np.int32)
        lq_pad[:B] = lq
        lq_dev = jnp.asarray(lq_pad.reshape(S, LANE))
    score, end_y, end_j, n_rows, bases, deltas, hist = _banded_block_impl(
        qT, trows, n, m, W, K, X, int(match), int(mismatch), int(gap), D,
        table, bool(with_history), ppg, rpp, Lp,
        go=None if gap_open is None else int(gap_open),
        ge=None if gap_extend is None else int(gap_extend),
        lens_q=lq_dev,
    )
    sl = lambda a: np.asarray(a).reshape(a.shape[:-2] + (-1,))[..., :B]
    hist_np = None
    if with_history:
        hist_np = np.asarray(hist).reshape(n, W, -1)[..., :B]
        if lens_q is not None:
            hist_np = hist_np.copy()  # device arrays map read-only
            # mid-block enders: apply the final row's X-drop zeroing
            # (cutoff = final global max - X = the pair's score); a
            # no-op for rows the kernel already zeroed at block end
            sc = sl(score)
            nr = sl(n_rows)
            for pp in range(B):
                if nr[pp] > 0:
                    row = hist_np[nr[pp] - 1, :, pp]
                    row[row < sc[pp]] = 0
    return BandedBlockBatchResult(
        score=sl(score),
        end_y=sl(end_y),
        end_j=sl(end_j),
        n_rows=sl(n_rows),
        bases=sl(bases) if with_meta else None,
        deltas=sl(deltas) if with_meta else None,
        band_history=hist_np,
    )


def banded_block_traceback_host(
    res: BandedBlockBatchResult,
    qs,
    ts,
    match: int = 1,
    mismatch: int = 1,
    gap: int = 1,
    block: int = 32,
    x_threshold: int = 70,
    matrix=None,
    gap_open: Optional[int] = None,
    gap_extend: Optional[int] = None,
) -> List[List[Tuple[int, int]]]:
    """Host walk over a with_history+with_meta forward result: the
    oracle's shared walker per pair (paths bit-equal to the oracle).
    Affine results (gap_open != gap_extend) walk the Gotoh three-state
    path over host-reconstructed E/F bands."""
    from swtpu.oracle.banded_block import (
        walk_block_history,
        walk_block_history_affine,
    )

    if gap_open is not None and gap_open == gap_extend:
        gap, gap_open, gap_extend = gap_open, None, None
    qs = np.asarray(qs)
    ts = np.asarray(ts)
    K = int(block)
    paths = []
    for p in range(len(res.score)):
        nr = int(res.n_rows[p])
        rb = (
            res.bases[(np.arange(nr)) // K, p]
            + (np.arange(nr) % K)
        )
        if gap_open is not None:
            paths.append(
                walk_block_history_affine(
                    res.band_history[:nr, :, p], rb,
                    (int(res.end_y[p]), int(res.end_j[p])),
                    qs[p], ts[p], match=match, mismatch=mismatch,
                    gap_open=gap_open, gap_extend=gap_extend,
                    x_threshold=x_threshold, matrix=matrix,
                )
            )
            continue
        paths.append(
            walk_block_history(
                res.band_history[:nr, :, p],
                rb,
                (int(res.end_y[p]), int(res.end_j[p])),
                qs[p],
                ts[p],
                match=match,
                mismatch=mismatch,
                gap=gap,
                x_threshold=x_threshold,
                matrix=matrix,
            )
        )
    return paths


MINF = jnp.int32(-(2**30))


@functools.partial(
    jax.jit,
    static_argnames=(
        "n", "m", "W", "K", "X", "match", "mismatch", "gap", "D",
        "table", "ppg", "rpp", "Lp", "max_steps", "b_real",
    ),
)
def _block_fwd_walk_impl(
    qT, trows, n, m, W, K, X, match, mismatch, gap, D, table,
    ppg, rpp, Lp, max_steps, b_real=None, lens_q=None,
):
    """Block-tier forward + DEVICE traceback walk (linear gaps).

    Same motive as the per-round device walker
    (kernels/xla/banded_scan.py::_banded_fwd_walk_impl): at 16K geometry
    the history fetch costs ~4x the forward over the ~25 MB/s tunnel, so
    the walk replays walk_block_history's rules on the HBM-resident
    history and ships only the 2-bit move wire (decoded by the C++
    decode_move_wire). Moves 0=diag/1=up/2=left/3=done, tie-break
    diag -> up -> left; bit-equal to the host walker (tested).
    """
    score, end_y, end_j, n_rows, bases, _, hist = _banded_block_impl(
        qT, trows, n, m, W, K, X, match, mismatch, gap, D, table,
        True, ppg, rpp, Lp, lens_q=lens_q,
    )
    S = qT.shape[1]
    Bp = S * LANE
    # the walk is plain XLA over [B]-vector gathers whose cost SCALES
    # with B (TPU gathers are near-serial) — slice every walked buffer
    # to the real pairs (contiguous: pair p = s*128 + lane) so a batch-8
    # workload doesn't pay the full padded lane row
    B = Bp if b_real is None else int(b_real)
    score = score.reshape(Bp)[:B]
    end_y = end_y.reshape(Bp)[:B]
    end_j = end_j.reshape(Bp)[:B]
    n_rows = n_rows.reshape(Bp)[:B]
    bases_f = bases.reshape(bases.shape[0], Bp)[:, :B]
    flat = hist.reshape(n, W, Bp)[:, :, :B].reshape(-1)
    q_f = qT.reshape(n, Bp)[:, :B].reshape(-1)  # [(y-1) * B + pair]
    t_f = trows.reshape(Bp, Lp)[:B].reshape(-1)
    # [pair * Lp + T_GUARD + j - 1]
    bidx = jnp.arange(B, dtype=jnp.int32)
    g32 = jnp.int32(gap)
    X32 = jnp.int32(X)

    def val(raw, y, j, k, nr):
        """walk_block_history.get as vector ops: in-band cells read the
        history (0 = dead -> MINF); the y == 0 row and the out-of-band
        column 0 read the boundary gap chains. The final row applies
        the block-end X-drop cutoff (cutoff == the pair's score in
        offset space) — a no-op when the kernel already zeroed it
        (uniform lengths), the required fixup for per-pair mid-block
        enders (varlen)."""
        raw = jnp.where((y == nr) & (raw < score), 0, raw)
        in_band = (y >= 1) & (y <= nr) & (k >= 0) & (k < W)
        chain0 = X32 - j * g32  # y == 0 top chain
        top = jnp.where(
            (j >= 0) & ((chain0 > 0) | (j == 0)), chain0, MINF
        )
        chainc = X32 - y * g32  # column-0 chain (only rows <= n_rows)
        col0 = jnp.where(
            (j == 0) & (chainc > 0) & (y >= 1) & (y <= nr), chainc, MINF
        )
        v = jnp.where(raw != 0, raw, MINF)
        return jnp.where(
            y == 0, top, jnp.where(in_band, v, col0)
        )

    def step(carry, _):
        i, j, v, qwin, twin, done, ok, nsteps = carry
        # row bases of rows i-1 and i (one 2-wide gather on bases;
        # row_base[y-1] = bases[(y-1)//K] + (y-1)%K, tail block included)
        yc = jnp.clip(jnp.stack([i - 1, i], axis=-1) - 1, 0, n - 1)
        rb = (
            jnp.take(
                bases_f.reshape(-1), (yc // K) * B + bidx[:, None], axis=0
            )
            + yc % K
        )
        rb_im1, rb_i = rb[:, 0], rb[:, 1]
        # diag/up live on history row i-2 at adjacent slots (2-wide)
        k_d = (j - 1) - rb_im1
        k_u = k_d + 1
        base_d = jnp.clip(i - 2, 0, n - 1) * W * B + bidx
        du = jnp.take(
            flat,
            jnp.stack(
                [
                    base_d + jnp.clip(k_d, 0, W - 1) * B,
                    base_d + jnp.clip(k_u, 0, W - 1) * B,
                ],
                axis=-1,
            ),
            axis=0,
        )
        k_l = (j - 1) - rb_i
        lf = jnp.take(
            flat,
            jnp.clip(i - 1, 0, n - 1) * W * B
            + jnp.clip(k_l, 0, W - 1) * B
            + bidx,
            axis=0,
        )
        diag_v = val(du[:, 0], i - 1, j - 1, k_d, n_rows)
        up_v = val(du[:, 1], i - 1, j, k_u, n_rows)
        left_v = val(lf, i, j - 1, k_l, n_rows)

        yc_ = qwin[:, 0]
        xc_ = twin[:, 0]
        if table is None:
            s = jnp.where(
                (yc_ >= 0) & (xc_ >= 0) & (yc_ == xc_), match, -mismatch
            )
        else:
            s = _table_lookup(yc_, xc_, table)
        can_d = (i > 0) & (j > 0) & (diag_v > MINF) & (diag_v + s == v)
        can_u = (i > 0) & (up_v > MINF) & (up_v - g32 == v)
        can_l = (j > 0) & (left_v > MINF) & (left_v - g32 == v)
        at0 = (i == 0) & (j == 0)
        bad = ~(done | at0 | can_d | can_u | can_l)
        move = jnp.where(
            done | at0 | bad,
            3,
            jnp.where(can_d, 0, jnp.where(can_u, 1, 2)),
        ).astype(jnp.uint8)
        ok = ok & ~bad
        stepped = move < 3
        dec_i = stepped & ((move == 0) | (move == 1))
        dec_j = stepped & ((move == 0) | (move == 2))
        ni = i - dec_i.astype(jnp.int32)
        nj = j - dec_j.astype(jnp.int32)
        nv = jnp.where(
            move == 0,
            diag_v,
            jnp.where(move == 1, up_v, jnp.where(move == 2, left_v, v)),
        )
        pop = lambda a: jnp.concatenate([a[:, 1:], a[:, -1:]], axis=1)
        qwin = jnp.where(dec_i[:, None], pop(qwin), qwin)
        twin = jnp.where(dec_j[:, None], pop(twin), twin)
        return (
            ni, nj, nv, qwin, twin, done | at0 | bad, ok,
            nsteps + stepped.astype(jnp.int32),
        ), move

    # chunked early-exit walk + 2-bit packing: the per-round device
    # walker's scheme verbatim (banded_scan.py:479-531)
    CH = 64
    Sc = -(-max_steps // CH) * CH
    shifts = (jnp.arange(4, dtype=jnp.uint8) * 2)[None, None, :]
    buf0 = jnp.full((B, Sc // 4), 255, jnp.uint8)
    koff = jnp.arange(CH, dtype=jnp.int32)[None, :]

    def chunk_body(state):
        carry, buf, c = state
        i, j, v, _, _, done, ok, nsteps = carry
        qwin = jnp.take(
            q_f,
            jnp.clip(i[:, None] - 1 - koff, 0, n - 1) * B + bidx[:, None],
            axis=0,
        )
        twin = jnp.take(
            t_f,
            bidx[:, None] * Lp
            + jnp.clip(T_GUARD + j[:, None] - 1 - koff, 0, Lp - 1),
            axis=0,
        )
        carry = (i, j, v, qwin, twin, done, ok, nsteps)
        carry, mv = jax.lax.scan(step, carry, None, length=CH, unroll=8)
        packed = (
            (mv.T.reshape(B, CH // 4, 4) << shifts).sum(
                axis=-1, dtype=jnp.uint8
            )
        )
        buf = jax.lax.dynamic_update_slice(buf, packed, (0, c * (CH // 4)))
        return carry, buf, c + 1

    def chunk_cond(state):
        carry, _, c = state
        return (c < Sc // CH) & jnp.any(~carry[5])

    at_origin = (end_y == 0) & (end_j == 0)
    carry0 = (
        end_y, end_j, score + X32,
        jnp.zeros((B, CH), jnp.int32), jnp.zeros((B, CH), jnp.int32),
        at_origin, jnp.ones((B,), bool), jnp.zeros(B, jnp.int32),
    )
    (fi, fj, _, _, _, _, ok, nsteps), buf, _ = jax.lax.while_loop(
        chunk_cond, chunk_body, (carry0, buf0, jnp.int32(0))
    )
    ok = ok & (((fi == 0) & (fj == 0)) | at_origin)
    meta = jnp.stack(
        [score, end_y, end_j, nsteps, ok.astype(jnp.int32)], axis=1
    )
    meta8 = jax.lax.bitcast_convert_type(meta, jnp.uint8).reshape(B, 20)
    return jnp.concatenate([meta8, buf], axis=1)


def banded_block_align_device(
    qs,
    ts,
    match: int = 1,
    mismatch: int = 1,
    gap: int = 1,
    width: int = 64,
    block: int = 32,
    x_threshold: int = 70,
    dmax: Optional[int] = None,
    matrix=None,
    lens_q=None,
    lens_t=None,
):
    """Block-tier forward AND traceback on device: only scores + 2-bit
    move wires cross the host link. Paths bit-equal to
    banded_block_traceback_host / the oracle (tested). Returns
    [(score, path)] per pair, path in the oracle's 1-based (y, j)
    origin -> endpoint convention."""
    from swtpu.kernels.xla.banded_scan import decode_device_walk

    W, K, X = int(width), int(block), int(x_threshold)
    D = (min(K, W // 2) if dmax is None else int(dmax))
    table = None if matrix is None else _packed_banded_table(matrix)
    qT, trows, B, S, n, m, ppg, rpp, Lp = _prep(qs, ts, lens_t=lens_t)
    lq_dev = None
    if lens_q is not None:
        lq_pad = np.full(S * LANE, n, np.int32)
        lq_pad[:B] = np.asarray(lens_q, dtype=np.int32)
        lq_dev = jnp.asarray(lq_pad.reshape(S, LANE))
    wire = _block_fwd_walk_impl(
        qT, trows, n, m, W, K, X, int(match), int(mismatch), int(gap),
        D, table, ppg, rpp, Lp, max_steps=n + m + 1, b_real=B,
        lens_q=lq_dev,
    )
    return decode_device_walk(np.asarray(wire))


def bench_forward_fn(
    qs,
    ts,
    match=1,
    mismatch=1,
    gap=1,
    width=64,
    block=32,
    x_threshold=70,
    dmax=None,
    matrix=None,
    with_history=False,
    gap_open=None,
    gap_extend=None,
):
    """(fn, devargs) for honest timing via swtpu.utils.time_kernel.

    fn(qT, t_dev) runs the full jitted forward (while_loop glue + per-
    block kernels) on pre-staged device arrays and returns [Bp] scores.
    """
    W, K, X = int(width), int(block), int(x_threshold)
    if gap_open is not None and gap_open == gap_extend:
        gap, gap_open, gap_extend = gap_open, None, None
    D = (min(K, W // 2) if dmax is None else int(dmax))
    table = None if matrix is None else _packed_banded_table(matrix)
    qT, trows, B, S, n, m, ppg, rpp, Lp = _prep(qs, ts)

    def fn(qT_d, t_d):
        return _banded_block_impl(
            qT_d, t_d, n, m, W, K, X, int(match), int(mismatch),
            int(gap), D, table, bool(with_history), ppg, rpp, Lp,
            early_exit=False,
            go=None if gap_open is None else int(gap_open),
            ge=None if gap_extend is None else int(gap_extend),
        )[0]

    return fn, (qT, trows)
