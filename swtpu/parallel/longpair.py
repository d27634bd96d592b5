"""Sequence-parallel long-pair alignment: one DP matrix across devices.

The domain's "context parallelism" (SURVEY.md §5 long-context): a single
huge Smith-Waterman matrix is split by *query strips* over the mesh's `sp`
axis; target columns are processed in blocks. Device d computes tile
(strip d, block b) at pipeline step s = d + b (a classic wavefront
pipeline), then passes its strip-boundary row — the reference's ``yoko``
strip boundary (source.cpp:126, 1000) lifted to the inter-chip level — to
device d+1 over ICI via ``ppermute``. The diagonal corner each tile needs
is simply the last element of the boundary row received one step earlier,
so the only communication is one [C]-row ppermute per step.

Tile internals use an anti-diagonal scan with explicit boundary-row/column
I/O so tiles compose exactly; the composed score is bit-equal to the
single-device oracle (tested on the virtual CPU mesh per SURVEY.md §4.7).

Any substitution matrix (uniform DNA, general 4x4, protein/BLOSUM62 —
scoring rides the same extended table as the batch engines); linear AND
affine (Gotoh) gaps — in the affine mode the F (vertical-gap) state
crosses strip boundaries, so the inter-device exchange carries stacked
(H, F) rows, while the E (horizontal-gap) state crosses column blocks and
stays device-local.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from swtpu.core.scoring import ScoringParams

NEGB = -(2**20)  # "outside the tile" marker


def _tile_profile(q_slot, table):
    """[R+1, stride] per-slot substitution profile: one gather per TILE
    instead of one per diagonal step (per-step gathers from a tiny table
    were the measured pathology behind the colscan rewrite — selects
    fuse, gathers don't)."""
    return table[q_slot]


def _prof_select(prof, t_diag, n_codes):
    """s[i] = prof[i, t_diag[i]] on the unbatched tile shape — the shared
    alphabet select tree (sw_scan.select_scores). Every extended-table
    column >= n_codes (pads / ghosts) is all-NEG, so the fall-through
    prof[:, -1] is exact for codes the tree skips."""
    from swtpu.kernels.xla.sw_scan import select_scores

    return select_scores(prof, t_diag, n_codes, init=prof[:, -1])


def _tile_colscan(q, t, top_row, left_col, corner, table, n_codes, gap):
    """One R x C linear-gap tile on the COLUMN-parallel schedule — the
    round-4 strip engine (VERDICT r3 #5: the anti-diagonal `_tile_scan`
    ran ~0.27 GCUPS/device at 4096^2, per-step-overhead-bound: its body
    carries dynamic slices that break XLA fusion, and it needs R+C scan
    steps of [R+1] work to cover R*C cells).

    Same contract and returns as `_tile_scan` (bit-equal, tested). The
    schedule is kernels/xla/colscan.py's: scan target positions; the
    whole query column lives in one vector; the intra-column vertical
    chain is the closed-form max-plus prefix (log-doubling over STATIC
    pad shifts — "De(con)struction of the lazy-F loop", arXiv:1909.00899).
    The body is pure elementwise/pad ops + one xs-sliced char per step:
    ONE fusion, C steps, unrolled 8x.

    Endpoint tie-break (row-major-first) is the family's deferred form:
    per-slot running max with strict '>' keeps each row's EARLIEST
    column; the final reduce takes max value then min slot (= min row).
    """
    R, C = q.shape[0], t.shape[0]
    stride = table.shape[0]
    iota = jnp.arange(R + 1)
    ghost_q, ghost_t = stride - 2, stride - 1
    q_slot = jnp.concatenate(
        [jnp.array([ghost_q], jnp.int32), jnp.minimum(q, ghost_q)]
    )
    prof = _tile_profile(q_slot, table)  # [R+1, stride]
    left_ext = jnp.concatenate([corner[None], left_col])  # [R+1]
    g32 = jnp.int32(gap)

    # prefix shift count: ceil(log2(R+1)) doublings cover the chain
    shifts = []
    sh = 1
    while sh <= R:
        shifts.append(sh)
        sh *= 2

    def step(carry, xs):
        hprev, best_vec, bestj_vec = carry
        t_j, top_j, j = xs
        s = _prof_select(prof, jnp.broadcast_to(t_j, (R + 1,)), n_codes)
        diag = jnp.concatenate([jnp.array([NEGB], jnp.int32), hprev[:-1]])
        pre = jnp.maximum(jnp.maximum(diag + s, hprev - g32), 0)
        # slot 0 is the top boundary value; it seeds the vertical chain
        pre = jnp.where(iota == 0, top_j, pre)
        h = pre
        for shv in shifts:
            shifted = jnp.concatenate(
                [jnp.full((shv,), NEGB, jnp.int32), h[:-shv]]
            )
            h = jnp.maximum(h, shifted - shv * g32)
        masked = jnp.where(iota > 0, h, NEGB)
        upd = masked > best_vec
        best_vec = jnp.where(upd, masked, best_vec)
        bestj_vec = jnp.where(upd, j, bestj_vec)
        return (h, best_vec, bestj_vec), h[R]

    init_vec = jnp.full((R + 1,), NEGB, jnp.int32)
    (hlast, best_vec, bestj_vec), bottom_row = jax.lax.scan(
        step,
        (left_ext, init_vec, jnp.zeros((R + 1,), jnp.int32)),
        (t, top_row, jnp.arange(1, C + 1)),
        unroll=8,
    )
    big = jnp.int32(1 << 30)
    vmax = best_vec.max()
    i_at = jnp.where(best_vec == vmax, iota, big).min()
    bj = jax.lax.dynamic_index_in_dim(bestj_vec, i_at, keepdims=False)
    zero = vmax <= 0
    best = jnp.maximum(vmax, 0)
    bi = jnp.where(zero, 0, i_at)
    bj = jnp.where(zero, 0, bj)
    return bottom_row, hlast[1:], best, bi, bj


def _tile_scan(q, t, top_row, left_col, corner, table, n_codes, gap):
    """One R x C tile of linear-gap local SW with explicit boundaries.

    q: [R] strip chars; t: [C] block chars (int32, alphabet codes);
    top_row: [C] = H[i0-1, j0 .. j0+C-1] (row above the tile);
    left_col: [R] = H[i0 .. i0+R-1, j0-1] (column left of the tile);
    corner: H[i0-1, j0-1]; table: [stride, stride] extended substitution
    scores (ghost/pad indices score _NEG, see sw_scan._extended_table);
    n_codes: real alphabet size (select-tree bound).
    Returns (bottom_row [C], right_col [R], best) where bottom_row is the
    tile's last row and right_col its last column.
    """
    R, C = q.shape[0], t.shape[0]
    stride = table.shape[0]
    iota = jnp.arange(R + 1)

    # Slot vector over i in [0, R]: slot 0 carries the top boundary row;
    # slots 1..R are tile rows. Local coords: cell (i, j), i in [1,R],
    # j in [1,C]; at diagonal d, slot i holds cell (i, d - i).
    ghost_q, ghost_t = stride - 2, stride - 1
    q_slot = jnp.concatenate(
        [jnp.array([ghost_q], jnp.int32), jnp.minimum(q, ghost_q)]
    )
    t_rev_pad = jnp.concatenate(
        [
            jnp.full((R + 1,), ghost_t, jnp.int32),
            jnp.minimum(t[::-1], ghost_t),
            jnp.full((R + 1,), ghost_t, jnp.int32),
        ]
    )
    prof = _tile_profile(q_slot, table)  # [R+1, stride]
    # extended left boundary: index i gives H[i0-1+i, j0-1]
    left_ext = jnp.concatenate([corner[None], left_col])  # [R+1]
    # extended top boundary: index j gives H[i0-1, j0-1+j]
    top_ext = jnp.concatenate([corner[None], top_row])  # [C+1]
    top_ext_pad = jnp.concatenate(
        [top_ext, jnp.full((R + 2,), NEGB, jnp.int32)]
    )

    big = jnp.int32(1 << 30)

    def step(carry, d):
        # No per-step reductions or dynamic extracts: the tile argmax is
        # deferred to a per-slot running max (strict '>' keeps the
        # earliest = smallest-j hit per slot; the final min-slot pick
        # reproduces the row-major-first rule), and the right column is
        # captured by a masked select (slot i holds cell (i, C) exactly
        # at diagonal d = C + i). Only the bottom row rides the scan
        # output, via a static slot-R extract.
        prev1, prev2, best_vec, bestj_vec, right_vec = carry
        # chars for slot i: t[(d - i) - 1] = t_rev[C - d + i]
        off = C - d + R + 1
        t_diag = jax.lax.dynamic_slice_in_dim(t_rev_pad, off, R + 1)
        s = _prof_select(prof, t_diag, n_codes)

        shift1 = lambda x: jnp.concatenate(
            [jnp.array([NEGB], jnp.int32), x[:-1]]
        )
        # With slot i <-> cell (i, d-i):
        #   (i-1, j-1): diag d-2, slot i-1 -> shift1(prev2)
        #   (i-1, j):   diag d-1, slot i-1 -> shift1(prev1)
        #   (i, j-1):   diag d-1, slot i   -> prev1
        diag_n = shift1(prev2)
        upper_n = shift1(prev1)
        left_n = prev1
        # inject left-boundary ghosts where j-1 == 0 (i == d - 1):
        is_j1 = iota == (d - 1)
        left_n = jnp.where(is_j1, left_ext, left_n)
        diag_n = jnp.where(is_j1, shift1(left_ext), diag_n)
        cur = jnp.maximum(
            jnp.maximum(diag_n + s, upper_n - gap),
            jnp.maximum(left_n - gap, 0),
        )
        # slot 0 = top boundary row value H[i0-1, j0-1+d]
        top_d = jax.lax.dynamic_index_in_dim(
            top_ext_pad, jnp.minimum(d, C + R + 1), keepdims=False
        )
        cur = jnp.where(iota == 0, top_d, cur)
        # slots outside the tile (j < 1 or j > C) read NEGB
        j_of = d - iota
        cur = jnp.where(
            (iota > 0) & ((j_of < 1) | (j_of > C)), NEGB, cur
        )
        masked = jnp.where(iota > 0, cur, NEGB)
        upd = masked > best_vec
        best_vec = jnp.where(upd, masked, best_vec)
        bestj_vec = jnp.where(upd, j_of, bestj_vec)
        right_vec = jnp.where(iota == d - C, cur, right_vec)
        bottom = jax.lax.dynamic_index_in_dim(cur, R, keepdims=False)
        return (cur, prev1, best_vec, bestj_vec, right_vec), bottom

    init_vec = jnp.full((R + 1,), NEGB, jnp.int32)
    zeros_vec = jnp.zeros((R + 1,), jnp.int32)
    (_, _, best_vec, bestj_vec, right_vec), bots = jax.lax.scan(
        step,
        (init_vec, init_vec, init_vec, zeros_vec, init_vec),
        jnp.arange(1, R + C + 1),
    )
    # tile argmax, row-major-first: max value, then smallest slot (= row),
    # then the per-slot earliest (= smallest-j) hit recorded above
    vmax = best_vec.max()
    i_at = jnp.where(best_vec == vmax, iota, big).min()
    bj = jax.lax.dynamic_index_in_dim(bestj_vec, i_at, keepdims=False)
    zero = vmax <= 0  # all-zero tile: report (0, 0, 0) like before
    best = jnp.maximum(vmax, 0)
    bi = jnp.where(zero, 0, i_at)
    bj = jnp.where(zero, 0, bj)
    # bottom_row[j-1] = H[R, j] emitted at diagonal d = R + j
    bottom_row = jax.lax.dynamic_slice_in_dim(bots, R, C)
    right_col = right_vec[1:]
    return bottom_row, right_col, best, bi, bj


def _tile_colscan_affine(
    q, t, top_row, top_row_f, left_col, left_col_e, corner,
    table, n_codes, go, ge,
):
    """AFFINE (Gotoh) R x C tile on the column-parallel schedule — the
    affine twin of `_tile_colscan` (same contract and returns as
    `_tile_scan_affine`, bit-equal, tested).

    The intra-column F chain has the same closed form as the linear
    chain: F[i,j] = max(F[i-1,j]-ge, H[i-1,j]-go) unrolls to a max-plus
    prefix over X[k] = pre[k] - go (plus the F boundary folded into
    X[0]), because the F-from-F branch routes H[k] = max(pre[k], F[k])
    through an extra -go and is dominated whenever go >= 0 — the
    colscan-affine decoupling (kernels/xla/colscan.py), here with
    explicit tile boundaries. E stays a carried per-slot horizontal
    recurrence; H itself has no direct vertical dependence.
    """
    R, C = q.shape[0], t.shape[0]
    stride = table.shape[0]
    iota = jnp.arange(R + 1)
    ghost_q, ghost_t = stride - 2, stride - 1
    q_slot = jnp.concatenate(
        [jnp.array([ghost_q], jnp.int32), jnp.minimum(q, ghost_q)]
    )
    prof = _tile_profile(q_slot, table)
    left_ext = jnp.concatenate([corner[None], left_col])
    left_ext_e = jnp.concatenate(
        [jnp.array([NEGB], jnp.int32), left_col_e]
    )
    go32, ge32 = jnp.int32(go), jnp.int32(ge)

    shifts = []
    sh = 1
    while sh <= R:
        shifts.append(sh)
        sh *= 2

    def step(carry, xs):
        hprev, eprev, best_vec, bestj_vec = carry
        t_j, top_j, top_f_j, j = xs
        s = _prof_select(prof, jnp.broadcast_to(t_j, (R + 1,)), n_codes)
        diag = jnp.concatenate([jnp.array([NEGB], jnp.int32), hprev[:-1]])
        e_cur = jnp.maximum(eprev - ge32, hprev - go32)
        pre = jnp.maximum(jnp.maximum(diag + s, e_cur), 0)
        pre = jnp.where(iota == 0, top_j, pre)
        # F chain: prefix over X (slot 0 folds the F boundary)
        x = pre - go32
        x = jnp.where(
            iota == 0, jnp.maximum(top_j - go32, top_f_j - ge32), x
        )
        p = x
        for shv in shifts:
            shifted = jnp.concatenate(
                [jnp.full((shv,), NEGB, jnp.int32), p[:-shv]]
            )
            p = jnp.maximum(p, shifted - shv * ge32)
        f_cur = jnp.concatenate(
            [jnp.array([NEGB], jnp.int32), p[:-1]]
        )
        f_cur = jnp.where(iota == 0, top_f_j, f_cur)
        h = jnp.maximum(pre, f_cur)
        h = jnp.where(iota == 0, top_j, h)
        masked = jnp.where(iota > 0, h, NEGB)
        upd = masked > best_vec
        best_vec = jnp.where(upd, masked, best_vec)
        bestj_vec = jnp.where(upd, j, bestj_vec)
        return (h, e_cur, best_vec, bestj_vec), (h[R], f_cur[R])

    init_vec = jnp.full((R + 1,), NEGB, jnp.int32)
    (hlast, elast, best_vec, bestj_vec), (bots, bots_f) = jax.lax.scan(
        step,
        (left_ext, left_ext_e, init_vec, jnp.zeros((R + 1,), jnp.int32)),
        (t, top_row, top_row_f, jnp.arange(1, C + 1)),
        unroll=8,
    )
    big = jnp.int32(1 << 30)
    vmax = best_vec.max()
    i_at = jnp.where(best_vec == vmax, iota, big).min()
    bj = jax.lax.dynamic_index_in_dim(bestj_vec, i_at, keepdims=False)
    zero = vmax <= 0
    best = jnp.maximum(vmax, 0)
    bi = jnp.where(zero, 0, i_at)
    bj = jnp.where(zero, 0, bj)
    return bots, bots_f, hlast[1:], elast[1:], best, bi, bj


def _tile_scan_affine(
    q, t, top_row, top_row_f, left_col, left_col_e, corner,
    table, n_codes, go, ge,
):
    """One R x C tile of AFFINE (Gotoh) local SW with explicit boundaries.

    Extra boundary state vs _tile_scan: top_row_f [C] = F of the row
    above (F crosses strip boundaries, so it rides the inter-device
    exchange with H), left_col_e [R] = E of the column to the left (E
    crosses block boundaries, carried device-locally). Returns
    (bottom_row, bottom_row_f, right_col, right_col_e, best).
    """
    R, C = q.shape[0], t.shape[0]
    stride = table.shape[0]
    iota = jnp.arange(R + 1)
    ghost_q, ghost_t = stride - 2, stride - 1
    q_slot = jnp.concatenate(
        [jnp.array([ghost_q], jnp.int32), jnp.minimum(q, ghost_q)]
    )
    t_rev_pad = jnp.concatenate(
        [
            jnp.full((R + 1,), ghost_t, jnp.int32),
            jnp.minimum(t[::-1], ghost_t),
            jnp.full((R + 1,), ghost_t, jnp.int32),
        ]
    )
    prof = _tile_profile(q_slot, table)
    left_ext = jnp.concatenate([corner[None], left_col])
    left_ext_e = jnp.concatenate(
        [jnp.array([NEGB], jnp.int32), left_col_e]
    )
    top_ext = jnp.concatenate([corner[None], top_row])
    top_ext_pad = jnp.concatenate(
        [top_ext, jnp.full((R + 2,), NEGB, jnp.int32)]
    )
    top_f_ext = jnp.concatenate([jnp.array([NEGB], jnp.int32), top_row_f])
    top_f_pad = jnp.concatenate(
        [top_f_ext, jnp.full((R + 2,), NEGB, jnp.int32)]
    )

    big = jnp.int32(1 << 30)

    def step(carry, d):
        # same deferred-argmax / carried-right-column scheme as
        # _tile_scan (see its step comment)
        (prev1, prev2, f_prev1, e_prev1,
         best_vec, bestj_vec, right_vec, right_vec_e) = carry
        off = C - d + R + 1
        t_diag = jax.lax.dynamic_slice_in_dim(t_rev_pad, off, R + 1)
        s = _prof_select(prof, t_diag, n_codes)

        shift1 = lambda x: jnp.concatenate(
            [jnp.array([NEGB], jnp.int32), x[:-1]]
        )
        diag_n = shift1(prev2)
        upper_n = shift1(prev1)
        upper_f = shift1(f_prev1)
        left_n = prev1
        left_e = e_prev1
        is_j1 = iota == (d - 1)
        left_n = jnp.where(is_j1, left_ext, left_n)
        left_e = jnp.where(is_j1, left_ext_e, left_e)
        diag_n = jnp.where(is_j1, shift1(left_ext), diag_n)
        e_cur = jnp.maximum(left_e - ge, left_n - go)
        f_cur = jnp.maximum(upper_f - ge, upper_n - go)
        cur = jnp.maximum(
            jnp.maximum(diag_n + s, jnp.maximum(e_cur, f_cur)),
            0,
        )
        top_d = jax.lax.dynamic_index_in_dim(
            top_ext_pad, jnp.minimum(d, C + R + 1), keepdims=False
        )
        top_f_d = jax.lax.dynamic_index_in_dim(
            top_f_pad, jnp.minimum(d, C + R + 1), keepdims=False
        )
        cur = jnp.where(iota == 0, top_d, cur)
        f_cur = jnp.where(iota == 0, top_f_d, f_cur)
        j_of = d - iota
        outside = (iota > 0) & ((j_of < 1) | (j_of > C))
        cur = jnp.where(outside, NEGB, cur)
        f_cur = jnp.where(outside, NEGB, f_cur)
        e_cur = jnp.where(outside, NEGB, e_cur)
        masked = jnp.where(iota > 0, cur, NEGB)
        upd = masked > best_vec
        best_vec = jnp.where(upd, masked, best_vec)
        bestj_vec = jnp.where(upd, j_of, bestj_vec)
        at_right = iota == d - C
        right_vec = jnp.where(at_right, cur, right_vec)
        right_vec_e = jnp.where(at_right, e_cur, right_vec_e)
        bottom = jax.lax.dynamic_index_in_dim(cur, R, keepdims=False)
        bottom_f = jax.lax.dynamic_index_in_dim(f_cur, R, keepdims=False)
        return (
            cur, prev1, f_cur, e_cur,
            best_vec, bestj_vec, right_vec, right_vec_e,
        ), (bottom, bottom_f)

    init_vec = jnp.full((R + 1,), NEGB, jnp.int32)
    zeros_vec = jnp.zeros((R + 1,), jnp.int32)
    (
        (_, _, _, _, best_vec, bestj_vec, right_vec, right_vec_e),
        (bots, bots_f),
    ) = jax.lax.scan(
        step,
        (init_vec, init_vec, init_vec, init_vec,
         init_vec, zeros_vec, init_vec, init_vec),
        jnp.arange(1, R + C + 1),
    )
    vmax = best_vec.max()
    i_at = jnp.where(best_vec == vmax, iota, big).min()
    bj = jax.lax.dynamic_index_in_dim(bestj_vec, i_at, keepdims=False)
    zero = vmax <= 0
    best = jnp.maximum(vmax, 0)
    bi = jnp.where(zero, 0, i_at)
    bj = jnp.where(zero, 0, bj)
    bottom_row = jax.lax.dynamic_slice_in_dim(bots, R, C)
    bottom_row_f = jax.lax.dynamic_slice_in_dim(bots_f, R, C)
    right_col = right_vec[1:]
    right_col_e = right_vec_e[1:]
    return bottom_row, bottom_row_f, right_col, right_col_e, best, bi, bj


def tile_sw_reference(q, t, top_row, left_col, corner, matrix, gap):
    """numpy mirror of _tile_scan for unit tests (matrix: [A, A] scores)."""
    R, C = len(q), len(t)
    H = np.zeros((R + 1, C + 1), np.int64)
    H[0, 0] = corner
    H[0, 1:] = top_row
    H[1:, 0] = left_col
    best = 0
    for i in range(1, R + 1):
        for j in range(1, C + 1):
            s = matrix[q[i - 1], t[j - 1]]
            H[i, j] = max(
                0, H[i - 1, j - 1] + s, H[i - 1, j] - gap, H[i, j - 1] - gap
            )
            best = max(best, H[i, j])
    return H[R, 1:], H[1:, C], best


@functools.partial(
    jax.jit,
    static_argnames=("gap", "block", "mesh", "axis", "n_codes"),
)
def _longpair_impl(q, t, table, gap, block, mesh, axis, n_codes):
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    n_dev = mesh.devices.size
    R = q.shape[0] // n_dev
    C = block
    n_blocks = t.shape[0] // C
    n_steps = n_blocks + n_dev - 1
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    def per_device(q_strip):
        q_strip = q_strip.reshape(-1).astype(jnp.int32)
        my = jax.lax.axis_index(axis)
        tt = t.astype(jnp.int32)
        zero_c = jnp.zeros((C,), jnp.int32)
        zero_r = jnp.zeros((R,), jnp.int32)

        def step(carry, s):
            top_in, prev_top_last, left_col, best, gbi, gbj = carry
            b = s - my
            active = (b >= 0) & (b < n_blocks)
            bsafe = jnp.clip(b, 0, n_blocks - 1)
            t_block = jax.lax.dynamic_slice_in_dim(tt, bsafe * C, C)
            top = jnp.where(my == 0, zero_c, top_in)
            left = jnp.where(b == 0, zero_r, left_col)
            corner = jnp.where(
                (my == 0) | (b == 0), jnp.int32(0), prev_top_last
            )
            bot, right, tile_best, tbi, tbj = _tile_colscan(
                q_strip, t_block, top, left, corner,
                table, n_codes, jnp.int32(gap),
            )
            # global endpoint, row-major-first across this device's tiles
            gi = my * R + tbi
            gj = bsafe * C + tbj
            upd = active & (
                (tile_best > best)
                | (
                    (tile_best == best)
                    & ((gi < gbi) | ((gi == gbi) & (gj < gbj)))
                )
            )
            best = jnp.where(upd, tile_best, best)
            gbi = jnp.where(upd, gi, gbi)
            gbj = jnp.where(upd, gj, gbj)
            left_new = jnp.where(active, right, left_col)
            ptl_new = jnp.where(active, top[C - 1], prev_top_last)
            send = jnp.where(active, bot, zero_c)
            top_next = jax.lax.ppermute(send, axis, perm)
            return (top_next, ptl_new, left_new, best, gbi, gbj), None

        big = jnp.int32(1 << 30)
        (_, _, _, best, gbi, gbj), _ = jax.lax.scan(
            step,
            (zero_c, jnp.int32(0), zero_r, jnp.int32(0), big, big),
            jnp.arange(n_steps),
        )
        gbi = jnp.where(best > 0, gbi, 0)
        gbj = jnp.where(best > 0, gbj, 0)
        return jnp.stack([best, gbi, gbj])[None]

    fn = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(axis),),
        out_specs=P(axis),
        check_vma=False,
    )
    return fn(q)


@functools.partial(
    jax.jit,
    static_argnames=("go", "ge", "block", "mesh", "axis", "n_codes"),
)
def _longpair_affine_impl(q, t, table, go, ge, block, mesh, axis, n_codes):
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    n_dev = mesh.devices.size
    R = q.shape[0] // n_dev
    C = block
    n_blocks = t.shape[0] // C
    n_steps = n_blocks + n_dev - 1
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    def per_device(q_strip):
        q_strip = q_strip.reshape(-1).astype(jnp.int32)
        my = jax.lax.axis_index(axis)
        tt = t.astype(jnp.int32)
        zero_c = jnp.zeros((C,), jnp.int32)
        zero_r = jnp.zeros((R,), jnp.int32)
        negb_c = jnp.full((C,), NEGB, jnp.int32)
        negb_r = jnp.full((R,), NEGB, jnp.int32)

        def step(carry, s):
            top_in, prev_top_last, left_col, left_col_e, best, gbi, gbj = (
                carry
            )
            b = s - my
            active = (b >= 0) & (b < n_blocks)
            bsafe = jnp.clip(b, 0, n_blocks - 1)
            t_block = jax.lax.dynamic_slice_in_dim(tt, bsafe * C, C)
            top = jnp.where(my == 0, zero_c, top_in[0])
            top_f = jnp.where(my == 0, negb_c, top_in[1])
            left = jnp.where(b == 0, zero_r, left_col)
            left_e = jnp.where(b == 0, negb_r, left_col_e)
            corner = jnp.where(
                (my == 0) | (b == 0), jnp.int32(0), prev_top_last
            )
            bot, bot_f, right, right_e, tile_best, tbi, tbj = (
                _tile_colscan_affine(
                    q_strip, t_block, top, top_f, left, left_e, corner,
                    table, n_codes, jnp.int32(go), jnp.int32(ge),
                )
            )
            gi = my * R + tbi
            gj = bsafe * C + tbj
            upd = active & (
                (tile_best > best)
                | (
                    (tile_best == best)
                    & ((gi < gbi) | ((gi == gbi) & (gj < gbj)))
                )
            )
            best = jnp.where(upd, tile_best, best)
            gbi = jnp.where(upd, gi, gbi)
            gbj = jnp.where(upd, gj, gbj)
            left_new = jnp.where(active, right, left_col)
            left_e_new = jnp.where(active, right_e, left_col_e)
            ptl_new = jnp.where(active, top[C - 1], prev_top_last)
            send = jnp.where(
                active, jnp.stack([bot, bot_f]), jnp.stack([zero_c, negb_c])
            )
            top_next = jax.lax.ppermute(send, axis, perm)
            return (
                top_next, ptl_new, left_new, left_e_new, best, gbi, gbj,
            ), None

        big = jnp.int32(1 << 30)
        (_, _, _, _, best, gbi, gbj), _ = jax.lax.scan(
            step,
            (
                jnp.stack([zero_c, negb_c]),
                jnp.int32(0),
                zero_r,
                negb_r,
                jnp.int32(0),
                big,
                big,
            ),
            jnp.arange(n_steps),
        )
        gbi = jnp.where(best > 0, gbi, 0)
        gbj = jnp.where(best > 0, gbj, 0)
        return jnp.stack([best, gbi, gbj])[None]

    fn = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(axis),),
        out_specs=P(axis),
        check_vma=False,
    )
    return fn(q)


@functools.partial(
    jax.jit,
    static_argnames=(
        "gap", "go", "ge", "block", "mesh", "axis", "n_codes",
        "match", "mismatch",
    ),
)
def _longpair_strip_impl(
    q, t, table, gap, go, ge, block, mesh, axis, n_codes, match, mismatch
):
    """The ppermute sweep on the Pallas strip-tile engine
    (kernels/pallas/longpair_strip.py) — same pipeline, carries, and
    endpoint merge as `_longpair_impl`/`_longpair_affine_impl`, with the
    per-tile XLA column scan replaced by one pallas_call per tile (the
    tile outputs are bit-equal, so the sweep composition is too).
    Affine when ``go is not None``: the inter-device exchange carries
    stacked (H, F) rows exactly like `_longpair_affine_impl`."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from swtpu.kernels.pallas import longpair_strip as lps

    affine = go is not None
    n_dev = mesh.devices.size
    R = q.shape[0] // n_dev
    C = block
    n_blocks = t.shape[0] // C
    n_steps = n_blocks + n_dev - 1
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    br = lps.choose_br(R)
    slots = R // br
    Sp_tile = lps.n_steps(C, slots)
    Sp_full = (n_blocks - 1) * C + Sp_tile
    ghost = n_codes

    def per_device(q_strip):
        q_strip = q_strip.reshape(-1).astype(jnp.int32)
        my = jax.lax.axis_index(axis)
        tt = t.astype(jnp.int32)
        # per-device one-time staging: full-target skew (tile b reads
        # rows [b*C, b*C + Sp_tile)) and the per-(row, slot) query layout
        skew_full = lps.skew_target(tt, Sp_full, ghost)
        qsl = lps.q_slots_layout(q_strip, br, n_codes)
        if match is None:
            scq = lps.build_profile(qsl, table, n_codes)
        else:
            scq = qsl[:, None]
        zero_c = jnp.zeros((C,), jnp.int32)
        zero_r = jnp.zeros((R,), jnp.int32)
        negb_c = jnp.full((C,), NEGB, jnp.int32)
        negb_r = jnp.full((R,), NEGB, jnp.int32)

        def step(carry, s):
            if affine:
                (top_in, prev_top_last, left_col, left_col_e,
                 best, gbi, gbj) = carry
            else:
                top_in, prev_top_last, left_col, best, gbi, gbj = carry
            b = s - my
            active = (b >= 0) & (b < n_blocks)
            bsafe = jnp.clip(b, 0, n_blocks - 1)
            tsk_b = jax.lax.dynamic_slice_in_dim(
                skew_full, bsafe * C, Sp_tile
            )
            left = jnp.where(b == 0, zero_r, left_col)
            corner = jnp.where(
                (my == 0) | (b == 0), jnp.int32(0), prev_top_last
            )
            left_ext = jnp.concatenate([corner[None], left])
            if affine:
                top = jnp.where(my == 0, zero_c, top_in[0])
                top_f = jnp.where(my == 0, negb_c, top_in[1])
                left_e = jnp.where(b == 0, negb_r, left_col_e)
                left_ext_e = jnp.concatenate(
                    [jnp.full((1,), NEGB, jnp.int32), left_e]
                )
                (bot, bot_f, right, right_e, tile_best, tbi, tbj) = (
                    lps.tile_strip_affine(
                        scq, tsk_b, top, top_f, left_ext, left_ext_e,
                        br, R, C, slots, n_codes, go, ge, match, mismatch,
                    )
                )
            else:
                top = jnp.where(my == 0, zero_c, top_in)
                bot, right, tile_best, tbi, tbj = lps.tile_strip_linear(
                    scq, tsk_b, top, left_ext,
                    br, R, C, slots, n_codes, gap, match, mismatch,
                )
            gi = my * R + tbi
            gj = bsafe * C + tbj
            upd = active & (
                (tile_best > best)
                | (
                    (tile_best == best)
                    & ((gi < gbi) | ((gi == gbi) & (gj < gbj)))
                )
            )
            best = jnp.where(upd, tile_best, best)
            gbi = jnp.where(upd, gi, gbi)
            gbj = jnp.where(upd, gj, gbj)
            left_new = jnp.where(active, right, left_col)
            ptl_new = jnp.where(active, top[C - 1], prev_top_last)
            if affine:
                left_e_new = jnp.where(active, right_e, left_col_e)
                send = jnp.where(
                    active,
                    jnp.stack([bot, bot_f]),
                    jnp.stack([zero_c, negb_c]),
                )
                top_next = jax.lax.ppermute(send, axis, perm)
                return (
                    top_next, ptl_new, left_new, left_e_new,
                    best, gbi, gbj,
                ), None
            send = jnp.where(active, bot, zero_c)
            top_next = jax.lax.ppermute(send, axis, perm)
            return (top_next, ptl_new, left_new, best, gbi, gbj), None

        big = jnp.int32(1 << 30)
        if affine:
            init = (
                jnp.stack([zero_c, negb_c]), jnp.int32(0),
                zero_r, negb_r, jnp.int32(0), big, big,
            )
        else:
            init = (zero_c, jnp.int32(0), zero_r, jnp.int32(0), big, big)
        carry, _ = jax.lax.scan(step, init, jnp.arange(n_steps))
        best, gbi, gbj = carry[-3], carry[-2], carry[-1]
        gbi = jnp.where(best > 0, gbi, 0)
        gbj = jnp.where(best > 0, gbj, 0)
        return jnp.stack([best, gbi, gbj])[None]

    fn = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(axis),),
        out_specs=P(axis),
        check_vma=False,
    )
    return fn(q)


def _strip_engine_ok() -> bool:
    """Pallas strip tiles need a TPU backend (CPU tests run them via
    interpret mode and pass engine='pallas' explicitly)."""
    return jax.default_backend() not in ("cpu",)


def _run_longpair(q, t, params, mesh, axis, block, engine="auto"):
    """Sharded forward: [n_dev, 3] per-device (best, end_i, end_j).
    block=None picks the step-count-optimal width (_auto_block /
    _auto_block_strip). engine: 'auto' (Pallas strip tiles on TPU, XLA
    column scan elsewhere), 'pallas', or 'xla'."""
    from swtpu.kernels.xla.sw_scan import _extended_table

    if engine == "auto":
        engine = "pallas" if _strip_engine_ok() else "xla"
    n_dev = mesh.devices.size
    if block is None:
        if engine == "pallas":
            from swtpu.kernels.pallas.longpair_strip import choose_br

            R = max(len(q) // n_dev, 1)
            block = _auto_block(
                len(q), len(t), n_dev, rows=R // choose_br(R), cap=4096
            )
        else:
            block = _auto_block(len(q), len(t), n_dev)
    # classify scoring on the HOST numpy table (under a trace — e.g.
    # time_kernel's salted chain — jnp.asarray constants are tracers,
    # and np.asarray(tracer) raises)
    table_np = _extended_table(params)
    table = jnp.asarray(table_np)
    if engine == "pallas":
        from swtpu.kernels.pallas.longpair_strip import _uniform_mm

        mm = _uniform_mm(table_np, int(params.alphabet_size))
        match, mismatch = mm if mm is not None else (None, None)
        if params.is_linear:
            gap, go, ge = int(params.gap), None, None
        else:
            gap, go, ge = 0, int(params.gap_open), int(params.gap_extend)
        return _longpair_strip_impl(
            jnp.asarray(q, dtype=jnp.int32),
            jnp.asarray(t, dtype=jnp.int32),
            table,
            gap, go, ge,
            block,
            mesh,
            axis,
            int(params.alphabet_size),
            match,
            mismatch,
        )
    if not params.is_linear:
        return _longpair_affine_impl(
            jnp.asarray(q, dtype=jnp.int32),
            jnp.asarray(t, dtype=jnp.int32),
            table,
            int(params.gap_open),
            int(params.gap_extend),
            block,
            mesh,
            axis,
            int(params.alphabet_size),
        )
    return _longpair_impl(
        jnp.asarray(q, dtype=jnp.int32),
        jnp.asarray(t, dtype=jnp.int32),
        table,
        int(params.gap),
        block,
        mesh,
        axis,
        int(params.alphabet_size),
    )


def _auto_block(Lq: int, Lt: int, n_dev: int, rows=None, cap=None) -> int:
    """Column-block width minimizing total anti-diagonal steps.

    The sharded sweep runs (n_blocks + n_dev - 1) pipeline steps of one
    R x C tile each, and a tile costs R + C scan steps — so total scan
    steps = (nb + n_dev - 1) * (R + Lt/nb). One device wants nb = 1 (one
    fat tile, no pipeline to fill); n_dev devices trade per-step overhead
    against fill/drain bubbles (continuous optimum nb* ~
    sqrt(Lt*(n_dev-1)/R)). Only divisors of Lt are candidates (the sweep
    needs Lt % block == 0); measured on v5e at 4096x4096/1dev: block 256
    -> 336 ms, 4096 -> 70 ms.

    For the Pallas strip engine, pass rows = R // br (a tile costs
    slots + C column steps, not R + C) and cap = 4096 (the tile's top
    boundary row rides SMEM)."""
    R = rows if rows is not None else max(Lq // n_dev, 1)
    # enumerate divisors in O(sqrt(Lt)) — an O(Lt) scan costs seconds of
    # host time on multi-megabase targets with sparse divisors
    divisors = set()
    d = 1
    while d * d <= Lt:
        if Lt % d == 0:
            divisors.add(d)
            divisors.add(Lt // d)
        d += 1
    def pick(use_cap):
        best_nb, best_cost = None, None
        for nb in sorted(divisors):
            if Lt // nb < 64:  # thinner blocks only add step overhead
                continue
            if use_cap and cap is not None and Lt // nb > cap:
                continue
            cost = (nb + n_dev - 1) * (R + Lt // nb)
            if best_cost is None or cost < best_cost:
                best_nb, best_cost = nb, cost
        return best_nb

    # no divisor passes (tiny target, or cap excludes everything and the
    # capless retry also fails): one whole-target block
    best_nb = pick(True) or pick(False) or 1
    return Lt // best_nb


def _merge_device_ends(out) -> tuple:
    """Merge per-device (best, bi, bj) rows with the row-major-first rule
    (max value, then min row, then min column)."""
    out = np.asarray(out)
    best = int(out[:, 0].max())
    cand = out[out[:, 0] == best]
    k = np.lexsort((cand[:, 2], cand[:, 1]))[0]
    return best, int(cand[k, 1]), int(cand[k, 2])


def longpair_sw_score(
    q: np.ndarray,
    t: np.ndarray,
    params: ScoringParams,
    mesh,
    axis: str = "sp",
    block: int = None,
    engine: str = "auto",
) -> int:
    """Local-alignment score of ONE long pair, query sharded over `axis`.

    len(q) must divide evenly by the mesh size, len(t) by `block`.
    Returns the same score as the single-device engines / oracle.
    Scoring is fully general (any substitution matrix incl. BLOSUM62).
    """
    return _merge_device_ends(
        _run_longpair(q, t, params, mesh, axis, block, engine)
    )[0]


def longpair_sw_ends(
    q: np.ndarray,
    t: np.ndarray,
    params: ScoringParams,
    mesh,
    axis: str = "sp",
    block: int = None,
    engine: str = "auto",
) -> tuple:
    """(score, end_i, end_j) of ONE long pair from the sharded forward:
    each device tracks its tiles' argmax under the row-major-first rule
    (the batch ends engines' tie-break); the per-device candidates merge
    on host. Score 0 maps to (0, 0)."""
    return _merge_device_ends(
        _run_longpair(q, t, params, mesh, axis, block, engine)
    )


def longpair_sw_align(
    q: np.ndarray,
    t: np.ndarray,
    params: ScoringParams,
    mesh,
    axis: str = "sp",
    block: int = None,
    row_block: int = 512,
    engine: str = "auto",
):
    """Local alignment of ONE long pair with traceback: sharded device
    forward (score + argmax endpoint) + low-memory host walk.

    The reference's forward/traceback split (source.cpp:2130-2162) at
    longpair scale: the mesh computes (score, end_i, end_j); the host
    walks only the [0..end_i, 0..end_j] prefix with the checkpointed
    walker (batch/lowmem.py) in O(m * (end_i/row_block + row_block))
    memory — 72 MB measured at 16K x 16K vs ~1 GB for the full matrix. The
    device score double-checks the walk and vice versa. Affine with
    gap_open < gap_extend falls back to the full-matrix walker (the
    lowmem E-chain decoupling needs gap_open >= gap_extend).
    Returns (score, path) identical to swtpu.oracle sw_traceback /
    sw_affine_traceback.
    """
    from swtpu.batch.lowmem import sw_traceback_lowmem

    score, ei, ej = longpair_sw_ends(
        q, t, params, mesh, axis=axis, block=block, engine=engine
    )
    if score == 0:
        return 0, [(0, 0)]
    try:
        sc, path = sw_traceback_lowmem(
            q, t, params, row_block=row_block, ends=(ei, ej)
        )
    except NotImplementedError:  # affine go < ge
        from swtpu.oracle.affine import sw_affine_traceback

        sc, path = sw_affine_traceback(q, t, params)
    assert sc == score and path[-1] == (ei, ej), (
        f"sharded/host mismatch: {score}@({ei},{ej}) vs {sc}@{path[-1]}"
    )
    return sc, path
