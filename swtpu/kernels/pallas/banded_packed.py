"""Lane-packed Pallas banded X-drop kernel: 4 alignments per sublane row.

The sublane-batched kernel (banded_batch.py) leaves 96 of 128 lanes idle
(band W=32 on lanes, one pair per sublane row). This variant packs FOUR
pairs per row — pair (b, g) owns lane group [32g, 32g+32) — so a grid
step advances 512 alignments and every state array holds 4x the pairs per
vreg. Per-round op count grows ~1.4x (group-local shifts and reductions),
for a net ~2.5x measured throughput.

Group-local idioms (all verified on v5e):
- band shifts: full-width pltpu.roll + a mask zeroing the group boundary
  lane;
- right/down decision: the group's lane-0 and lane-31 values broadcast
  group-wide with constant-index lane gathers;
- round max: 5-step XOR butterfly (take_along_axis with iota^s indices
  stays inside the 32-lane group and leaves the group max in every lane);
- char windows: one slab per GROUP ([128 rows, 128 chars], pair (b,g)'s
  window in row b of slab g) — a lane gather can address the full 128-char
  depth, so the per-round lookup is 4 gathers + 3 group selects per
  sequence and the refill is a plain funnel-shift row store per pair (no
  cross-plane distribution).

Scoring semantics, round/termination contract, and history format match
the scalar banded oracle exactly (same as banded_batch.py). History mode
emits TWO rows per round: the packed band row and a meta row carrying
posy/offs at each group's first two lanes. W in {32, 64}; other widths
route to the sublane kernel. early_exit=True skips whole blocks once all
512 pairs finished (same scratch-state + pl.when mechanism as the sublane
kernel, same ~2x cost on never-exiting workloads).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from swtpu.kernels.pallas.banded_batch import (
    _packed_banded_table,
    _table_lookup,
)
from swtpu.kernels.xla.banded_scan import BandedBatchResult

LANE = 128
GW = 32  # default group width == bandwidth (16/32/64 supported)
SROWS = 128  # sublane rows per grid step
RF = 64  # max rounds per refill block; per-call rf = min(RF, 127 - W)


def _groups(W):
    return LANE // W


def _pairs(W):
    return SROWS * _groups(W)


def _kernel(
    meta_ref,
    q_ref,
    t_ref,
    score_ref,
    mround_ref,
    nrounds_ref,
    *rest,
    W,
    X,
    match,
    mismatch,
    gap,
    n_blocks,
    qlen,
    tlen,
    with_history,
    early_exit,
    rf,
    gap_open=None,
    gap_extend=None,
    table=None,
):
    affine = gap_open is not None
    GROUPS = _groups(W)
    if with_history:
        hist_ref, hist_buf, sem, cur_ref, band_ref, alive_ref = rest
    else:
        cur_ref, band_ref, alive_ref = rest
    iota = jax.lax.broadcasted_iota(jnp.int32, (SROWS, LANE), 1)
    gpos = iota & (W - 1)  # lane position within its group
    gbase = iota - gpos  # first lane of the group
    zero = jnp.zeros((SROWS, LANE), jnp.int32)
    lens_q = meta_ref[0]  # [SROWS, LANE], constant within each group
    lens_t = meta_ref[1]
    rcap = (jnp.maximum(lens_q, lens_t) + 1) * 2 - 1

    m32 = jnp.int32(match)
    mm32 = jnp.int32(-mismatch)
    g32 = jnp.int32(gap)
    # Gotoh E/F constants (oracle/banded_affine.py)
    EF_DEAD = jnp.int32(-(2**28))
    EF_CUT = jnp.int32(-(2**27))  # EF_DEAD // 2
    MINF = jnp.int32(-(2**30))
    go32 = jnp.int32(gap_open if affine else 0)
    ge32 = jnp.int32(gap_extend if affine else 0)

    at_g0 = gpos == 0
    at_gW = gpos == W - 1

    def shift_right_g(a):  # band[k-1], 0 at group starts
        return jnp.where(at_g0, 0, pltpu.roll(a, 1, axis=1))

    def shift_left_g(a):  # band[k+1], 0 at group ends
        return jnp.where(at_gW, 0, pltpu.roll(a, LANE - 1, axis=1))

    def shift_right_g_ef(a):  # E/F variant: boundary fill is EF_DEAD
        return jnp.where(at_g0, EF_DEAD, pltpu.roll(a, 1, axis=1))

    def shift_left_g_ef(a):
        return jnp.where(at_gW, EF_DEAD, pltpu.roll(a, LANE - 1, axis=1))

    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)

    def refill(now, base_cap, seq_ref, rows_per_pair, cur_ref):
        """Re-center each pair's 128-char slab on its cursor.

        Returns GROUPS slabs, each [SROWS, LANE]: slab g row b holds pair
        (b, g)'s chars [base, base+128). base is per-lane ([SROWS, LANE],
        constant within groups)."""
        base = jnp.minimum(now, base_cap)
        cur_ref[:] = base
        slabs = []
        for g in range(GROUPS):
            rows = []
            for b in range(SROWS):
                off = cur_ref[b, g * W]
                pidx = b * GROUPS + g
                rowi = pidx * rows_per_pair + (off >> 7)
                rem = off & (LANE - 1)
                sh = (LANE - rem) & (LANE - 1)
                r0 = pltpu.roll(seq_ref[pl.ds(rowi, 1), :], sh, axis=1)
                r1 = pltpu.roll(seq_ref[pl.ds(rowi + 1, 1), :], sh, axis=1)
                rows.append(jnp.where(lane1 < (LANE - rem), r0, r1))
            slabs.append(jnp.concatenate(rows, axis=0))
        return tuple(slabs), base

    gshift = W.bit_length() - 1  # log2(W)
    gid = iota >> gshift  # group id per lane

    def gather_groups(slabs, idx):
        """Per-lane chars: lane l of row b reads slab[group(l)][b, idx].
        Select tree over the GROUPS gathered values, keyed on gid bits."""
        vals = [jnp.take_along_axis(s, idx, axis=1) for s in slabs]
        bit = 0
        while len(vals) > 1:
            b_ = (gid & (1 << bit)) != 0
            nxt = []
            for j in range(0, len(vals) - 1, 2):
                nxt.append(jnp.where(b_, vals[j + 1], vals[j]))
            if len(vals) % 2:
                nxt.append(vals[-1])
            vals = nxt
            bit += 1
        return vals[0]

    # --- initial state (round 0) ---
    result0 = jnp.where(gpos == W - 1, jnp.int32(X), 0)
    state0 = dict(
        result=result0,
        horizontal=zero,
        vertical=zero,
        now_y=zero,
        now_x=jnp.full((SROWS, LANE), W - 1, jnp.int32),
        max_score=jnp.full((SROWS, LANE), X, jnp.int32),
        max_round=zero,
        n_rounds=jnp.ones((SROWS, LANE), jnp.int32),
        done=zero,  # bool carried as int32
    )
    _FIELDS = (
        "result", "horizontal", "vertical", "now_y", "now_x",
        "max_score", "max_round", "n_rounds", "done",
    )
    if affine:
        ef_dead_full = jnp.full((SROWS, LANE), EF_DEAD, jnp.int32)
        state0["e_band"] = ef_dead_full
        state0["f_band"] = ef_dead_full
        _FIELDS = _FIELDS + ("e_band", "f_band")

    def load_state():
        return {f: band_ref[k] for k, f in enumerate(_FIELDS)}

    def store_state(st):
        for k, f in enumerate(_FIELDS):
            band_ref[k] = st[f]

    if early_exit:
        store_state(state0)
        alive_ref[0] = 1

    if with_history:
        pid = pl.program_id(0)
        hist_buf[0, 0] = result0
        hist_buf[0, 1] = zero  # posy/offs start 0
        copy0 = pltpu.make_async_copy(
            hist_buf.at[pl.ds(0, 1)], hist_ref.at[pid, pl.ds(0, 1)], sem
        )
        copy0.start()
        copy0.wait()

    rev_g = (W - 1) - gpos
    fwd_g = gpos - (W - 1)

    def round_body(i, carry):
        st, slabs_q, slabs_t, base_q, base_t, r0 = carry
        r = r0 + i
        res = st["result"]

        res0 = jnp.take_along_axis(res, gbase, axis=1)
        resW = jnp.take_along_axis(res, gbase + (W - 1), axis=1)
        right = res0 < resW  # [SROWS, LANE], constant within group
        diagonal = jnp.where(right, st["vertical"], st["horizontal"])
        horizontal = jnp.where(right, res, shift_right_g(res))
        vertical = jnp.where(right, shift_left_g(res), res)
        now_x = st["now_x"] + right.astype(jnp.int32)
        now_y = st["now_y"] + (~right).astype(jnp.int32)

        overrun = (right & (now_x > (W + lens_t + (W - 1)))) | (
            (~right) & (now_y > (lens_q + 1))
        )
        done_pre = (st["done"] != 0) | overrun | (r >= rcap)
        active = ~done_pre

        qi = jnp.clip((now_y - base_q) + rev_g, 0, LANE - 1)
        ti = jnp.clip((now_x - base_t) + fwd_g, 0, LANE - 1)
        yc = gather_groups(slabs_q, qi)
        xc = gather_groups(slabs_t, ti)
        if table is None:
            sc = jnp.where((yc >= 0) & (xc >= 0) & (yc == xc), m32, mm32)
        else:
            sc = _table_lookup(yc, xc, table)

        dd = jnp.where(diagonal != 0, diagonal + sc, 0)
        if affine:
            # Gotoh E/F with dead-cell blocking; boundary fill on the
            # group-local shifts is EF_DEAD (0 would read as a live E of
            # weight -ge). See banded_batch.py for the derivation.
            eb, fb = st["e_band"], st["f_band"]
            he = jnp.where(right, eb, shift_right_g_ef(eb))
            vf = jnp.where(right, shift_left_g_ef(fb), fb)
            e_new = jnp.maximum(
                jnp.where(he > EF_CUT, he - ge32, MINF),
                jnp.where(horizontal != 0, horizontal - go32, MINF),
            )
            f_new = jnp.maximum(
                jnp.where(vf > EF_CUT, vf - ge32, MINF),
                jnp.where(vertical != 0, vertical - go32, MINF),
            )
            # the zero floor below subsumes the oracle's MINF guard
            r_new = jnp.maximum(dd, jnp.maximum(e_new, f_new))
        else:
            hh = jnp.where(horizontal != 0, horizontal - g32, 0)
            vv = jnp.where(vertical != 0, vertical - g32, 0)
            r_new = jnp.maximum(jnp.maximum(dd, hh), vv)
        r_new = jnp.maximum(r_new, 0)

        # group max in every lane: log2(W)-step XOR butterfly
        v = r_new
        s_ = 1
        while s_ < W:
            v = jnp.maximum(v, jnp.take_along_axis(v, iota ^ s_, axis=1))
            s_ <<= 1
        round_max = v

        upd = active & (st["max_score"] < round_max)
        max_score = jnp.where(upd, round_max, st["max_score"])
        max_round = jnp.where(upd, r, st["max_round"])
        r_new = jnp.where(r_new < (max_score - X), 0, r_new)

        keep = lambda new, old: jnp.where(active, new, old)
        st_new = dict(
            result=keep(r_new, res),
            horizontal=keep(horizontal, st["horizontal"]),
            vertical=keep(vertical, st["vertical"]),
            now_y=keep(now_y, st["now_y"]),
            now_x=keep(now_x, st["now_x"]),
            max_score=max_score,
            max_round=max_round,
            n_rounds=jnp.where(active, r + 1, st["n_rounds"]),
            done=(done_pre | (active & (round_max == 0))).astype(jnp.int32),
        )
        if affine:
            st_new["e_band"] = keep(
                jnp.where(r_new == 0, EF_DEAD, e_new), eb
            )
            st_new["f_band"] = keep(
                jnp.where(r_new == 0, EF_DEAD, f_new), fb
            )
        if with_history:
            posy = jnp.where(active, now_y, 0)
            offs = max_score - X
            band_row = jnp.where(active, r_new, 0)
            meta_row = jnp.where(gpos == 0, posy, 0)
            meta_row = jnp.where(gpos == 1, offs, meta_row)
            hist_buf[pl.ds(i, 1), 0] = band_row[None]
            hist_buf[pl.ds(i, 1), 1] = meta_row[None]
        return (st_new, slabs_q, slabs_t, base_q, base_t, r0)

    q_rows = qlen // LANE
    t_rows = tlen // LANE

    def block_body(blk, st):
        slabs_q, base_q = refill(
            st["now_y"], qlen - 2 * LANE, q_ref, q_rows, cur_ref
        )
        slabs_t, base_t = refill(
            jnp.maximum(st["now_x"] - (W - 1), 0),
            tlen - 2 * LANE,
            t_ref,
            t_rows,
            cur_ref,
        )
        r0 = 1 + blk * rf
        st, *_ = jax.lax.fori_loop(
            0, rf, round_body, (st, slabs_q, slabs_t, base_q, base_t, r0)
        )
        if with_history:
            copy = pltpu.make_async_copy(
                hist_buf.at[pl.ds(0, rf)],
                hist_ref.at[pid, pl.ds(r0, rf)],
                sem,
            )
            copy.start()
            copy.wait()
        return st

    if early_exit:
        # skip whole blocks once every pair finished: state round-trips
        # VMEM scratch so pl.when can truly branch (lax.cond with value
        # carries is predicated by Mosaic — both branches execute)
        def block_body_ee(blk, dummy):
            @pl.when(alive_ref[0] > 0)
            def _():
                st = block_body(blk, load_state())
                store_state(st)
                alive_ref[0] = jnp.max(1 - st["done"])

            return dummy

        jax.lax.fori_loop(0, n_blocks, block_body_ee, 0)
        state = load_state()
    else:
        state = jax.lax.fori_loop(0, n_blocks, block_body, state0)

    score_ref[0] = state["max_score"] - X
    mround_ref[0] = state["max_round"]
    nrounds_ref[0] = state["n_rounds"]


@functools.partial(
    jax.jit,
    static_argnames=(
        "W", "X", "match", "mismatch", "gap", "R_cap", "qlen", "tlen",
        "with_history", "early_exit", "gap_open", "gap_extend", "table",
    ),
)
def _banded_packed_impl(
    meta, qp, tp, W, X, match, mismatch, gap, R_cap, qlen, tlen,
    with_history, early_exit=False, gap_open=None, gap_extend=None,
    table=None,
):
    # sequences arrive int8 (wire format); the kernel computes in int32
    qp = qp.astype(jnp.int32)
    tp = tp.astype(jnp.int32)
    PAIRS = _pairs(W)
    T = qp.shape[0] // (PAIRS * (qlen // LANE))
    rf = min(RF, LANE - 1 - W)
    n_blocks = -(-(R_cap - 1) // rf)
    R_pad = 1 + n_blocks * rf

    kern = functools.partial(
        _kernel,
        W=W, X=X, match=match, mismatch=mismatch, gap=gap,
        n_blocks=n_blocks, qlen=qlen, tlen=tlen,
        with_history=with_history, early_exit=early_exit, rf=rf,
        gap_open=gap_open, gap_extend=gap_extend, table=table,
    )
    small = pl.BlockSpec(
        (1, SROWS, LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    out_shape = [
        jax.ShapeDtypeStruct((T, SROWS, LANE), jnp.int32),
        jax.ShapeDtypeStruct((T, SROWS, LANE), jnp.int32),
        jax.ShapeDtypeStruct((T, SROWS, LANE), jnp.int32),
    ]
    out_specs = [small, small, small]
    scratch = []
    if with_history:
        out_shape.append(
            jax.ShapeDtypeStruct((T, R_pad, 2, SROWS, LANE), jnp.int32)
        )
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        scratch = [
            pltpu.VMEM((rf, 2, SROWS, LANE), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ]
    scratch.append(pltpu.VMEM((SROWS, LANE), jnp.int32))  # cursor scratch
    n_state = 11 if gap_open is not None else 9  # + Gotoh E/F bands
    scratch.append(pltpu.VMEM((n_state, SROWS, LANE), jnp.int32))  # ee state
    scratch.append(pltpu.SMEM((1,), jnp.int32))  # alive flag
    outs = pl.pallas_call(
        kern,
        out_shape=tuple(out_shape),
        grid=(T,),
        in_specs=[
            pl.BlockSpec(
                (2, SROWS, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (PAIRS * (qlen // LANE), LANE),
                lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (PAIRS * (tlen // LANE), LANE),
                lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
    )(meta, qp, tp)
    # per-pair extraction: pair (tile, b, g) reads lane g*W
    def unpack(a):  # [T, SROWS, LANE] -> [T*PAIRS]
        return a[:, :, ::W].reshape(-1)

    score = unpack(outs[0])
    mround = unpack(outs[1])
    nrounds = unpack(outs[2])
    if with_history:
        return score, mround, nrounds, outs[3]
    return score, mround, nrounds, None


@functools.partial(jax.jit, static_argnames=("W", "R_cap", "compress"))
def _split_history_packed(hist, W, R_cap, compress):
    """[T, R_pad, 2, SROWS, LANE] -> (band [R,B,W], posy [R,B], offs)."""
    T = hist.shape[0]
    GROUPS = _groups(W)
    PAIRS = _pairs(W)
    h = hist[:, :R_cap]  # [T, R, 2, S, L]
    band = (
        h[:, :, 0]
        .reshape(T, R_cap, SROWS, GROUPS, W)
        .transpose(1, 0, 2, 3, 4)
        .reshape(R_cap, T * PAIRS, W)
    )
    meta = (
        h[:, :, 1]
        .reshape(T, R_cap, SROWS, GROUPS, W)
        .transpose(1, 0, 2, 3, 4)
        .reshape(R_cap, T * PAIRS, W)
    )
    posy = meta[:, :, 0]
    offs = meta[:, :, 1]
    if compress:
        band = jnp.where(
            band > 0, band - offs[:, :, None] + 1, 0
        ).astype(jnp.uint8)
    return band, posy, offs


def _prep_wire(qs, ts, lens_q, lens_t, W):
    """Wire-format arrays for the lane-packed kernel: int8 padded char
    rows (pad -1) + per-LANE lens meta (pair (b, g) owns lanes
    [W*g, W*g+W)). Same pad layout as the sublane kernel; vectorized
    masked writes. Returns the real B for result slicing."""
    qs = np.asarray(qs)
    ts = np.asarray(ts)
    B, n = qs.shape
    m = ts.shape[1]
    lens_q = np.full(B, n) if lens_q is None else np.asarray(lens_q)
    lens_t = np.full(B, m) if lens_t is None else np.asarray(lens_t)
    PAIRS = _pairs(W)
    GROUPS = _groups(W)
    Bp = -(-B // PAIRS) * PAIRS
    qlen = -(-(1 + n + W + LANE) // LANE) * LANE
    tlen = -(-(W + m + W + LANE) // LANE) * LANE
    qp = np.full((Bp, qlen), -1, dtype=np.int8)
    tp = np.full((Bp, tlen), -1, dtype=np.int8)
    qp[:B, 1 : 1 + n] = np.where(
        np.arange(n)[None, :] < lens_q[:, None], qs.astype(np.int8), -1
    )
    tp[:B, W : W + m] = np.where(
        np.arange(m)[None, :] < lens_t[:, None], ts.astype(np.int8), -1
    )
    lq = np.zeros(Bp, np.int32)
    lt = np.zeros(Bp, np.int32)
    lq[:B] = lens_q
    lt[:B] = lens_t
    meta = np.zeros((2, Bp // GROUPS, LANE), np.int32)
    meta[0] = np.repeat(lq.reshape(-1, GROUPS), W, axis=1)
    meta[1] = np.repeat(lt.reshape(-1, GROUPS), W, axis=1)
    R_cap = (max(n, m) + 1) * 2 - 1
    return (
        meta,
        qp.reshape(Bp * (qlen // LANE), LANE),
        tp.reshape(Bp * (tlen // LANE), LANE),
        R_cap,
        qlen,
        tlen,
        B,
    )


def bench_forward_fn(
    qs,
    ts,
    lens_q=None,
    lens_t=None,
    match=1,
    mismatch=1,
    gap=1,
    bandwidth=32,
    x_threshold=70,
    gap_open=None,
    gap_extend=None,
    matrix=None,
    early_exit=False,
):
    """(fn, devargs) for honest timing via swtpu.utils.time_kernel.

    fn(qp, tp) runs the jitted scoring-only forward on pre-staged device
    arrays and returns the per-lane scores. Wall time is round-cap-bound
    (no early exit unless requested), so char salting in the timing
    chain does not change the work measured.
    """
    W = int(bandwidth)
    if W not in (32, 64):
        raise ValueError("packed kernel supports bandwidth 32/64")
    if gap_open is not None and gap_open == gap_extend:
        gap, gap_open, gap_extend = gap_open, None, None
    meta, qp, tp, R_cap, qlen, tlen, _ = _prep_wire(
        qs, ts, lens_q, lens_t, W
    )
    meta_d = jnp.asarray(meta)
    table = None if matrix is None else _packed_banded_table(matrix)

    def fn(qp_d, tp_d):
        return _banded_packed_impl(
            meta_d, qp_d, tp_d, W, int(x_threshold), int(match),
            int(mismatch), int(gap), R_cap, qlen, tlen, False,
            bool(early_exit),
            None if gap_open is None else int(gap_open),
            None if gap_extend is None else int(gap_extend),
            table=table,
        )[0]

    return fn, (jnp.asarray(qp), jnp.asarray(tp))


def banded_xdrop_batch_packed(
    qs,
    ts,
    lens_q=None,
    lens_t=None,
    match=1,
    mismatch=1,
    gap=1,
    bandwidth=32,
    x_threshold=70,
    compress_history=False,
    with_history=True,
    early_exit=False,
    gap_open=None,
    gap_extend=None,
    matrix=None,
) -> BandedBatchResult:
    """Lane-packed banded X-drop forward pass (bandwidth 32/64).

    Same contract as banded_xdrop_batch / banded_xdrop_batch_pallas,
    including affine (Gotoh) gaps via gap_open/gap_extend (history stays
    H-only; E/F are host-reconstructible) and the general-matrix mode via
    ``matrix`` (baked packed table, ALU select-tree lookup); 128/bandwidth
    pairs share each sublane row (512 alignments per grid step at the
    default bandwidth 32).
    """
    W = int(bandwidth)
    if W not in (32, 64):
        # W=16 (8 groups) would unroll a 2048-unit refill — compile cost
        # explodes; narrow bands route to the sublane kernel instead
        raise ValueError("packed kernel supports bandwidth 32/64")
    X = int(x_threshold)
    if gap_open is not None and gap_open == gap_extend:
        gap, gap_open, gap_extend = gap_open, None, None  # exactly linear
    if gap_open is not None:
        gap_open, gap_extend = int(gap_open), int(gap_extend)
    meta, qp, tp, R_cap, qlen, tlen, B = _prep_wire(
        qs, ts, lens_q, lens_t, W
    )
    score, mround, nrounds, hist = _banded_packed_impl(
        jnp.asarray(meta),
        jnp.asarray(qp),
        jnp.asarray(tp),
        W, X, int(match), int(mismatch), int(gap), R_cap, qlen, tlen,
        with_history, bool(early_exit), gap_open, gap_extend,
        table=None if matrix is None else _packed_banded_table(matrix),
    )
    score = np.asarray(score)[:B]
    mround = np.asarray(mround)[:B]
    nrounds = np.asarray(nrounds)[:B]
    if not with_history:
        return BandedBatchResult(
            score=score,
            max_round=mround,
            n_rounds=nrounds,
            band_history=None,
            pos_y=None,
        )
    if compress_history and X > 254:
        raise ValueError("8-bit history needs x_threshold <= 254")
    band, posy, offs = _split_history_packed(
        hist, W, R_cap, compress_history
    )
    return BandedBatchResult(
        score=score,
        max_round=mround,
        n_rounds=nrounds,
        band_history=np.asarray(band)[:, :B],
        pos_y=np.asarray(posy)[:, :B],
        offsets=np.asarray(offs)[:, :B] if compress_history else None,
    )
