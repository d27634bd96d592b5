"""Pallas strip kernel for the long-pair (sequence-parallel) engine.

Native tier of the reference's strip decomposition (source.cpp:126,
:1000 — the ``yoko`` boundary carried across 8/16-row strips), redesigned
for the TPU vector unit: ONE R x C tile of a single pair's DP matrix is
computed by mapping the R/br block-rows of the strip onto the 1024
(sublane, lane) slots of the (8, 128) int32 VPU tile, each slot owning
``br`` consecutive query rows. Slots run a 1-column-skewed software
pipeline (slot I processes its local column ``c = step - I``), so the
cross-slot dependency — slot I's top boundary is slot I-1's bottom row —
is exactly one funnel slot-shift of the bottom-value vreg per column
step (2 rolls + 1 select), while the br-row vertical chain advances in
registers like the flagship batch kernel's serial chain
(sw_batch.py::_kernel). Zero gathers, zero per-step XLA dispatch: the
whole tile is one ``pallas_call`` with the step loop inside (the
previous XLA tile engine paid ~1.3 us of fixed cost per lax.scan column
— PARITY.md §2.3 — which bounded longpair at ~1 GCUPS/device).

Contract: bit-equal to ``swtpu.parallel.longpair._tile_colscan`` /
``_tile_colscan_affine`` on every return — bottom boundary row(s), right
boundary column(s), tile best, and the row-major-first endpoint
(max value, then min row, per-row earliest column) — so it drops into
the sharded ppermute sweep unchanged (tested in tests/test_longpair.py).

Data staging (XLA side, all relayouts — no gathers):
- skewed target ``T[s, slot] = t[s - slot]`` via the pad-flatten skew
  trick (one copy, no gather); the sweep precomputes the FULL-target
  skew once and slices per tile.
- per-(row, slot) query codes / substitution profiles via reshape (+ a
  one-hot MXU matmul against the extended table for general matrices).
- left boundary / corner folded into per-slot inject vregs; the top
  boundary row(s) ride SMEM and are scalar-read once per step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB = 8
LANE = 128
SLOTCAP = SUB * LANE  # 1024 block-rows per strip tile

NEGB = -(2**20)  # matches parallel.longpair.NEGB ("outside the tile")


def _slot_shift_down(x, lane_i):
    """out[slot] = x[slot - 1] over the flat slot order sub*LANE + lane.

    Lane roll by 1 covers every lane >= 1; lane 0 needs the previous
    sublane's lane 127, i.e. the doubly-rolled value. Slot 0 wraps —
    callers overwrite it with the injected top boundary.
    """
    a = pltpu.roll(x, 1, axis=1)
    b = pltpu.roll(a, 1, axis=0)
    return jnp.where(lane_i == 0, b, a)


def _strip_kernel(
    top_ref,      # SMEM [C] int32 top boundary row H
    topf_ref,     # SMEM [C] int32 top boundary row F (affine; else alias)
    tsk_ref,      # VMEM [SS, SUB, LANE] skewed target block
    sc_ref,       # VMEM [br, NC, SUB, LANE] profile (NC=1: query codes)
    leftd_ref,    # VMEM [br, SUB, LANE] diag inject (left_ext[I*br+r])
    leftl_ref,    # VMEM [br, SUB, LANE] left inject (left_ext[I*br+r+1])
    lefte_ref,    # VMEM [br, SUB, LANE] E left inject (affine; else alias)
    *refs,
    br,
    C,
    SS,
    U,
    n_codes,
    match,
    mismatch,
    gap,
    go,
    ge,
):
    """One grid step = SS column steps of the slot pipeline.

    Running best/right state lives in the (constant-indexed, hence
    VMEM-resident) output blocks; only the column carry (hprev/eprev +
    top/bot boundary vregs) needs scratch.
    """
    affine = go is not None
    uniform = match is not None
    if affine:
        (bot_ref, botf_ref, best_ref, bestc_ref, right_ref, righte_ref,
         hprev_ref, eprev_ref, misc_ref) = refs
    else:
        (bot_ref, best_ref, bestc_ref, right_ref,
         hprev_ref, misc_ref) = refs
        botf_ref = righte_ref = eprev_ref = None
    g = pl.program_id(0)
    negb = jnp.full((SUB, LANE), NEGB, jnp.int32)
    sub_i = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANE), 0)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANE), 1)
    ai = sub_i * LANE + lane_i  # flat slot index
    g32 = jnp.int32(gap if not affine else 0)
    go32 = jnp.int32(go if affine else 0)
    ge32 = jnp.int32(ge if affine else 0)
    m32 = jnp.int32(match if uniform else 0)
    mm32 = jnp.int32(mismatch if uniform else 0)

    @pl.when(g == 0)
    def _init():
        z = jnp.broadcast_to(negb, (br, SUB, LANE))
        hprev_ref[:] = z
        misc_ref[:] = jnp.broadcast_to(negb, (4, SUB, LANE))
        best_ref[:] = z
        bestc_ref[:] = jnp.zeros((br, SUB, LANE), jnp.int32)
        right_ref[:] = z
        if affine:
            eprev_ref[:] = z
            righte_ref[:] = z

    ldr = [leftd_ref[r] for r in range(br)]
    llr = [leftl_ref[r] for r in range(br)]
    ler = [lefte_ref[r] for r in range(br)] if affine else None

    def score(r, t):
        if uniform:
            return jnp.where(sc_ref[r, 0] == t, m32, mm32)
        s = negb
        for c in range(n_codes):
            s = jnp.where(t == c, sc_ref[r, c], s)
        return s

    def stepu(s, carry, u_slot):
        (hprev, eprev, top_prev, bot_prev, botf_prev,
         bb, bc, rr, re) = carry
        bb, bc, rr, re = list(bb), list(bc), list(rr), list(re)

        t = tsk_ref[u_slot]
        s_vec = jnp.full((SUB, LANE), s, jnp.int32)
        active = (ai <= s_vec) & (ai > s_vec - C)
        c0 = ai == s_vec  # this slot is at its local column 0
        cvec = s_vec - ai
        top_s = top_ref[jnp.minimum(s, C - 1)]
        top_cur = _slot_shift_down(bot_prev, lane_i)
        top_cur = jnp.where(ai == 0, top_s, top_cur)
        if affine:
            topf_s = topf_ref[jnp.minimum(s, C - 1)]
            topf_cur = _slot_shift_down(botf_prev, lane_i)
            topf_cur = jnp.where(ai == 0, topf_s, topf_cur)

        up = top_cur
        upf = topf_cur if affine else None
        diag = top_prev
        news, newe = [], []
        for r in range(br):
            d_r = jnp.where(c0, ldr[r], diag)
            l_r = jnp.where(c0, llr[r], hprev[r])
            sc = score(r, t)
            pre = jnp.maximum(d_r + sc, 0)
            if affine:
                le_r = jnp.where(c0, ler[r], eprev[r])
                e_r = jnp.maximum(le_r - ge32, l_r - go32)
                f_r = jnp.maximum(upf - ge32, up - go32)
                h_r = jnp.maximum(pre, jnp.maximum(e_r, f_r))
                newe.append(e_r)
                upf = f_r
            else:
                h_r = jnp.maximum(pre, jnp.maximum(up, l_r) - g32)
            news.append(h_r)
            hm = jnp.where(active, h_r, negb)
            upd = hm > bb[r]
            bb[r] = jnp.where(upd, hm, bb[r])
            bc[r] = jnp.where(upd, cvec, bc[r])
            diag = hprev[r]
            up = h_r
        atC = ai == s_vec - (C - 1)
        for r in range(br):
            rr[r] = jnp.where(atC, news[r], rr[r])
            if affine:
                re[r] = jnp.where(atC, newe[r], re[r])
        bot_ref[u_slot] = news[br - 1]
        if affine:
            botf_ref[u_slot] = upf  # F of row br-1 (last f_r)
        return (
            tuple(news),
            tuple(newe),
            top_cur,
            news[br - 1],
            upf,
            tuple(bb), tuple(bc), tuple(rr), tuple(re),
        )

    def load_carry():
        hprev = tuple(hprev_ref[r] for r in range(br))
        eprev = tuple(eprev_ref[r] for r in range(br)) if affine else ()
        bb = tuple(best_ref[r] for r in range(br))
        bc = tuple(bestc_ref[r] for r in range(br))
        rr = tuple(right_ref[r] for r in range(br))
        re = tuple(righte_ref[r] for r in range(br)) if affine else ()
        return (hprev, eprev, misc_ref[0], misc_ref[1],
                misc_ref[2] if affine else None, bb, bc, rr, re)

    def store_carry(carry):
        hprev, eprev, top_prev, bot_prev, botf_prev, bb, bc, rr, re = carry
        for r in range(br):
            hprev_ref[r] = hprev[r]
            best_ref[r] = bb[r]
            bestc_ref[r] = bc[r]
            right_ref[r] = rr[r]
            if affine:
                eprev_ref[r] = eprev[r]
                righte_ref[r] = re[r]
        misc_ref[0] = top_prev
        misc_ref[1] = bot_prev
        if affine:
            misc_ref[2] = botf_prev

    def outer(uo, carry):
        base = g * SS + uo * U
        for ui in range(U):
            carry = stepu(base + ui, carry, uo * U + ui)
        return carry

    carry = jax.lax.fori_loop(0, SS // U, outer, load_carry())
    store_carry(carry)


@functools.partial(
    jax.jit,
    static_argnames=(
        "br", "C", "SS", "U", "n_codes", "match", "mismatch",
        "gap", "go", "ge",
    ),
)
def _strip_call(
    top_sm, topf_sm, tsk, scq, leftd, leftl, lefte,
    br, C, SS, U, n_codes, match, mismatch, gap, go, ge,
):
    Sp = tsk.shape[0]
    grid = Sp // SS
    affine = go is not None
    brspec = pl.BlockSpec(
        (br, SUB, LANE), lambda g: (0, 0, 0), memory_space=pltpu.VMEM
    )
    sspec = pl.BlockSpec(
        (SS, SUB, LANE), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
    )
    brshape = jax.ShapeDtypeStruct((br, SUB, LANE), jnp.int32)
    sshape = jax.ShapeDtypeStruct((Sp, SUB, LANE), jnp.int32)
    if affine:
        out_shape = (sshape, sshape, brshape, brshape, brshape, brshape)
        out_specs = (sspec, sspec, brspec, brspec, brspec, brspec)
    else:
        out_shape = (sshape, brshape, brshape, brshape)
        out_specs = (sspec, brspec, brspec, brspec)
    scratch = [
        pltpu.VMEM((br, SUB, LANE), jnp.int32),  # hprev
    ]
    if affine:
        scratch.append(pltpu.VMEM((br, SUB, LANE), jnp.int32))  # eprev
    scratch.append(pltpu.VMEM((4, SUB, LANE), jnp.int32))  # misc
    outs = pl.pallas_call(
        functools.partial(
            _strip_kernel,
            br=br, C=C, SS=SS, U=U, n_codes=n_codes,
            match=match, mismatch=mismatch, gap=gap, go=go, ge=ge,
        ),
        out_shape=out_shape,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            sspec,
            pl.BlockSpec(
                (br, scq.shape[1], SUB, LANE), lambda g: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            brspec, brspec, brspec,
        ],
        out_specs=out_specs,
        scratch_shapes=scratch,
    )(top_sm, topf_sm, tsk, scq, leftd, leftl, lefte)
    return outs


def choose_br(R: int) -> int:
    """Rows per slot: smallest br with R/br <= 1024 slots and br | R."""
    br = max(1, -(-R // SLOTCAP))
    while R % br:
        br += 1
    return br


def pick_ss(steps: int) -> tuple:
    """(SS, U) superstep sizing: small tiles get less step padding."""
    U = 8
    SS = 256
    while SS > U and SS > steps:
        SS //= 2
    return SS, U


def n_steps(C: int, slots: int) -> int:
    """Padded pipeline step count for a C-column tile over `slots`."""
    SS, _ = pick_ss(C + slots - 1)
    return -(-(C + slots - 1) // SS) * SS


def skew_target(t, Sp: int, ghost: int):
    """[Sp, SUB, LANE] with out[s, slot] = t[s - slot] (ghost outside).

    Pure pad/flatten/reshape (the relative-shift skew trick): rows of a
    broadcast [1024, N+1] matrix re-read as an N-stride matrix shift row
    I right by I, so row I column s reads t[s - I]. No gather. Requires
    len(t) <= Sp (the trailing >= 1024 ghosts absorb the s < I wrap).
    """
    t = jnp.asarray(t, jnp.int32)
    Lt = t.shape[0]
    if Lt > Sp:
        raise ValueError(f"skew needs len(t)={Lt} <= steps={Sp}")
    N = Sp + SLOTCAP
    ext = jnp.concatenate([t, jnp.full((N - Lt,), ghost, jnp.int32)])
    rows = jnp.broadcast_to(ext[None, :], (SLOTCAP, N))
    rows = jnp.pad(rows, ((0, 0), (0, 1)), constant_values=ghost)
    flat = rows.reshape(-1)[: SLOTCAP * N]
    sk = flat.reshape(SLOTCAP, N)[:, :Sp]  # sk[I, s] = ext[s - I]
    return sk.T.reshape(Sp, SUB, LANE)


def _slot_layout(vec, br: int, fill: int):
    """[<=br*1024] -> [br, SUB, LANE] with out[r, I] = vec[I*br + r]."""
    vec = jnp.asarray(vec, jnp.int32)
    pad = SLOTCAP * br - vec.shape[0]
    if pad:
        vec = jnp.concatenate([vec, jnp.full((pad,), fill, jnp.int32)])
    return vec.reshape(SLOTCAP, br).T.reshape(br, SUB, LANE)


def _unslot(arr, br: int, R: int):
    """[br, SUB, LANE] -> [R] with out[I*br + r] = arr[r, I]."""
    return arr.reshape(br, SLOTCAP).T.reshape(-1)[:R]


def build_profile(q_slots, table, n_codes: int):
    """[br, n_codes, SUB, LANE] profile via one-hot MXU matmul (gathers
    from small tables are the measured TPU pathology — sw_scan.py)."""
    br = q_slots.shape[0]
    stride = table.shape[0]
    flat = q_slots.reshape(-1)
    onehot = (flat[:, None] == jnp.arange(stride)[None, :]).astype(
        jnp.int32
    )
    prof = jnp.dot(onehot, table, preferred_element_type=jnp.int32)
    prof = prof[:, :n_codes]
    return prof.reshape(br, SUB, LANE, n_codes).transpose(0, 3, 1, 2)


def _uniform_mm(table, n_codes):
    """(match, mismatch) ints if table[:nc,:nc] is uniform, else None."""
    sub = np.asarray(table)[:n_codes, :n_codes]
    diag = np.diag(sub)
    off = sub[~np.eye(n_codes, dtype=bool)]
    if (diag == diag[0]).all() and (off == off[0]).all():
        return int(diag[0]), int(off[0])
    return None


def _reduce_tile(bot, best, bestc, right, br, R, C, slots):
    """Mirror _tile_colscan's endpoint reduce (max value, then min row,
    then that row's earliest column) and boundary extraction."""
    su, la = (slots - 1) // LANE, (slots - 1) % LANE
    bottom_row = bot[slots - 1 : slots - 1 + C, su, la]
    right_col = _unslot(right, br, R)
    vals = _unslot(best, br, R)  # [R], row k = I*br + r
    cols = _unslot(bestc, br, R)
    big = jnp.int32(1 << 30)
    vmax = vals.max()
    iota = jnp.arange(1, R + 1)
    i_at = jnp.where(vals == vmax, iota, big).min()
    bj = jax.lax.dynamic_index_in_dim(cols, i_at - 1, keepdims=False) + 1
    zero = vmax <= 0
    best_v = jnp.maximum(vmax, 0)
    bi = jnp.where(zero, 0, i_at)
    bj = jnp.where(zero, 0, bj)
    return bottom_row, right_col, best_v, bi, bj


@functools.partial(
    jax.jit,
    static_argnames=("br", "R", "C", "slots", "n_codes", "gap", "match",
                     "mismatch"),
)
def tile_strip_linear(
    scq, tsk, top_row, left_ext,
    br, R, C, slots, n_codes, gap, match, mismatch,
):
    """One linear tile; returns (bottom_row, right_col, best, bi, bj)
    bit-equal to parallel.longpair._tile_colscan. `tsk` must cover
    n_steps(C, slots) steps; `scq` is q_slots[:, None] (uniform) or the
    [br, n_codes, SUB, LANE] profile."""
    SS, U = pick_ss(C + slots - 1)
    leftd = _slot_layout(left_ext[:R], br, NEGB)
    leftl = _slot_layout(left_ext[1 : R + 1], br, NEGB)
    top_sm = jnp.asarray(top_row, jnp.int32)
    bot, best, bestc, right = _strip_call(
        top_sm, top_sm, tsk, scq, leftd, leftl, leftd,
        br, C, SS, U, n_codes, match, mismatch, gap, None, None,
    )
    return _reduce_tile(bot, best, bestc, right, br, R, C, slots)


@functools.partial(
    jax.jit,
    static_argnames=("br", "R", "C", "slots", "n_codes", "go", "ge",
                     "match", "mismatch"),
)
def tile_strip_affine(
    scq, tsk, top_row, top_row_f, left_ext, left_ext_e,
    br, R, C, slots, n_codes, go, ge, match, mismatch,
):
    """One affine tile; returns (bottom_row, bottom_row_f, right_col,
    right_col_e, best, bi, bj) bit-equal to _tile_colscan_affine."""
    SS, U = pick_ss(C + slots - 1)
    leftd = _slot_layout(left_ext[:R], br, NEGB)
    leftl = _slot_layout(left_ext[1 : R + 1], br, NEGB)
    lefte = _slot_layout(left_ext_e[1 : R + 1], br, NEGB)
    top_sm = jnp.asarray(top_row, jnp.int32)
    topf_sm = jnp.asarray(top_row_f, jnp.int32)
    bot, botf, best, bestc, right, righte = _strip_call(
        top_sm, topf_sm, tsk, scq, leftd, leftl, lefte,
        br, C, SS, U, n_codes, match, mismatch, 0, go, ge,
    )
    bottom_row, right_col, best_v, bi, bj = _reduce_tile(
        bot, best, bestc, right, br, R, C, slots
    )
    su, la = (slots - 1) // LANE, (slots - 1) % LANE
    bottom_row_f = botf[slots - 1 : slots - 1 + C, su, la]
    right_col_e = _unslot(righte, br, R)
    return (
        bottom_row, bottom_row_f, right_col, right_col_e, best_v, bi, bj
    )


def prep_strip(R: int, params):
    """Static geometry + scoring prep shared by the tile callers.

    Returns (br, slots, n_codes, ghost, mm, table): mm is the
    (match, mismatch) pair for uniform matrices else None; ghost is the
    skew pad code (falls through every select branch / never matches).
    """
    from swtpu.kernels.xla.sw_scan import _extended_table

    br = choose_br(R)
    slots = R // br
    n_codes = int(params.alphabet_size)
    table = _extended_table(params)
    ghost = n_codes
    mm = _uniform_mm(table, n_codes)
    return br, slots, n_codes, ghost, mm, jnp.asarray(table)


def q_slots_layout(q, br: int, n_codes: int):
    """[R] codes -> [br, SUB, LANE] per-(r, slot) query codes."""
    return _slot_layout(jnp.asarray(q, jnp.int32), br, n_codes + 2)


def _stage_tile(q, t, params):
    q = jnp.asarray(q, jnp.int32)
    t = jnp.asarray(t, jnp.int32)
    R, C = int(q.shape[0]), int(t.shape[0])
    br, slots, n_codes, ghost, mm, table = prep_strip(R, params)
    Sp = n_steps(C, slots)
    tsk = skew_target(t, Sp, ghost)
    qsl = q_slots_layout(q, br, n_codes)
    if mm is None:
        scq = build_profile(qsl, table, n_codes)
        match, mismatch = None, None
    else:
        scq = qsl[:, None]
        match, mismatch = mm
    return R, C, br, slots, n_codes, scq, tsk, match, mismatch


def strip_tile(q, t, top_row, left_col, corner, params):
    """Standalone one-tile API (tests / single-device longpair): same
    returns as parallel.longpair._tile_colscan. Linear params only."""
    if not params.is_linear:
        raise NotImplementedError(
            "affine standalone tile: use strip_tile_affine"
        )
    R, C, br, slots, n_codes, scq, tsk, match, mismatch = _stage_tile(
        q, t, params
    )
    left_ext = jnp.concatenate(
        [jnp.asarray(corner, jnp.int32).reshape(1),
         jnp.asarray(left_col, jnp.int32)]
    )
    return tile_strip_linear(
        scq, tsk, top_row, left_ext, br, R, C, slots, n_codes,
        int(params.gap), match, mismatch,
    )


def strip_tile_affine(
    q, t, top_row, top_row_f, left_col, left_col_e, corner, params
):
    """Affine standalone one-tile API: the _tile_colscan_affine
    7-tuple."""
    R, C, br, slots, n_codes, scq, tsk, match, mismatch = _stage_tile(
        q, t, params
    )
    left_ext = jnp.concatenate(
        [jnp.asarray(corner, jnp.int32).reshape(1),
         jnp.asarray(left_col, jnp.int32)]
    )
    left_ext_e = jnp.concatenate(
        [jnp.full((1,), NEGB, jnp.int32),
         jnp.asarray(left_col_e, jnp.int32)]
    )
    return tile_strip_affine(
        scq, tsk, top_row, top_row_f, left_ext, left_ext_e,
        br, R, C, slots, n_codes,
        int(params.gap_open), int(params.gap_extend), match, mismatch,
    )
