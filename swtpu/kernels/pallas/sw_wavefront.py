"""Pallas wavefront kernel: intra-pair anti-diagonal Smith-Waterman.

TPU-native re-design of the reference's parallelogram family
(``SmithWaterman_simd`` … ``simd9``, source.cpp:62-1071): one alignment's DP
matrix is swept along anti-diagonals, with the wavefront state carried in
vector registers. On TPU the lane axis holds the 128 query positions (the
reference's 16×16-bit lanes → our 128×32-bit lanes) and the *sublane* axis
holds a small batch of 8 independent pairs — so a [8, 128] VPU tile advances
8 pairs × 128 diagonal cells per step.

Per step d the recurrence is the reference's (source.cpp:1041-1048 in math):
  H_d[j] = max(0, H_{d-2}[j-1] + S[q[j], t[d-j-1]],
                  H_{d-1}[j] - gap, H_{d-1}[j-1] - gap)
with the lane-shifted values produced by `pltpu.roll` + boundary mask — the
TPU equivalent of the reference's permute2x128/alignr lane shift
(source.cpp:156-157). The sliding target window t[d-j-1] is maintained by
the same roll, with the next char inserted at lane 0 from a precomputed
per-diagonal insert stream (replacing the reference's unaligned reloads,
source.cpp:277-280).

Out-of-matrix cells need no masking: the window is padded with T_PAD which
scores NEG, so phantom cells decay and can never beat a real cell (same
zero-floor argument as the batch kernel). Utilization is ~50% (the rhombus
overhang the reference measures as ~20% at 16 lanes, source.cpp:1232-1236,
grows with vector width) — which is exactly why the *batch* kernel is the
flagship; this schedule exists for single/few long pairs and as the ladder
parity member.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from swtpu.core.scoring import ScoringParams

Q_PAD = 4
T_PAD = 5
NEG = -(2**20)

SUB = 8  # pairs per tile (int32 sublanes)
LANE = 128  # query positions per strip


def _kernel(prof_ref, tins_ref, out_ref, *, n_steps, gap):
    zero = jnp.zeros((SUB, LANE), jnp.int32)
    gap32 = jnp.int32(gap)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANE), 1)
    lane0 = lane_ids == 0

    p0 = prof_ref[0]
    p1 = prof_ref[1]
    p2 = prof_ref[2]
    p3 = prof_ref[3]

    def step(d, carry):
        win, h1, h1r, h2r, best = carry
        # slide the target window: lane j holds t[d - j - 1]
        ins = tins_ref[d]
        win = jnp.where(lane0, ins, pltpu.roll(win, 1, 1))

        b0 = (win & 1) > 0
        b1 = (win & 2) > 0
        s = jnp.where(b1, jnp.where(b0, p3, p2), jnp.where(b0, p1, p0))
        s = jnp.where(win >= 4, jnp.int32(NEG), s)

        h = jnp.maximum(
            jnp.maximum(h2r + s, h1 - gap32),
            jnp.maximum(h1r - gap32, zero),
        )
        best = jnp.maximum(best, h)
        hr = jnp.where(lane0, zero, pltpu.roll(h, 1, 1))
        # rotate wavefront: d-1 becomes d-2 (rolled form already computed)
        return (win, h, hr, h1r, best)

    # Peel step 0 out of the loop: a loop carry whose init is a splat
    # constant gets a "replicated" vector layout from Mosaic, and the
    # back-edge (normal -> replicated) is an invalid relayout on v5e.
    # Running the first step inline makes every carry a computed value.
    init0 = (
        jnp.full((SUB, LANE), T_PAD, jnp.int32),
        zero,
        zero,
        zero,
        zero,
    )
    init = step(0, init0)
    _, _, _, _, best = jax.lax.fori_loop(1, n_steps, step, init)
    # per-pair lane reduction happens outside the kernel (a lane-reduce +
    # broadcast inside trips a Mosaic relayout bug on v5e)
    out_ref[0] = best


@functools.partial(jax.jit, static_argnames=("n", "m", "gap"))
def _sw_wavefront_impl(prof, tins, n, m, gap):
    n_steps = n + m - 1
    G = prof.shape[0]  # number of SUB-sized groups
    return pl.pallas_call(
        functools.partial(_kernel, n_steps=n_steps, gap=gap),
        out_shape=jax.ShapeDtypeStruct((G, SUB, LANE), jnp.int32),
        grid=(G,),
        in_specs=[
            pl.BlockSpec(
                (4, SUB, LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (n_steps, SUB, LANE),
                lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, SUB, LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    )(
        prof.reshape(G * 4, SUB, LANE),
        tins.reshape(G * n_steps, SUB, LANE),
    )


@functools.partial(jax.jit, static_argnames=("n", "m"))
def _prepare(qs, ts, table, gap, n, m):
    B = qs.shape[0]
    G = B // SUB
    # query profile rows prof[c][p, j] = S[q_p[j], c], plus a gap row
    prof = table[qs.astype(jnp.int32)]  # [B, n, 4]
    prof = prof.reshape(G, SUB, n, 4).transpose(0, 3, 1, 2)  # [G, 4, SUB, n]
    if n < LANE:
        prof = jnp.pad(
            prof, ((0, 0), (0, 0), (0, 0), (0, LANE - n)), constant_values=NEG
        )
    prof = prof.astype(jnp.int32)
    # per-diagonal insert stream: at step d, lane 0 receives t_p[d]
    # (chars past m are pads)
    n_steps = n + m - 1
    tin = jnp.full((B, n_steps), T_PAD, jnp.uint8)
    tin = tin.at[:, :m].set(ts)
    tins = (
        tin.reshape(G, SUB, n_steps)
        .transpose(0, 2, 1)[:, :, :, None]
        .astype(jnp.int32)
    )  # [G, n_steps, SUB, 1]
    tins = jnp.broadcast_to(tins, (G, n_steps, SUB, LANE))
    return prof, tins


def _profile_table(params: ScoringParams) -> np.ndarray:
    tab = np.full((5, 4), NEG, dtype=np.int32)
    tab[:4, :4] = params.matrix.astype(np.int32)
    return tab


def sw_wavefront_pallas(qs, ts, params: ScoringParams):
    """Anti-diagonal schedule scores; qs: [B, n] (n ≤ 128), ts: [B, m].

    Returns [B] int32 scores identical to the batch kernel / oracle.
    """
    if not params.is_linear:
        raise NotImplementedError("affine tier not yet wired into wavefront")
    B, n = qs.shape
    m = ts.shape[1]
    if n > LANE:
        raise NotImplementedError("strip decomposition for n > 128 pending")
    qs = jnp.asarray(qs)
    ts = jnp.asarray(ts)
    Bp = -(-B // SUB) * SUB
    if Bp != B:
        qs = jnp.concatenate([qs, jnp.full((Bp - B, n), Q_PAD, qs.dtype)])
        ts = jnp.concatenate([ts, jnp.full((Bp - B, m), T_PAD, ts.dtype)])
    table = jnp.asarray(_profile_table(params))
    prof, tins = _prepare(qs, ts, table, int(params.gap), n, m)
    out = _sw_wavefront_impl(prof, tins, n, m, int(params.gap))
    return out.max(axis=2).reshape(Bp)[:B]
