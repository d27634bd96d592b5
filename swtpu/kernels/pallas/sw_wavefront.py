"""Pallas wavefront kernel: intra-pair anti-diagonal Smith-Waterman.

TPU-native re-design of the reference's parallelogram family
(``SmithWaterman_simd`` … ``simd9``, source.cpp:62-1071): one alignment's
DP matrix is swept along anti-diagonals with the wavefront state carried
in vector registers; the lane axis holds the 128 query positions (the
reference's 16×16-bit lanes → 128×32-bit lanes) and the *sublane* axis a
batch of independent pairs.

Measured schedule ladder (v5e, 2048×(128×128), scoring (10,−30,15)):

1. 8 pairs/tile, in-kernel char window + LUT (the reference's sliding
   window, :98-113): 2 rolls + ~10 ALU per step → 2.8 GCUPS.
2. Precomputed per-diagonal score stream (this file's _prepare): the
   window roll AND the 3-select LUT hoisted to the XLA side, leaving
   1 roll + 5 ALU in the serial loop → 3.6 GCUPS.
3. **128 pairs/tile (current)**: `pltpu.roll` is fixed-LATENCY, not
   per-byte (README "Hardware notes": ~109 ns on a [128,128] tile — the
   same price the old [8,128] roll paid), so widening the sublane axis
   16× amortizes the roll across 16× the cells: one (128,128) roll +
   5 (128,128) ALU ops ≈ 162 ns for 16384 lane-cells per step.
   The score stream no longer fits VMEM whole, so a second grid axis
   streams it in step-blocks with the wavefront state carried in VMEM
   scratch across grid steps (TPU grids are sequential, minor axis
   fastest).

Per step d the recurrence is the reference's (source.cpp:1041-1048 in
math): lane j computes cell (j+1, d-j+1) as
  H_d[j] = max(0, H_{d-2}[j-1] + S[q[j], t[d-j]],
                  H_{d-1}[j] - gap, H_{d-1}[j-1] - gap)
with lane-shifted values from `pltpu.roll` + lane-0 mask — the TPU
equivalent of the reference's permute2x128/alignr shift (:156-157).

Out-of-matrix cells need no masking: their stream scores are NEG so
phantom cells decay to/below the column-0 boundary value 0 and can never
beat a real cell. Utilization is ~50% (the rhombus overhang the
reference measures as ~20% at 16 lanes, :1232-1236, grows with vector
width) — the batch row-scan remains the flagship; this schedule is for
small/medium batches of ≤128-mer queries and as the ladder parity member.
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

SUB = 128  # pairs per tile (16 int32 sublane groups — roll amortization)
LANE = 128  # query positions per strip
STEPS_PB = 32  # diagonals per grid step (stream block = 2 MB VMEM)


def _kernel(sins_ref, out_ref, h1_s, hr_s, h2_s, best_s, *, gap):
    b = pl.program_id(1)
    nb = pl.num_programs(1)
    zero = jnp.zeros((SUB, LANE), jnp.int32)
    gap32 = jnp.int32(gap)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANE), 1)
    lane0 = lane_ids == 0

    @pl.when(b == 0)
    def _():
        h1_s[:] = zero
        hr_s[:] = zero
        h2_s[:] = zero
        best_s[:] = zero

    def step(d, carry):
        h1, h1r, h2r, best = carry
        s = sins_ref[d]
        h = jnp.maximum(
            jnp.maximum(h2r + s, h1 - gap32),
            jnp.maximum(h1r - gap32, zero),
        )
        best = jnp.maximum(best, h)
        hr = jnp.where(lane0, zero, pltpu.roll(h, 1, 1))
        # rotate wavefront: d-1 becomes d-2 (rolled form already computed)
        return (h, hr, h1r, best)

    init = (h1_s[:], hr_s[:], h2_s[:], best_s[:])
    h1, h1r, h2r, best = jax.lax.fori_loop(0, STEPS_PB, step, init)
    h1_s[:] = h1
    hr_s[:] = h1r
    h2_s[:] = h2r
    best_s[:] = best

    @pl.when(b == nb - 1)
    def _():
        # per-pair lane reduction happens outside the kernel (a
        # lane-reduce + broadcast inside trips a Mosaic relayout on v5e)
        out_ref[0] = best

    del h1, h1r, h2r


@functools.partial(jax.jit, static_argnames=("n_steps", "gap"))
def _sw_wavefront_impl(sins, n_steps, gap):
    G = sins.shape[0] // n_steps  # number of SUB-sized groups
    nb = n_steps // STEPS_PB
    return pl.pallas_call(
        functools.partial(_kernel, gap=gap),
        out_shape=jax.ShapeDtypeStruct((G, SUB, LANE), jnp.int32),
        grid=(G, nb),
        in_specs=[
            pl.BlockSpec(
                (STEPS_PB, SUB, LANE),
                lambda i, b: (i * pl.num_programs(1) + b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, SUB, LANE), lambda i, b: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((SUB, LANE), jnp.int32) for _ in range(4)
        ],
    )(sins)


@functools.partial(jax.jit, static_argnames=("n", "m", "n_steps", "A"))
def _prepare(qs, ts, table, n, m, n_steps, A):
    """Per-diagonal score stream sins[g*S+d, p, j] = S[q_p[j], t_p[d-j]]
    (pads/out-of-range score NEG), built throughput-bound on the XLA side
    so the Pallas serial loop does no lookups at all. Steps beyond
    n+m-1 (block padding) score NEG everywhere and only decay. A = real
    alphabet size (4 DNA, 24 protein); table is [A+1, A+1] with the pad
    row/col scoring NEG."""
    B = qs.shape[0]
    G = B // SUB
    # prof[b, j, c] = S[q_b[j], c] over the A+1-char alphabet (A = pad)
    prof = table[jnp.minimum(qs.astype(jnp.int32), A)]  # [B, n, A+1]
    if n < LANE:
        prof = jnp.pad(
            prof, ((0, 0), (0, LANE - n), (0, 0)), constant_values=NEG
        )
    tin = jnp.full((B, n_steps + 1), A + 1, jnp.uint8)
    tin = tin.at[:, :m].set(ts)
    d_idx = jnp.arange(n_steps)[:, None]  # [n_steps, 1]
    j_idx = jnp.arange(LANE)[None, :]  # [1, LANE]
    # lane j at step d scores cell (j+1, d-j+1): target char t[d - j]
    raw = d_idx - j_idx
    # out-of-range (incl. negative: lanes above the diagonal are phantom
    # cells) must hit the pad slot, not clamp to t[0]
    t_at = jnp.where((raw < 0) | (raw > n_steps), n_steps, raw)
    tchar = jnp.minimum(tin[:, t_at], A).astype(jnp.int32)  # [B, S, LANE]
    # select per (b, d, j) the profile column tchar[b, d, j] from
    # prof[b, j, :] — an A-compare select tree (NOT take_along_axis over
    # a broadcast: XLA materializes the [B, S, LANE, A+1] operand, 34 GB
    # at the bench shape; selects fuse)
    sins = jnp.full(tchar.shape, NEG, jnp.int32)
    for c in range(A):
        sins = jnp.where(tchar == c, prof[:, None, :, c], sins)
    sins = (
        sins.reshape(G, SUB, n_steps, LANE)
        .transpose(0, 2, 1, 3)
        .reshape(G * n_steps, SUB, LANE)
        .astype(jnp.int32)
    )
    return sins


def _profile_table(params: ScoringParams) -> np.ndarray:
    A = params.alphabet_size
    tab = np.full((A + 1, A + 1), NEG, dtype=np.int32)
    tab[:A, :A] = params.matrix.astype(np.int32)
    return tab


def sw_wavefront_pallas(qs, ts, params: ScoringParams):
    """Anti-diagonal schedule scores; qs: [B, n] (n ≤ 128), ts: [B, m].
    Any substitution matrix (DNA or protein/BLOSUM62), linear gap.

    Returns [B] int32 scores identical to the batch kernel / oracle.
    """
    if not params.is_linear:
        raise NotImplementedError(
            "affine wavefront would need two more serial-loop rolls "
            "(E/F lane shifts); use xla_diag / rowscan tiers for Gotoh"
        )
    B, n = qs.shape
    m = ts.shape[1]
    if n > LANE:
        # Strip decomposition for long queries (the reference's strip
        # loop, source.cpp:126, generalized past its fixed 128-mers):
        # served by the round-5 slot-pipelined strip tile
        # (kernels/pallas/longpair_strip.py), which IS this family's
        # strip-decomposed form — block-rows of the query as the vector
        # axis, the ``yoko`` boundary carried in-register between the
        # 1-column-skewed slots — and runs 34.8 GCUPS/device vs the
        # 128-wide parallelogram's 11.2 ceiling (PARITY.md §2.3).
        # Long single pairs are few by definition: route per pair.
        from swtpu.kernels.pallas.longpair_strip import strip_tile

        outs = []
        zc = np.zeros(ts.shape[1], np.int32)
        zr = np.zeros(n, np.int32)
        for b in range(B):
            outs.append(
                int(strip_tile(qs[b], ts[b], zc, zr, 0, params)[2])
            )
        return np.asarray(outs, dtype=np.int32)
    A = params.alphabet_size
    qs = jnp.asarray(qs)
    ts = jnp.asarray(ts)
    Bp = -(-B // SUB) * SUB
    if Bp != B:
        qs = jnp.concatenate([qs, jnp.full((Bp - B, n), A, qs.dtype)])
        ts = jnp.concatenate([ts, jnp.full((Bp - B, m), A + 1, ts.dtype)])
    n_steps = -(-(n + m - 1) // STEPS_PB) * STEPS_PB
    table = jnp.asarray(_profile_table(params))
    sins = _prepare(qs, ts, table, n, m, n_steps, A)
    out = _sw_wavefront_impl(sins, n_steps, int(params.gap))
    return out.max(axis=2).reshape(Bp)[:B]
