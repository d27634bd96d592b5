"""SWAR sub-word probe (round 5, VERDICT #9).

The reference's 8-bit tier packs 4x the cells per vector register
(source.cpp:1105-1522). v5e Mosaic rejects sub-32-bit vector compares
(PROBE_SUBWORD_r04.txt), but 4x int8-in-int32 SWAR with masked carries
needs no sub-word compares — this probe measures whether the emulation
cost leaves any density win for the fixed-(1,1,1) family.

Per DP cell the SW inner loop is max-dominated (2 maxes + 1 add/sub —
sw_batch.py's fused chain). The SWAR equivalents on int32 lanes:

- byte-wise unsigned max: borrow-propagation-masked subtract (4 ops) +
  sign-to-byte mask expansion (3) + blend (3) ~ 10 ops / 4 cells
- byte-wise saturating add: masked add (5) + overflow clamp (3)
  ~ 8 ops / 4 cells

So the analytic bound is ~(10+10+8)/4 = 7 ops per cell against int32's
3 — SWAR only wins if the VPU were >2.3x issue-starved on 32-bit,
which the flagship's issue-bound 468 GCUPS already contradicts. This
probe measures the two chains head to head anyway (the committed-
artifact discipline of PROBE_SUBWORD_r04): a timing kernel runs N
serial steps of each recurrence skeleton on (8,128) tiles and reports
effective Gcell-ops/s.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H = int(np.int32(np.uint32(0x80808080)))  # byte sign bits (int32 view)
L7 = 0x7F7F7F7F


def _swar_max_u8(x, y):
    """Byte-wise unsigned max of 4 packed uint8 per int32 lane.

    Per-byte x >= y (Hacker's Delight-style): high bits decide when they
    differ; equal high bits fall to the borrow-free low-7 subtraction
    ((xl | H) - yl keeps each byte's borrow in its own bit 7)."""
    noty = jnp.bitwise_xor(y, jnp.int32(-1))
    xh_gt = jnp.bitwise_and(x, noty)
    eq = jnp.bitwise_xor(jnp.bitwise_xor(x, y), jnp.int32(-1))
    d = (jnp.bitwise_or(jnp.bitwise_and(x, jnp.int32(L7)), jnp.int32(H))
         - jnp.bitwise_and(y, jnp.int32(L7)))
    ge = jnp.bitwise_and(
        jnp.bitwise_or(xh_gt, jnp.bitwise_and(eq, d)), jnp.int32(H)
    )
    mask = jax.lax.shift_right_logical(ge, 7) * jnp.int32(0xFF)
    return jnp.bitwise_or(
        jnp.bitwise_and(x, mask),
        jnp.bitwise_and(y, jnp.bitwise_xor(mask, jnp.int32(-1))),
    )


def _swar_adds_u8(x, y):
    """Byte-wise saturating (unsigned) add of packed uint8."""
    lo = jnp.bitwise_and(x, jnp.int32(L7)) + jnp.bitwise_and(
        y, jnp.int32(L7)
    )
    hx = jnp.bitwise_and(x, jnp.int32(H))
    hy = jnp.bitwise_and(y, jnp.int32(H))
    s = jnp.bitwise_xor(jnp.bitwise_xor(lo, hx), hy)
    # carry out of bit 7 = overflow per byte
    ovf = jnp.bitwise_or(
        jnp.bitwise_and(hx, hy),
        jnp.bitwise_and(jnp.bitwise_or(hx, hy),
                        jnp.bitwise_and(lo, jnp.int32(H))),
    )
    sat = jax.lax.shift_right_logical(ovf, 7) * jnp.int32(0xFF)
    return jnp.bitwise_or(s, sat)


def _kernel(x_ref, o_ref, *, steps, mode):
    x = x_ref[0]
    y = x_ref[1]
    acc = x
    for _ in range(steps):
        if mode == "swar":
            acc = _swar_max_u8(_swar_adds_u8(acc, y), x)
        else:
            acc = jnp.maximum(acc + y, x)
    o_ref[...] = acc


@functools.partial(jax.jit, static_argnames=("steps", "mode"))
def _run(x, steps, mode):
    return pl.pallas_call(
        functools.partial(_kernel, steps=steps, mode=mode),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


def main():
    from swtpu.utils.timing import time_kernel

    rng = np.random.default_rng(10000)
    x = jnp.asarray(
        rng.integers(0, 2**31 - 1, (2, 8, 128)), jnp.int32
    )
    steps = 512
    lanes = 8 * 128
    print(f"# SWAR probe, v5e, steps={steps}, tile (8,128) int32")
    out = {}
    for mode, cells_per_lane in (("int32", 1), ("swar", 4)):
        sec = time_kernel(lambda a: _run(a, steps, mode), [x], k=64)
        cellops = steps * lanes * cells_per_lane / sec / 1e9
        out[mode] = cellops
        print(
            f"{mode}: {sec*1e6:.2f} us/call, "
            f"{cellops:.1f} Gcell-recurrences/s "
            f"({cells_per_lane} cells/lane)"
        )
    r = out["swar"] / out["int32"]
    print(
        f"swar/int32 density ratio: {r:.2f} "
        f"({'WIN' if r > 1.05 else 'NO WIN — int32 stays the tier'})"
    )


if __name__ == "__main__":
    main()
