"""Device-side 2-bit DNA codec (≙ the reference's unpack family,
source.cpp:1580-1774).

The reference ships 4 AVX2 refinements of the 2-bit decode; on TPU the
whole transform is a handful of elementwise ops that XLA fuses into one
VPU pass, so a single implementation is already at the bandwidth roofline
— the "ladder" collapses by design. Bit layout parity with the reference
scalar ``unpack`` (byte i bits 2*(i%4)) is inherited from
swtpu.core.encode and asserted in tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def unpack_2bit_device(packed):
    """[..., P] uint8 2-bit-packed → [..., 4P] uint8 codes 0..3."""
    packed = jnp.asarray(packed, dtype=jnp.uint8)
    shifts = jnp.arange(4, dtype=jnp.uint8) * 2
    out = (packed[..., :, None] >> shifts[None, :]) & 3
    return out.reshape(*packed.shape[:-1], packed.shape[-1] * 4)


@jax.jit
def pack_2bit_device(codes):
    """[..., 4P] uint8 codes 0..3 → [..., P] uint8 packed."""
    codes = jnp.asarray(codes, dtype=jnp.uint8)
    g = codes.reshape(*codes.shape[:-1], -1, 4)
    shifts = jnp.arange(4, dtype=jnp.uint8) * 2
    return jnp.bitwise_or.reduce(
        (g & 3) << shifts[None, :], axis=-1
    ).astype(jnp.uint8)
