"""Mosaic sub-32-bit vector-compute probe (VERDICT r3 "missing #3").

The reference's precision ladder is 16-bit (simd1-9, source.cpp:62-66)
and 8-bit (the 8b111 family, :1105). swtpu's compute tiers are int32
because v5e Mosaic rejects sub-32-bit vector compare/select — the ops
every SW inner loop is made of. This probe makes that claim a committed
artifact: it compiles the minimal cmp+select kernel at int32 / int16 /
int8 on the attached TPU and records exactly what the compiler says,
plus a bf16 arithmetic probe (bf16 compare/select works, which is why
the reduced-precision rung that EXISTS is the bf16 storage/compute tier
+ exact int32 promotion, batch/promote.py).

Run: python tools/probe_subword.py  (writes PROBE_SUBWORD_<rev>.txt-style
output to stdout; the committed artifact is its captured output).
"""

import re
import traceback

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(dtype, name, op):
    def kern_cmp(x_ref, y_ref, o_ref):
        x, y = x_ref[...], y_ref[...]
        # the SW dead-guard primitive: compare + select + add
        o_ref[...] = jnp.where(x > y, x + y, y)

    def kern_max(x_ref, y_ref, o_ref):
        x, y = x_ref[...], y_ref[...]
        # max-only recurrence (what the bf16 tier restricts itself to)
        o_ref[...] = jnp.maximum(x + y, y)

    kern = kern_cmp if op == "cmp+select" else kern_max
    try:
        x = jnp.ones((8, 128), dtype)
        out = pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((8, 128), dtype)
        )(x, x)
        jax.block_until_ready(out)
        print(f"{name} {op}: OK")
        return True
    except Exception as e:  # noqa: BLE001
        msg = "".join(traceback.format_exception(type(e), e, e.__traceback__))
        msg = re.sub(r"\x1b\[[0-9;]*m", "", msg)  # strip ANSI codes
        keys = ("comparison", "cmpi", "not supported", "Not implemented",
                "unsupported", "UNIMPLEMENTED")
        hit = [ln.strip() for ln in msg.splitlines()
               if any(k in ln for k in keys)]
        detail = hit[0] if hit else msg.strip().splitlines()[-1]
        print(f"{name} {op}: FAILED -> {detail[:300]}")
        return False


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")
    print(f"jax {jax.__version__}")
    results = {}
    for dt, name in (
        (jnp.int32, "int32"),
        (jnp.int16, "int16"),
        (jnp.int8, "int8"),
        (jnp.bfloat16, "bfloat16"),
    ):
        for op in ("cmp+select", "max-only"):
            results[(name, op)] = probe(dt, name, op)
    print()
    if results[("int32", "cmp+select")] and not (
        results[("int16", "cmp+select")] or results[("int8", "cmp+select")]
    ):
        print(
            "CONCLUSION: v5e Mosaic supports the SW inner-loop primitive "
            "(vector cmp+select) at 32-bit only; 16/8-bit are storage "
            "formats on this chip. The reduced-precision rungs are "
            "therefore: bf16 compute tier + exact int32 overflow "
            "promotion (batch/promote.py, device-fused since round 4), "
            "8-bit band-history compression, int8 profiles, and the "
            "2-bit wire formats."
        )


if __name__ == "__main__":
    main()
