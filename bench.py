#!/usr/bin/env python
"""Headline benchmark: batched 128x128 DNA Smith-Waterman, scoring (10,-30,15).

Reproduces the reference's SpeedTest workload (source.cpp:3032-3147: 1M
alignments of random 128-mers) on TPU and reports GCUPS. One alignment =
128*128 = 16384 DP cells. Baseline to beat: reference simd9 on Ryzen 3700X =
8.70 GCUPS (BASELINE.md).

Prints ONE JSON line:
  {"metric": "GCUPS", "value": N, "unit": "GCUPS", "vs_baseline": N}
"""

import argparse
import json
import time

import numpy as np

BASELINE_GCUPS = 8.70  # reference simd9, Ryzen 3700X, BASELINE.md


def _make_inputs(batch, n, m, seed=10000):
    rng = np.random.default_rng(seed)
    qs = rng.integers(0, 4, size=(batch, n)).astype(np.uint8)
    ts = rng.integers(0, 4, size=(batch, m)).astype(np.uint8)
    return qs, ts


def get_engine(name):
    """Return (fn(qs, ts) -> scores, label). Best engine first."""
    from swtpu.core.scoring import DNA_10_30_15

    if name in ("auto", "pallas"):
        try:
            from swtpu.kernels.pallas import sw_batch_pallas

            return (
                lambda qs, ts: sw_batch_pallas(qs, ts, DNA_10_30_15),
                "pallas",
            )
        except ImportError:
            if name == "pallas":
                raise
    from swtpu.kernels.xla import sw_batch_diag

    return lambda qs, ts: sw_batch_diag(qs, ts, DNA_10_30_15), "xla"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32768)
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--m", type=int, default=128)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--engine", default="auto", choices=["auto", "xla", "pallas"])
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    import jax

    from swtpu.utils import time_kernel

    fn, label = get_engine(args.engine)
    qs_h, ts_h = _make_inputs(args.batch, args.n, args.m)
    qs = jax.device_put(qs_h)
    ts = jax.device_put(ts_h)

    # time_kernel runs the kernel as a salted serial chain inside one jit:
    # immune to async-dispatch lies, relay result caching, and slow
    # host<->device tunnel transfers (see swtpu/utils/timing.py).
    # best of 3 independent measurements (tunnel noise is additive).
    # The axon tunnel occasionally drops a call with a transient
    # FAILED_PRECONDITION; retry the whole measurement rather than lose
    # the recorded headline on a one-off hiccup.
    times = None
    for attempt in range(3):
        try:
            times = [time_kernel(fn, (qs, ts), k=args.iters) for _ in range(3)]
            break
        except Exception as e:  # jax.errors.JaxRuntimeError and kin
            if attempt == 2:
                raise
            print(f"# transient device error (attempt {attempt + 1}): {e!r}")
            time.sleep(10.0)
            qs = jax.device_put(qs_h)
            ts = jax.device_put(ts_h)
    best = min(times)

    cells = args.batch * args.n * args.m
    gcups = cells / best / 1e9
    ms_per_1m = 1e6 / args.batch * best * 1e3

    if args.verbose:
        dev = jax.devices()[0]
        print(
            f"# engine={label} device={dev.device_kind} batch={args.batch} "
            f"times_ms={[round(t*1e3,2) for t in times]} "
            f"ms/1M={ms_per_1m:.0f} (reference simd9 ryzen: 1884)"
        )
    print(
        json.dumps(
            {
                "metric": f"sw_batch_{args.n}x{args.m}_gcups_{label}",
                "value": round(gcups, 3),
                "unit": "GCUPS",
                "vs_baseline": round(gcups / BASELINE_GCUPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
