"""Honest device timing over the axon TPU tunnel.

Three hazards when timing through the remote-execution relay:
1. dispatch is async and ``block_until_ready`` can resolve before the device
   work is actually finished;
2. repeated calls with identical (executable, args) can be served from a
   result cache;
3. fetching non-trivial outputs pays a slow host<->device tunnel transfer
   (~1 GB/s), which swamps kernel time.

The fix used here: run the kernel K times *inside one jit* as a serial
``lax.scan`` chain (each step consumes a value derived from the previous
step's output, so steps cannot be elided or reordered), salt the chain with
a fresh scalar every call (defeats result caching), reduce the output to a
single scalar on device (fetch cost ~nothing), and force the fetch with
``np.asarray``. Overhead (dispatch + scalar fetch) is measured with a K=1
chain and subtracted.
"""

from __future__ import annotations

import time
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _chain(fn: Callable, k: int):
    """Build jitted salted serial chain running fn k times."""

    @jax.jit
    def run(salt, *args):
        def step(carry, _):
            # salt the first arg with a truly runtime-dependent bit so the
            # body can't be hoisted out of the scan (x % 1 or x & 0 would be
            # constant-folded); the perturbation changes results, which is
            # fine — this is a timing chain, not a correctness check
            a0 = args[0] + (carry & 1).astype(args[0].dtype)
            out = fn(a0, *args[1:])
            red = jnp.sum(out.astype(jnp.int32)) if out.dtype != jnp.float32 else jnp.sum(out)
            return carry + red.astype(jnp.int32), None

        total, _ = jax.lax.scan(step, salt, None, length=k)
        return total

    return run


def time_kernel(
    fn: Callable,
    args: Sequence,
    k: int = 16,
    reps: int = 5,
    max_k: int = 4096,
) -> float:
    """Best-case wall seconds per single fn(*args) execution on device.

    min-of-reps, not median: tunnel/queueing noise is strictly additive
    (measured spreads of 3-4x between reps of identical device work), so
    the minimum is the consistent estimator of device throughput.

    The chain length adapts upward until the measured signal (chain minus
    K=1 overhead) clearly dominates the overhead itself — otherwise a fast
    kernel timed with a short chain reads as pure ms-scale tunnel-overhead
    noise and the subtraction returns garbage (observed: 10x-inflated
    GCUPS at small batch with k=4). Each growth step recompiles the chain,
    so attempts are capped.
    """
    run_1 = _chain(fn, 1)
    np.asarray(run_1(jnp.int32(0), *args))  # warmup/compile

    def measure(run, salt):
        t0 = time.perf_counter()
        np.asarray(run(jnp.int32(salt), *args))
        return time.perf_counter() - t0

    salt = int(time.time() * 1e3) % 100000
    o = min(measure(run_1, salt + 1000 + i) for i in range(reps))

    for _ in range(3):  # at most 3 chain compiles
        run_k = _chain(fn, k)
        np.asarray(run_k(jnp.int32(0), *args))
        tk = min(measure(run_k, salt + i) for i in range(reps))
        signal = tk - o
        per = signal / (k - 1)  # per-call time at the k actually measured
        if signal >= 4 * o or k >= max_k or tk >= 1.0:
            break
        # grow k so the next chain's expected signal clears the 4*o bar
        # (with margin); a non-positive signal means the kernel is far
        # smaller than the overhead noise — jump straight to the cap
        per_est = per if signal > 0 else 0.0
        k_need = int(6 * o / per_est) + 1 if per_est > 0 else max_k
        k = min(max_k, max(2 * k, k_need))
    return float(max(per, 1e-9))
