"""Pod-scale data parallelism for the batch alignment engine.

The reference has no distributed layer (SURVEY.md §5); the mandated TPU
equivalent is: pair batches sharded on a data axis across the mesh,
substitution matrix and gap penalties replicated, per-chip score vectors
merged by the sharded output itself (all-gather happens only if the caller
asks for replicated output). The workload is embarrassingly parallel, so
the sharding rides ICI only for the final (tiny) score gather.

Axes:
  - "pairs": data-parallel axis over alignment pairs (dp).
  - future: "band" axis for sequence-parallel long-pair wavefronts (sp).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from swtpu.core.scoring import ScoringParams


def make_mesh(n_devices: Optional[int] = None, axis: str = "pairs") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_batch(arr, mesh: Mesh, axis: str = "pairs"):
    """Shard a [B, ...] batch over the mesh's data axis."""
    return jax.device_put(arr, NamedSharding(mesh, P(axis)))


_DP_CACHE: dict = {}


def data_parallel_scores(
    qs, ts, params: ScoringParams, mesh: Mesh, axis: str = "pairs",
    engine=None,
):
    """Batched SW scores with the batch sharded over `axis`.

    qs: [B, n], ts: [B, m] with B divisible by the mesh size. Returns [B]
    scores, sharded over the same axis (replicate with jax.device_get or an
    explicit with_sharding_constraint if needed). The per-shard scorer is
    ``best_engine(params)`` (Pallas flagship on TPU pods, XLA scans
    elsewhere), traced inside a shard_map so every device runs the
    single-chip hot path on its shard.
    """
    import jax.numpy as jnp
    from jax import shard_map

    from swtpu.ops.variants import cached_build, resolve_engine

    engine, key = resolve_engine(params, engine)
    # cache the jitted shard_map per (engine, mesh): rebuilding it every
    # call would re-trace + recompile every call
    fn = cached_build(
        _DP_CACHE,
        (key, mesh, axis),
        lambda: jax.jit(
            shard_map(
                engine,
                mesh=mesh,
                in_specs=(P(axis), P(axis)),
                out_specs=P(axis),
                check_vma=False,
            )
        ),
    )
    return fn(jnp.asarray(qs), jnp.asarray(ts))
