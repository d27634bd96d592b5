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
from swtpu.kernels.xla.sw_scan import _extended_table, _sw_batch_diag_impl


def make_mesh(n_devices: Optional[int] = None, axis: str = "pairs") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_batch(arr, mesh: Mesh, axis: str = "pairs"):
    """Shard a [B, ...] batch over the mesh's data axis."""
    return jax.device_put(arr, NamedSharding(mesh, P(axis)))


def data_parallel_scores(
    qs, ts, params: ScoringParams, mesh: Mesh, axis: str = "pairs"
):
    """Batched SW scores with the batch sharded over `axis`.

    qs: [B, n], ts: [B, m] with B divisible by the mesh size. Returns [B]
    scores, sharded over the same axis (replicate with jax.device_get or an
    explicit with_sharding_constraint if needed).
    """
    import jax.numpy as jnp

    qs = shard_batch(qs, mesh, axis)
    ts = shard_batch(ts, mesh, axis)
    table = jax.device_put(
        jnp.asarray(_extended_table(params)), NamedSharding(mesh, P())
    )
    return _sw_batch_diag_impl(qs, ts, table, int(params.gap))
