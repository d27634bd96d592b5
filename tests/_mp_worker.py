"""Worker process for the real multi-process jax.distributed test.

Each worker owns 4 virtual CPU devices; two workers form one 8-device
global mesh over a localhost coordinator — the mechanism of SURVEY.md
§4.7's "N>=2 hosts" axis (jax.distributed + global mesh + cross-process
collectives), not just the single-process virtual-mesh simulation the
rest of the suite uses.

Usage: python tests/_mp_worker.py PROCESS_ID NUM_PROCESSES PORT
Prints "MP_OK <pid>" on success; any assertion kills the exit code.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])

    from swtpu.parallel.search import init_distributed

    init_distributed(
        coordinator=f"localhost:{port}", num_processes=nproc, process_id=pid
    )
    assert jax.process_index() == pid
    n_global = len(jax.devices())
    assert n_global == 4 * nproc, f"global devices {n_global}"
    assert len(jax.local_devices()) == 4

    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    from swtpu.core.scoring import DNA_10_30_15
    from swtpu.oracle import sw_score_batch
    from swtpu.parallel import data_parallel_scores, make_mesh

    # every process regenerates the same global batch (fixed seed 10000,
    # the reference's), then contributes only its local rows
    B, n, m = 64, 48, 40
    rng = np.random.default_rng(10000)
    qs = rng.integers(0, 4, size=(B, n)).astype(np.uint8)
    ts = rng.integers(0, 4, size=(B, m)).astype(np.uint8)

    mesh = make_mesh()  # all 8 global devices on the "pairs" axis
    sharding = NamedSharding(mesh, P("pairs"))
    # each process materializes exactly the shards it owns (order-proof:
    # the callback receives the global index per addressable device)
    qs_g = jax.make_array_from_callback((B, n), sharding, lambda i: qs[i])
    ts_g = jax.make_array_from_callback((B, m), sharding, lambda i: ts[i])

    scores = data_parallel_scores(qs_g, ts_g, DNA_10_30_15, mesh)
    want = sw_score_batch(qs, ts, DNA_10_30_15)

    # 1) every addressable shard matches the oracle slice it owns
    for shard in scores.addressable_shards:
        idx = shard.index[0]
        got = np.asarray(shard.data)
        assert (got == want[idx]).all(), f"shard {idx} mismatch on p{pid}"

    # 2) a real cross-process collective: allgather the sharded scores
    full = multihost_utils.process_allgather(scores, tiled=True)
    assert (np.asarray(full) == want).all(), "allgather mismatch"

    print(f"MP_OK {pid}", flush=True)


if __name__ == "__main__":
    main()
