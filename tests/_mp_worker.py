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

    # 3) longpair across the process boundary: the sequence-parallel
    # engine's ppermute boundary exchange crosses the two processes
    # (devices 0-3 live here, 4-7 on the peer). Query sharded over the
    # global mesh via make_array_from_callback; target replicated.
    from swtpu.core.scoring import DNA_111
    from swtpu.oracle import sw_score, sw_traceback
    from swtpu.parallel.longpair import _merge_device_ends, _run_longpair

    Lq, Lt = 128, 192
    ql = rng.integers(0, 4, size=(Lq,)).astype(np.uint8)
    tl = np.concatenate([ql[:96], rng.integers(0, 4, 96).astype(np.uint8)])
    mesh_sp = make_mesh(axis="sp")
    q_g = jax.make_array_from_callback(
        (Lq,),
        NamedSharding(mesh_sp, P("sp")),
        lambda i: ql.astype(np.int32)[i],
    )
    t_g = jax.make_array_from_callback(
        (Lt,),
        NamedSharding(mesh_sp, P(None)),
        lambda i: tl.astype(np.int32)[i],
    )
    out = _run_longpair(q_g, t_g, DNA_111, mesh_sp, "sp", block=64)
    out_np = np.asarray(
        multihost_utils.process_allgather(out, tiled=True)
    ).reshape(-1, 3)[: mesh_sp.devices.size]
    score_lp, ei, ej = _merge_device_ends(out_np)
    want_s, want_path = sw_traceback(ql, tl, DNA_111)
    assert score_lp == want_s, f"longpair score {score_lp} != {want_s}"
    assert (ei, ej) == want_path[-1], "longpair endpoint mismatch"

    # 4) sharded search top-k: per-shard top-k + cross-process
    # all_gather merge, vs the oracle's full score matrix
    from swtpu.parallel.search import sharded_all_vs_all_topk

    Nq, Nt2 = 6, 40
    sq = rng.integers(0, 4, size=(Nq, 48)).astype(np.uint8)
    st = rng.integers(0, 4, size=(Nt2, 56)).astype(np.uint8)
    top, ids = sharded_all_vs_all_topk(
        sq, st, DNA_10_30_15, mesh, k=5
    )
    for qi in range(Nq):
        full_row = np.array(
            [sw_score(sq[qi], st[ti], DNA_10_30_15) for ti in range(Nt2)]
        )
        order = np.lexsort((np.arange(Nt2), -full_row))[:5]
        assert (top[qi] == full_row[order]).all(), f"topk scores q{qi}"
        assert (ids[qi] == order).all(), f"topk ids q{qi}"

    print(f"MP_OK {pid}", flush=True)


if __name__ == "__main__":
    main()
