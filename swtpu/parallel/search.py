"""Pod-scale all-vs-all database search (BASELINE config 5).

Queries are replicated; the target database is sharded over the mesh's data
axis. Each device scores its target shard against every query with the
flagship batch kernel, reduces to a per-shard top-k, and the shard top-ks
are merged deterministically (sort key: score desc, then target id asc —
the multi-host determinism rule from SURVEY.md §7).

Aux subsystems mandated by SURVEY.md §5, reference-equivalents of which do
not exist in the single-process reference:
- failure recovery: each target chunk is retried on failure
  (embarrassingly parallel ⇒ recompute is cheap and deterministic);
- checkpoint/resume: per-shard cursor + partial top-k persisted to an .npz
  after every chunk, so a restarted host resumes at its chunk cursor;
- observability: per-chunk structured JSON records.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from swtpu.core.scoring import ScoringParams


def init_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed for a multi-host pod (no-op single-host).

    On a real pod slice each host calls this before building the global
    mesh; under a single process it does nothing.
    """
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


@dataclasses.dataclass
class SearchCheckpoint:
    """Per-shard cursor + partial results, persisted after every chunk."""

    path: str

    def load(self):
        if not os.path.exists(self.path):
            return None
        z = np.load(self.path)
        return dict(
            cursor=int(z["cursor"]),
            scores=z["scores"],
            ids=z["ids"],
        )

    def save(self, cursor: int, scores: np.ndarray, ids: np.ndarray):
        # explicit .npz temp name: np.savez appends .npz only when the
        # name lacks it, which silently changes the file being written
        tmp = self.path + ".tmp.npz"
        np.savez(tmp, cursor=cursor, scores=scores, ids=ids)
        os.replace(tmp, self.path)


_SEARCH_STEP_CACHE: dict = {}
_PACK_CACHE = None  # (key, packed) for the resident-DB fast path
_ID_SENTINEL = np.iinfo(np.int32).max


def _search_step(engine, engine_key, Nq, n, C, m, k, kk, Nt, packed=False):
    """Jitted per-chunk search step: score the chunk, reduce it to its
    top-kk on device, and merge into the running [Nq, k] state — all in
    one executable, so the host loop moves only the chunk itself (and,
    when checkpointing, the tiny state) across the device link. The merge
    reproduces the repo-wide deterministic merge order (score desc, id
    asc) with two stable sorts; chunk-internal ties are safe because
    lax.top_k prefers the lower index, which here is the lower target id.
    Pad targets past the database end are masked by id (score -1 /
    id INT32_MAX, the state sentinels).

    ``packed``: the chunk arrives as the 2-bit wire ([C, ceil(m/4)]
    uint8, the reference's unpack discipline, source.cpp:1580-1774) and
    is decoded on device — 4x fewer upload bytes per chunk, which buys
    4x bigger chunks (fewer per-upload fixed costs) at constant wire
    pressure."""
    from swtpu.ops.variants import cached_build

    cache_key = (engine_key, Nq, n, C, m, k, kk, Nt, packed)

    @jax.jit
    def step(qs_dev, chunk_dev, state_s, state_i, c0):
        if packed:
            from swtpu.kernels.xla.unpack import unpack_2bit_device

            chunk_dev = unpack_2bit_device(chunk_dev)[:, :m]
        qq = jnp.broadcast_to(qs_dev[:, None, :], (Nq, C, n)).reshape(-1, n)
        tt = jnp.broadcast_to(chunk_dev[None, :, :], (Nq, C, m)).reshape(-1, m)
        scores = engine(qq, tt).reshape(Nq, C).astype(jnp.int32)
        ids = c0 + jnp.arange(C, dtype=jnp.int32)
        valid = ids < Nt
        s = jnp.where(valid[None, :], scores, jnp.int32(-1))
        ids_m = jnp.where(valid, ids, jnp.int32(_ID_SENTINEL))
        cs, cidx = jax.lax.top_k(s, kk)
        cid = jnp.take_along_axis(
            jnp.broadcast_to(ids_m[None, :], (Nq, C)), cidx, axis=1
        )
        ms = jnp.concatenate([state_s, cs], axis=1)
        mi = jnp.concatenate([state_i, cid], axis=1)
        o1 = jnp.argsort(mi, axis=1, stable=True)
        s1 = jnp.take_along_axis(ms, o1, axis=1)
        i1 = jnp.take_along_axis(mi, o1, axis=1)
        o2 = jnp.argsort(-s1, axis=1, stable=True)[:, :k]
        return (
            jnp.take_along_axis(s1, o2, axis=1),
            jnp.take_along_axis(i1, o2, axis=1),
        )

    # the cache entry keeps the engine alive, which keeps the key stable
    return cached_build(_SEARCH_STEP_CACHE, cache_key, lambda: step)


def _search_step_resident(
    engine, engine_key, Nq, n, C, m, k, kk, Nt, packed
):
    """Chunk step over a DEVICE-RESIDENT database: the (packed) DB is
    uploaded once and each step slices its chunk in-jit — zero
    per-chunk wire traffic. Same merge/masking semantics as
    `_search_step` (measured round 5: the streaming loop's wall on the
    tunnel is per-upload-cost-bound, so for DBs that fit HBM the
    resident sweep is the production configuration — 131K x 128 packed
    is 4 MB)."""
    from swtpu.ops.variants import cached_build

    cache_key = (
        "resident", engine_key, Nq, n, C, m, k, kk, Nt, packed
    )

    @jax.jit
    def step(qs_dev, db_dev, state_s, state_i, c0):
        chunk = jax.lax.dynamic_slice_in_dim(db_dev, c0, C, axis=0)
        if packed:
            from swtpu.kernels.xla.unpack import unpack_2bit_device

            chunk = unpack_2bit_device(chunk)[:, :m]
        qq = jnp.broadcast_to(qs_dev[:, None, :], (Nq, C, n)).reshape(-1, n)
        tt = jnp.broadcast_to(chunk[None, :, :], (Nq, C, m)).reshape(-1, m)
        scores = engine(qq, tt).reshape(Nq, C).astype(jnp.int32)
        ids = c0 + jnp.arange(C, dtype=jnp.int32)
        valid = ids < Nt
        s = jnp.where(valid[None, :], scores, jnp.int32(-1))
        ids_m = jnp.where(valid, ids, jnp.int32(_ID_SENTINEL))
        cs, cidx = jax.lax.top_k(s, kk)
        cid = jnp.take_along_axis(
            jnp.broadcast_to(ids_m[None, :], (Nq, C)), cidx, axis=1
        )
        ms = jnp.concatenate([state_s, cs], axis=1)
        mi = jnp.concatenate([state_i, cid], axis=1)
        o1 = jnp.argsort(mi, axis=1, stable=True)
        s1 = jnp.take_along_axis(ms, o1, axis=1)
        i1 = jnp.take_along_axis(mi, o1, axis=1)
        o2 = jnp.argsort(-s1, axis=1, stable=True)[:, :k]
        return (
            jnp.take_along_axis(s1, o2, axis=1),
            jnp.take_along_axis(i1, o2, axis=1),
        )

    return cached_build(_SEARCH_STEP_CACHE, cache_key, lambda: step)


_RESIDENT_DB_CACHE = None  # (key, device_array) — one resident DB


def _search_sweep_fused(
    engine, engine_key, Nq, n, C, m, k, kk, Nt, n_chunks, packed
):
    """The WHOLE resident sweep as one jitted lax.scan over chunks —
    one dispatch, one tiny fetch (max-throughput mode: no mid-sweep
    checkpoint/replay windows, so it engages only when the caller asked
    for none). Removes the last host-loop cost: 16 per-chunk dispatches
    were ~90 ms of the 168 ms resident wall."""
    from swtpu.ops.variants import cached_build

    cache_key = (
        "fused", engine_key, Nq, n, C, m, k, kk, Nt, n_chunks, packed
    )

    def build():
        step = _search_step_resident(
            engine, engine_key, Nq, n, C, m, k, kk, Nt, packed
        )

        @jax.jit
        def sweep(qs_dev, db_dev, state_s, state_i):
            def body(carry, c0):
                ss, si = carry
                ss, si = step(qs_dev, db_dev, ss, si, c0)
                return (ss, si), None

            (ss, si), _ = jax.lax.scan(
                body,
                (state_s, state_i),
                jnp.arange(n_chunks, dtype=jnp.int32) * C,
            )
            return ss, si

        return sweep

    return cached_build(_SEARCH_STEP_CACHE, cache_key, build)


def _retry_or_raise(e, attempt, max_retries, cursor, log):
    """Log a chunk failure; re-raise once retries are exhausted, otherwise
    sleep with exponential backoff and return (caller loops)."""
    if log is not None:
        log(
            json.dumps(
                dict(
                    event="search_chunk_retry",
                    cursor=cursor,
                    attempt=attempt,
                    error=f"{type(e).__name__}: {e}"[:500],
                )
            )
        )
    if attempt == max_retries:
        raise
    time.sleep(0.5 * (2**attempt))  # simple backoff


def all_vs_all_topk(
    queries: np.ndarray,
    targets: np.ndarray,
    params: ScoringParams,
    k: int = 10,
    chunk_size: int = 1024,
    engine: Optional[Callable] = None,
    checkpoint: Optional[SearchCheckpoint] = None,
    max_retries: int = 2,
    sync_every: int = 16,
    log: Optional[Callable[[str], None]] = None,
    packed: str | bool = "auto",
    resident: str | bool = "auto",
) -> Tuple[np.ndarray, np.ndarray]:
    """Top-k target hits per query over the (locally sharded) database.

    queries: [Nq, n] uint8, targets: [Nt, m] uint8 — the *local shard* of
    the database (each host passes its own shard plus an id offset via
    `SearchCheckpoint`/caller bookkeeping; single-host: the whole DB).
    Returns (scores [Nq, k], target_ids [Nq, k]) int32/int64, deterministic.

    ``resident``: keep the whole (packed) DB on device and slice chunks
    in-jit — zero per-chunk wire traffic; the DB upload itself is cached
    by array identity, so repeated query sets against one DB pay no
    wire at all. "auto" engages when the staged DB fits a 256 MB HBM
    budget. The chunk loop, checkpoint cursor, and windowed-replay
    semantics are unchanged (a replay re-dispatches from the snapshot;
    nothing re-uploads).

    The loop is double-buffered: the running top-k state lives ON DEVICE
    (per-chunk device top-k + deterministic merge fused into one jitted
    step), chunk i+1's upload is issued before chunk i's step is awaited,
    and the host only blocks at *sync points* — every ``sync_every``
    chunks (and at the end). Between sync points dispatches pipeline
    behind device compute, so wall throughput tracks the engine rather
    than the per-chunk host round-trip (measured 170x gap before this).

    Failure recovery keeps the same guarantees at window granularity: the
    functional (state, cursor) snapshot from the last sync point replays
    the window deterministically on any runtime fault, up to
    ``max_retries`` times; ``checkpoint`` persists at sync points so a
    restarted host resumes at its cursor. ``max_retries=0`` with no
    checkpoint never syncs mid-run (max-throughput mode: errors surface
    at the final fetch).

    ``packed``: ship DB chunks as the 2-bit wire with device-side decode
    (True / False / "auto" = DNA codes only) — 4x fewer bytes per
    upload, letting callers raise chunk_size at constant wire pressure
    (measured round 5: the loop's wall is per-upload-fixed-cost- and
    host-staging-bound, not byte-bound, so the wire's win is realized
    through bigger chunks + the resident-DB pack cache). Replay,
    checkpoint, and merge semantics are unchanged (the snapshot replays
    re-pack nothing — the packed DB is staged once per DB object).
    """
    from swtpu.ops.variants import resolve_engine

    engine, engine_key = resolve_engine(params, engine)

    Nq, Nt = queries.shape[0], targets.shape[0]
    targets_packed = None
    if packed == "auto":
        packed = bool(
            params.alphabet_size == 4
            and targets.dtype == np.uint8
            and (targets.size == 0 or int(targets.max()) < 4)
        )
    if packed and targets.size and (
        params.alphabet_size != 4 or int(targets.max()) >= 4
    ):
        raise ValueError(
            "packed=True needs 2-bit-encodable targets (DNA codes 0-3)"
        )
    if packed:
        # one pass over the DB (~6 ms/Mbp of numpy on this host — 96 ms
        # for the 16 Mbp bench DB, a third of the loop's wall), cached
        # by array identity: production streams MANY query sets against
        # ONE resident DB, so the pack amortizes to zero like
        # jax.device_put's own id-keyed staging
        # identity check via a HELD reference — a bare id() key is
        # unsound: CPython recycles a freed array's address, and the
        # round-5 fuzz caught exactly that (12 stale-DB top-k
        # mismatches across 2376 rounds of same-shaped fresh DBs)
        global _PACK_CACHE
        if _PACK_CACHE is not None and _PACK_CACHE[0] is targets:
            targets_packed = _PACK_CACHE[1]
        else:
            from swtpu.core.encode import pack_2bit

            m4 = -(-targets.shape[1] // 4) * 4
            tp = targets
            if m4 != targets.shape[1]:
                tp = np.concatenate(
                    [tp, np.zeros((Nt, m4 - tp.shape[1]), tp.dtype)],
                    axis=1,
                )
            targets_packed = pack_2bit(tp.reshape(-1)).reshape(
                Nt, m4 // 4
            )
            _PACK_CACHE = (targets, targets_packed)
    best_s = np.full((Nq, k), -1, np.int32)
    best_i = np.full((Nq, k), _ID_SENTINEL, np.int32)
    start = 0
    if checkpoint is not None:
        state = checkpoint.load()
        if state is not None:
            start = state["cursor"]
            best_s, best_i = state["scores"], state["ids"]

    kk = min(k, chunk_size)
    t_pad = params.alphabet_size + 1
    staged = targets_packed if packed else targets
    if resident == "auto":
        resident = staged.nbytes <= 256 * 1024 * 1024
    if resident:
        global _RESIDENT_DB_CACHE
        Ntp = -(-Nt // chunk_size) * chunk_size
        rkey = (staged.shape, chunk_size, bool(packed))
        if (
            _RESIDENT_DB_CACHE is not None
            and _RESIDENT_DB_CACHE[0] is targets
            and _RESIDENT_DB_CACHE[1] == rkey
        ):
            db_dev = _RESIDENT_DB_CACHE[2]
        else:
            pad_rows = Ntp - Nt
            db_host = staged
            if pad_rows:
                db_host = np.concatenate(
                    [
                        db_host,
                        np.full(
                            (pad_rows, db_host.shape[1]),
                            0 if packed else t_pad,
                            db_host.dtype,
                        ),
                    ]
                )
            db_dev = jax.device_put(np.ascontiguousarray(db_host))
            _RESIDENT_DB_CACHE = (targets, rkey, db_dev)
        step = _search_step_resident(
            engine, engine_key, Nq, queries.shape[1], chunk_size,
            targets.shape[1], k, kk, Nt, bool(packed),
        )
        if checkpoint is None and max_retries == 0 and start == 0:
            # max-throughput mode: nothing needs mid-sweep host
            # visibility — run the whole sweep as one executable
            sweep = _search_sweep_fused(
                engine, engine_key, Nq, queries.shape[1], chunk_size,
                targets.shape[1], k, kk, Nt,
                -(-Nt // chunk_size), bool(packed),
            )
            ss, si = sweep(
                jax.device_put(queries), db_dev,
                jnp.asarray(best_s), jnp.asarray(best_i),
            )
            return np.asarray(ss), np.asarray(si)
    else:
        step = _search_step(
            engine, engine_key, Nq, queries.shape[1], chunk_size,
            targets.shape[1], k, kk, Nt, packed=bool(packed),
        )
    sync = checkpoint is not None or max_retries > 0

    def padded(c0):
        if resident:
            return db_dev  # chunk sliced in-jit by c0
        src = targets_packed if packed else targets
        chunk = src[c0 : c0 + chunk_size]
        # pad the tail chunk so compiled shapes stay constant; pad rows
        # are masked out by id (>= Nt) inside the step (packed wire: pad
        # rows decode to code 0 — equally id-masked)
        if chunk.shape[0] < chunk_size:
            pad = np.full(
                (chunk_size - chunk.shape[0], chunk.shape[1]),
                0 if packed else t_pad,
                dtype=chunk.dtype,
            )
            chunk = np.concatenate([chunk, pad])
        return jax.device_put(np.ascontiguousarray(chunk))

    queries_dev = jax.device_put(queries)
    state_s = jnp.asarray(best_s)
    state_i = jnp.asarray(best_i)
    c_list = list(range(start, Nt, chunk_size))
    snap = (state_s, state_i, 0)  # replay point: (state, chunk index)
    step_succeeded = False  # becomes True after the first clean execution
    attempt = 0
    i = 0
    staged = padded(c_list[0]) if c_list else None
    while i < len(c_list):
        c0 = c_list[i]
        t0 = time.perf_counter()
        try:
            cur = staged
            if i + 1 < len(c_list):
                staged = padded(c_list[i + 1])  # upload rides behind compute
            new_s, new_i = step(
                queries_dev, cur, state_s, state_i, jnp.int32(c0)
            )
            # tracing happens inside the first step() call; once any
            # dispatch returned, later TypeError/ValueError are runtime
            # faults, not trace errors
            step_succeeded = True
            state_s, state_i = new_s, new_i
            at_sync = sync and (
                i + 1 - snap[2] >= sync_every or i + 1 == len(c_list)
            )
            if at_sync:
                state_s.block_until_ready()
                snap = (state_s, state_i, i + 1)
                attempt = 0
                if checkpoint is not None:
                    checkpoint.save(
                        c0 + chunk_size,
                        np.asarray(state_s),
                        np.asarray(state_i),
                    )
            if log is not None:
                log(
                    json.dumps(
                        dict(
                            event="search_chunk",
                            cursor=c0,
                            chunk=min(chunk_size, Nt - c0),
                            wall_ms=round(
                                (time.perf_counter() - t0) * 1e3, 1
                            ),
                            pairs=Nq * min(chunk_size, Nt - c0),
                        )
                    )
                )
            i += 1
        except (TypeError, ValueError, NotImplementedError) as e:
            # Before the step has ever executed cleanly these are
            # deterministic trace/shape/config errors — retrying the
            # same executable cannot help. AFTER a clean execution the
            # same Python types can also carry genuine runtime faults
            # (XLA maps some device/callback failures onto ValueError),
            # so they fall through to the replay path below.
            if not step_succeeded:
                raise
            _retry_or_raise(e, attempt, max_retries, c0, log)
            attempt += 1
            state_s, state_i, i = snap
            staged = padded(c_list[i])
        except Exception as e:  # runtime/device/transport failures
            _retry_or_raise(e, attempt, max_retries, c0, log)
            attempt += 1
            state_s, state_i, i = snap
            staged = padded(c_list[i])
    return np.asarray(state_s), np.asarray(state_i)


_SHARDED_TOPK_CACHE: dict = {}


def sharded_all_vs_all_topk(
    queries: np.ndarray,
    targets: np.ndarray,
    params: ScoringParams,
    mesh: Mesh,
    k: int = 10,
    axis: str = "pairs",
    engine: Optional[Callable] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Single-controller sharded search: target DB split over the mesh axis,
    queries replicated, per-shard scores reduced to top-k on device, shard
    top-ks merged deterministically (score desc, then id asc).

    The per-shard scorer is the fastest engine for ``params`` on this
    backend (``best_engine``: Pallas flagship / profile / affine tiers on
    TPU, XLA scans elsewhere), traced inside the shard_map so a pod runs
    the same kernel the single-chip bench does. Any DB size works: the DB
    is padded internally to the shard grid with pad targets whose hits are
    masked out of the merge (score -1 / id INT32_MAX sentinels, matching
    all_vs_all_topk). Demonstrates the ICI-riding layout (scores gathered,
    not raw DP) on any mesh, incl. the virtual CPU mesh used in tests.
    """
    from jax import shard_map

    from swtpu.ops.variants import resolve_engine

    engine, engine_key = resolve_engine(params, engine)

    n_dev = mesh.devices.size
    Nq = queries.shape[0]
    Nt = targets.shape[0]
    m = targets.shape[1]
    # pad the DB to the shard grid; pad targets (t-pad char = alphabet+1)
    # are masked out of the merge below by id
    Ntp = -(-Nt // n_dev) * n_dev
    if Ntp != Nt:
        t_pad = params.alphabet_size + 1
        targets = np.concatenate(
            [targets, np.full((Ntp - Nt, m), t_pad, targets.dtype)]
        )
    shard = Ntp // n_dev
    kk = min(k, shard)
    n = queries.shape[1]

    # cache the jitted shard_map per (engine, mesh, geometry): rebuilding
    # it every call would re-trace AND recompile every call (measured
    # ~10 s/call on the TPU tunnel vs ~ms once cached)
    cache_key = (engine_key, mesh, axis, Nq, n, shard, m, kk)
    fn = _SHARDED_TOPK_CACHE.get(cache_key)
    if fn is None:
        from swtpu.ops.variants import cached_build

        def local(qs, ts_shard):
            ts_local = ts_shard.reshape(shard, -1)
            qq = jnp.broadcast_to(
                qs[:, None, :], (Nq, shard, n)
            ).reshape(-1, n)
            tt = jnp.broadcast_to(
                ts_local[None, :, :], (Nq, shard, m)
            ).reshape(-1, m)
            scores = engine(qq, tt).reshape(Nq, shard)
            top_s, top_i = jax.lax.top_k(scores, kk)
            my = jax.lax.axis_index(axis)
            top_i = top_i + my * shard
            # gather every shard's top-k: [n_dev * kk] per query over ICI
            gs = jax.lax.all_gather(top_s, axis, axis=1).reshape(Nq, -1)
            gi = jax.lax.all_gather(top_i, axis, axis=1).reshape(Nq, -1)
            return gs, gi

        fn = cached_build(
            _SHARDED_TOPK_CACHE,
            cache_key,
            lambda: jax.jit(
                shard_map(
                    local,
                    mesh=mesh,
                    in_specs=(P(), P(axis)),
                    out_specs=(P(), P()),
                    check_vma=False,
                )
            ),
        )
    gs, gi = fn(jnp.asarray(queries), jnp.asarray(targets))
    gs = np.asarray(gs).astype(np.int64)
    gi = np.array(gi)  # writable copy (device arrays map read-only)
    pad_hit = gi >= Nt
    gs[pad_hit] = -1
    gi[pad_hit] = np.iinfo(np.int32).max
    order = np.lexsort((gi, -gs), axis=1)[:, :k]
    out_s = np.take_along_axis(gs, order, axis=1)
    out_i = np.take_along_axis(gi, order, axis=1)
    if out_s.shape[1] < k:  # k > Ntp/n_dev * n_dev gathered candidates
        padw = k - out_s.shape[1]
        out_s = np.pad(out_s, ((0, 0), (0, padw)), constant_values=-1)
        out_i = np.pad(
            out_i, ((0, 0), (0, padw)),
            constant_values=np.iinfo(np.int32).max,
        )
    return out_s.astype(np.int32), out_i.astype(np.int32)
