"""Variable-length streaming engine: length-sorted packed dispatch.

The reference operates on fixed 128-mers; a production engine sees mixed
lengths. Under jit every distinct (n, m) shape is a separate compile, so
the varlen engine sorts pairs by query length, splits the sorted batch
into at most ``max_buckets`` contiguous groups, pads each group to a
shape quantum (so shapes recur across calls and compiles are reused),
runs each group as ONE padded batch through the chosen engine, and
scatters results back to input order. Pad chars carry the usual
guarantee (pads only lose), so padding never changes a score.

Round-2 postmortem: the first version dispatched one geometric bucket
per length decade (factor 1.5) and built every bucket with a Python
per-pair copy loop — 65.7K aln/s on the 32K mixed-read workload, ~100x
below the flagship, all of it host overhead and per-bucket dispatch.
This version is vectorized end to end and caps the dispatch count.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import numpy as np

from swtpu.core.scoring import ScoringParams

Q_PAD = 4
T_PAD = 5

#: shape quanta: bucket dims round up to these so repeated calls with
#: similar length mixes hit the same compiled executables
Q_QUANT = 32
T_QUANT = 64


def bucket_edges(max_len: int, min_edge: int = 32, factor: float = 1.5):
    """Geometric bucket edges up to max_len."""
    edges = [min_edge]
    while edges[-1] < max_len:
        edges.append(
            min(int(np.ceil(edges[-1] * factor)), max_len)
        )
    return edges


_FUSED_MASK_CACHE: dict = {}


def _fused_masked_engine(engine, engine_key, n, m, q_pad, t_pad,
                         packed=False):
    """Jitted (unpack + mask pads + engine) — decode and pad application
    run on DEVICE, so the host ships raw (optionally 2-bit packed) bytes
    and per-pair lengths, nothing else. Cached per (engine, shape):
    re-jitting per call would re-trace.

    ``packed`` expects 2-bit wire inputs ([B, ceil(len/4)] uint8, the
    reference's storage format, source.cpp:1580): the tunnel's ingress
    drops to ~55 MB/s once device traffic starts, so a 4x smaller wire
    is a direct e2e win; the device decode is one fused VPU pass."""
    import jax
    import jax.numpy as jnp

    from swtpu.ops.variants import cached_build

    key = ("varlen_mask", engine_key, n, m, q_pad, t_pad, packed)

    def build():
        @jax.jit
        def run(qs, ts, lq, lt):
            if packed:
                from swtpu.kernels.xla.unpack import unpack_2bit_device

                qs = unpack_2bit_device(qs)[:, :n]
                ts = unpack_2bit_device(ts)[:, :m]
            qm = jnp.where(
                jnp.arange(n)[None, :] < lq[:, None], qs,
                jnp.uint8(q_pad),
            )
            tm = jnp.where(
                jnp.arange(m)[None, :] < lt[:, None], ts,
                jnp.uint8(t_pad),
            )
            return engine(qm, tm)

        return run

    return cached_build(_FUSED_MASK_CACHE, key, build)


def sw_scores_varlen(
    qs: np.ndarray,
    ts: np.ndarray,
    params: ScoringParams,
    lens_q: Optional[Sequence[int]] = None,
    lens_t: Optional[Sequence[int]] = None,
    engine: Optional[Callable] = None,
    max_buckets: int = 4,
    q_pad: int = Q_PAD,
    t_pad: int = T_PAD,
    packed: bool = False,
    stream_chunks: Optional[int] = None,
) -> np.ndarray:
    """Scores for a padded variable-length batch.

    qs: [B, n_max] uint8, ts: [B, m_max] uint8 with per-pair lengths
    (defaults: full width). Pad codes are applied ON DEVICE (the host
    ships raw bytes + lengths — the upload link runs ~50x faster than
    host-side packing + fetch round-trips). When the quantized length
    spread is wide (>2x), pairs are sorted by query length and
    dispatched in at most ``max_buckets`` contiguous quantized-shape
    groups; otherwise ONE dispatch handles everything — at 400+ GCUPS
    padded cells cost ~2 ms/Gcell while every extra dispatch costs a
    ~30 ms fetch round-trip, so bucketing only pays at large spreads.
    Returns [B] int32 scores in input order.

    ``packed=True`` takes DNA in the 2-bit wire format instead
    ([B, ceil(n/4)] uint8, e.g. straight from a `swtpu pack` .npz): the
    device decodes it (kernels/xla/unpack.py), so 4x fewer bytes cross
    the ingress link — the e2e bottleneck for streamed read batches.
    """
    qs = np.asarray(qs, dtype=np.uint8)
    ts = np.asarray(ts, dtype=np.uint8)
    B = qs.shape[0]
    n = qs.shape[1] * 4 if packed else qs.shape[1]
    m = ts.shape[1] * 4 if packed else ts.shape[1]
    lq = np.full(B, n, np.int32) if lens_q is None else np.asarray(
        lens_q, np.int32
    )
    lt = np.full(B, m, np.int32) if lens_t is None else np.asarray(
        lens_t, np.int32
    )
    from swtpu.ops.variants import resolve_engine

    engine, engine_key = resolve_engine(params, engine)

    def quant(x, q):
        return int(-(-int(x) // q) * q)

    nq_max = quant(max(int(lq.max()), 1), Q_QUANT)
    nq_med = quant(max(int(np.median(lq)), 1), Q_QUANT)
    nb = max(1, min(max_buckets, B // 4096))
    if nq_max <= 2 * nq_med:
        nb = 1
    div = 4 if packed else 1
    if nb == 1:
        bn = min(n, nq_max)
        bm = min(m, quant(max(int(lt.max()), 1), T_QUANT))
        fn = _fused_masked_engine(
            engine, engine_key, bn, bm, q_pad, t_pad, packed
        )
        qv = np.ascontiguousarray(qs[:, : bn // div])
        tv = np.ascontiguousarray(ts[:, : bm // div])
        # streamed uploads (the search loop's double-buffer idiom,
        # parallel/search.py): the post-warmup tunnel ingress runs
        # ~55 MB/s, so at large B the upload IS the wall — split the
        # batch into same-shape chunks and enqueue chunk c+1's transfer
        # (async jax.device_put) while the device computes chunk c, then
        # concatenate scores ON DEVICE and pay ONE fetch. Auto at
        # B >= 16384 on TPU; chunk count keeps every chunk identical in
        # shape (one compiled executable, last chunk row-padded).
        import jax

        sc = stream_chunks
        if sc is None and B >= 16384 and (
            jax.devices()[0].platform == "tpu"
        ):
            sc = 4
        if sc and sc > 1:
            import jax.numpy as jnp

            CH = -(-B // sc)
            Bp = CH * sc
            if Bp != B:
                padr = lambda a: np.concatenate(
                    [a, np.repeat(a[:1], Bp - B, axis=0)]
                )
                qv, tv = padr(qv), padr(tv)
                lq = np.concatenate([lq, np.zeros(Bp - B, lq.dtype)])
                lt = np.concatenate([lt, np.zeros(Bp - B, lt.dtype)])

            def put(c):
                s = slice(c * CH, (c + 1) * CH)
                return (
                    jax.device_put(qv[s]),
                    jax.device_put(tv[s]),
                    jax.device_put(lq[s]),
                    jax.device_put(lt[s]),
                )

            nxt = put(0)
            outs = []
            for c in range(sc):
                cur = nxt
                if c + 1 < sc:
                    nxt = put(c + 1)  # streams while chunk c computes
                outs.append(fn(*cur))
            return np.asarray(jnp.concatenate(outs))[:B].astype(np.int32)
        return np.asarray(fn(qv, tv, lq, lt)).astype(np.int32)

    # wide spread: sort by query length ONCE (contiguous buckets =
    # zero-copy uploads), dispatch every bucket without syncing, fetch
    # all scores at the end (fetches pay a fixed ~25 ms round-trip)
    order = np.argsort(lq, kind="stable")
    qs_s = np.ascontiguousarray(qs[order])
    ts_s = np.ascontiguousarray(ts[order])
    lq_s, lt_s = lq[order], lt[order]
    splits = [B * i // nb for i in range(nb + 1)]
    pending = []
    for lo, hi in zip(splits[:-1], splits[1:]):
        if lo == hi:
            continue
        bn = min(n, quant(max(int(lq_s[hi - 1]), 1), Q_QUANT))
        bm = min(m, quant(max(int(lt_s[lo:hi].max()), 1), T_QUANT))
        fn = _fused_masked_engine(
            engine, engine_key, bn, bm, q_pad, t_pad, packed
        )
        pending.append(
            (
                lo, hi,
                fn(
                    np.ascontiguousarray(qs_s[lo:hi, : bn // div]),
                    np.ascontiguousarray(ts_s[lo:hi, : bm // div]),
                    lq_s[lo:hi], lt_s[lo:hi],
                ),
            )
        )
    out = np.zeros(B, np.int32)
    for lo, hi, dev in pending:
        out[order[lo:hi]] = np.asarray(dev)
    return out


def sw_scores_bucketed(
    pairs: Sequence,
    params: ScoringParams,
    engine: Optional[Callable] = None,
    max_buckets: int = 4,
) -> np.ndarray:
    """Scores for a list of (q, t) variable-length pairs (input order).

    Convenience wrapper over :func:`sw_scores_varlen` for list-of-arrays
    input; the array API avoids the per-pair assembly cost.
    """
    n_max = max(len(q) for q, _ in pairs)
    m_max = max(len(t) for _, t in pairs)
    qs = np.full((len(pairs), n_max), Q_PAD, np.uint8)
    ts = np.full((len(pairs), m_max), T_PAD, np.uint8)
    lq = np.empty(len(pairs), np.int64)
    lt = np.empty(len(pairs), np.int64)
    for i, (q, t) in enumerate(pairs):
        qs[i, : len(q)] = q
        ts[i, : len(t)] = t
        lq[i], lt[i] = len(q), len(t)
    return sw_scores_varlen(
        qs, ts, params, lq, lt, engine=engine, max_buckets=max_buckets
    )
