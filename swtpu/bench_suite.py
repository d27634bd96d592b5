"""Full benchmark suite: every kernel variant, reference-format output.

Reproduces the reference's harness family:
- SpeedTest (source.cpp:3032-3147): every SW schedule on 1M-alignment-
  equivalent workloads, "<name>: <ms> ms / <N>" lines.
- speedtest111x32 (source.cpp:3189-3273): the (1,1,1) batch workload.
- SpeedtestSemiGlobal (source.cpp:2804-2860): the banded family.
- InfinitySW (source.cpp:3149-3170): --forever loops one kernel for an
  external profiler.

Also emits one structured JSON record per run (kernel, batch, dtype, wall
ms, GCUPS, parity status) — the observability format promised in
SURVEY.md §5.

Run: python -m swtpu.bench_suite [--quick] [--forever VARIANT]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _inputs(batch, n, m, seed=10000):
    rng = np.random.default_rng(seed)
    return (
        rng.integers(0, 4, size=(batch, n)).astype(np.uint8),
        rng.integers(0, 4, size=(batch, m)).astype(np.uint8),
    )


def bench_sw_variants(quick=False):
    import jax

    from swtpu.core.scoring import DNA_10_30_15, DNA_111
    from swtpu.ops import VARIANTS
    from swtpu.oracle import sw_score_batch
    from swtpu.utils import time_kernel

    n = m = 128
    results = []
    for params, pname in ((DNA_10_30_15, "10_-30_15"), (DNA_111, "111")):
        for name, fn in VARIANTS.items():
            if name == "oracle":
                batch = 64 if quick else 256
                qs, ts = _inputs(batch, n, m)
                t0 = time.perf_counter()
                out = fn(qs, ts, params)
                dt = (time.perf_counter() - t0) / batch
                parity = True  # oracle is the definition
            else:
                batch = 1024 if quick else 8192
                if name == "wavefront":
                    batch = 128  # the small-batch use case it exists for
                qs, ts = _inputs(batch, n, m)
                dq, dt_ = jax.device_put(qs), jax.device_put(ts)
                out = np.asarray(fn(dq, dt_, params))
                parity = bool(
                    np.array_equal(
                        out[:64],
                        sw_score_batch(qs[:64], ts[:64], params).astype(
                            np.int32
                        ),
                    )
                )
                per_call = time_kernel(
                    lambda a, b: fn(a, b, params), (dq, dt_), k=8
                )
                dt = per_call / batch
            ms_per_1m = dt * 1e6 * 1e3
            gcups = n * m / dt / 1e9
            line_name = f"sw_{pname}_{name}"
            print(f"{line_name}: {ms_per_1m:.0f} ms / 1M")
            rec = dict(
                kernel=line_name,
                batch=batch,
                dtype="int32",
                wall_ms_per_1m=round(ms_per_1m, 1),
                gcups=round(gcups, 2),
                parity=parity,
                device=str(jax.devices()[0].device_kind),
            )
            print("JSON:", json.dumps(rec))
            results.append(rec)
    return results


def bench_semiglobal(quick=False):
    import jax

    from swtpu.kernels.xla import banded_scan
    from swtpu.core.encode import mutate
    from swtpu.utils import time_kernel

    rng = np.random.default_rng(10000)
    L = 512 if quick else 2048
    B = 64 if quick else 256
    qs = rng.integers(0, 4, size=(B, L)).astype(np.uint8)
    ts = np.stack([mutate(rng, qs[b], out_len=L) for b in range(B)])

    # Adaptive tiers, honest-timed: the wrapper runs ONCE (for the real
    # per-pair round counts that set band-GCUPS), then the jitted forward
    # is timed with the salted serial chain (time_kernel) — a bare
    # wall-clock call over the axon tunnel measures dispatch, not kernels
    # (the repo-wide timing rule; see utils/timing.py). Score-only mode:
    # the band history (GBs) would otherwise dominate the host transfer;
    # traceback workloads pay it only for selected pairs (the 16K e2e
    # record below measures that split stage by stage).
    tiers = [
        ("banded_xdrop_32_70_xla", banded_scan.banded_xdrop_batch,
         banded_scan.bench_forward_fn, qs, ts, {}),
    ]
    if jax.devices()[0].platform == "tpu":
        from swtpu.kernels.pallas import banded_batch, banded_packed
        from swtpu.core.protein import BLOSUM62

        tiers.append(
            ("banded_xdrop_32_70_pallas",
             banded_batch.banded_xdrop_batch_pallas,
             banded_batch.bench_forward_fn, qs, ts, {})
        )
        # protein homology extension: ~70%-identity amino-acid pairs,
        # BLOSUM62 + BLAST-default Gotoh gaps, X=120 (the BLAST-style
        # protein X-drop workload; general-matrix baked-table mode)
        pq = rng.integers(0, 24, size=(B, L)).astype(np.uint8)
        pt = pq.copy()
        nmut = L // 3
        for b in range(B):
            idx = rng.integers(0, L, nmut)
            pt[b, idx] = rng.integers(0, 24, nmut)
        tiers.append(
            ("banded_xdrop_blosum62_affine_pallas",
             banded_batch.banded_xdrop_batch_pallas,
             banded_batch.bench_forward_fn, pq, pt,
             dict(matrix=BLOSUM62, gap_open=11, gap_extend=1,
                  x_threshold=120))
        )
        tiers.append(
            ("banded_xdrop_32_70_packed",
             banded_packed.banded_xdrop_batch_packed,
             banded_packed.bench_forward_fn, qs, ts, {})
        )
        # affine (Gotoh) uniform scoring on the fastest adaptive tier
        tiers.append(
            ("banded_affine_xdrop_32_70_packed",
             banded_packed.banded_xdrop_batch_packed,
             banded_packed.bench_forward_fn, qs, ts,
             dict(gap_open=3, gap_extend=1))
        )
        # early exit on non-homologous pairs under harsh scoring: the
        # bands die within ~X/gap rounds and whole blocks are skipped
        nt = np.stack(
            [rng.integers(0, 4, L).astype(np.uint8) for _ in range(B)]
        )
        tiers.append(
            ("banded_xdrop_early_exit_packed",
             banded_packed.banded_xdrop_batch_packed,
             banded_packed.bench_forward_fn, qs, nt,
             dict(early_exit=True, mismatch=3, gap=2, x_threshold=40))
        )
    else:
        tiers.append(
            ("banded_affine_xdrop_32_70_xla",
             banded_scan.banded_xdrop_batch,
             banded_scan.bench_forward_fn, qs, ts,
             dict(gap_open=3, gap_extend=1))
        )
    out = []
    for name, wrapper, bench_fn, bq, bt, kw in tiers:
        res = wrapper(bq, bt, with_history=False, **kw)
        cells = int(res.n_rounds.astype(np.int64).sum()) * 32
        fn, args = bench_fn(bq, bt, **kw)
        per = time_kernel(fn, args, k=8)
        rec = dict(
            kernel=name,
            batch=B,
            seq_len=L,
            wall_ms=round(per * 1e3, 2),
            band_gcups=round(cells / per / 1e9, 3),
            alignments_per_s=round(B / per, 1),
            device=str(jax.devices()[0].device_kind),
        )
        print(f"{name}: {per*1e3/B*1e4:.0f} ms / 10K")
        print("JSON:", json.dumps(rec))
        out.append(rec)

    # block-adaptive tier (round 4): the zero-lane-motion adaptive
    # engine — flagship layout inside K-row blocks, adaptive work at
    # block granularity (kernels/pallas/banded_block.py). Its contract
    # is the block oracle (oracle/banded_block.py), so its score parity
    # is checked against THAT tier, not the per-round oracle.
    if jax.devices()[0].platform == "tpu":
        from swtpu.kernels.pallas import banded_block as bblock
        from swtpu.oracle.banded_block import banded_xdrop_block

        for Kb, Bb in ((32, B), (64, B), (64, 1024)):
            bq = (qs if Bb <= B else np.tile(qs, (-(-Bb // B), 1)))[:Bb]
            bt = (ts if Bb <= B else np.tile(ts, (-(-Bb // B), 1)))[:Bb]
            res = bblock.banded_block_batch_pallas(
                bq, bt, width=64, block=Kb
            )
            parity = all(
                int(res.score[p])
                == banded_xdrop_block(bq[p], bt[p], width=64, block=Kb)[0]
                for p in range(3)
            )
            cells = int(res.n_rows.astype(np.int64).sum()) * 64
            # timing at an unreachable X keeps the band ALIVE under the
            # salted chain (the salt mutates chars -> instant X-drop ->
            # base frozen <= 1 -> every block takes the column-0-pin row
            # path, which production alive bands leave after block 0;
            # work per block is identical — early_exit is off either
            # way). Dead pairs in production exit via early_exit.
            fn, args = bblock.bench_forward_fn(
                bq, bt, width=64, block=Kb, x_threshold=1 << 20
            )
            per = time_kernel(fn, args, k=8)
            rec = dict(
                kernel=f"banded_block_w64_k{Kb}_b{Bb}",
                batch=Bb,
                seq_len=L,
                wall_ms=round(per * 1e3, 2),
                band_gcups=round(cells / per / 1e9, 1),
                alignments_per_s=round(Bb / per, 1),
                parity_vs_block_oracle=parity,
                timing_note="alive-band path (X unreachable in the salted chain)",
                device=str(jax.devices()[0].device_kind),
            )
            print(f"banded_block_w64_k{Kb}_b{Bb}: {per*1e3/Bb*1e4:.1f} ms / 10K")
            print("JSON:", json.dumps(rec))
            out.append(rec)

        # affine (Gotoh 3/1) and protein (BLOSUM62 + 11/1, X=120) on the
        # block tier — the engine-matrix cells, same honest timing
        from swtpu.core.protein import BLOSUM62
        from swtpu.oracle.banded_block import banded_xdrop_block_affine

        res = bblock.banded_block_batch_pallas(
            qs, ts, width=64, block=64, gap_open=3, gap_extend=1
        )
        parity = all(
            int(res.score[p]) == banded_xdrop_block_affine(
                qs[p], ts[p], gap_open=3, gap_extend=1, width=64, block=64
            )[0]
            for p in range(2)
        )
        fn, args = bblock.bench_forward_fn(
            qs, ts, width=64, block=64, gap_open=3, gap_extend=1
        )
        per = time_kernel(fn, args, k=8)
        rec = dict(
            kernel="banded_block_affine_w64_k64", batch=B, seq_len=L,
            wall_ms=round(per * 1e3, 2),
            band_gcups=round(
                int(res.n_rows.astype(np.int64).sum()) * 64 / per / 1e9, 1
            ),
            alignments_per_s=round(B / per, 1),
            parity_vs_block_oracle=parity,
            device=str(jax.devices()[0].device_kind),
        )
        print(f"banded_block_affine_w64_k64: {per*1e3/B*1e4:.1f} ms / 10K")
        print("JSON:", json.dumps(rec))
        out.append(rec)

        pq64 = rng.integers(0, 24, size=(B, L)).astype(np.uint8)
        pt64 = pq64.copy()
        for b in range(B):
            idx = rng.integers(0, L, L // 3)
            pt64[b, idx] = rng.integers(0, 24, L // 3)
        res = bblock.banded_block_batch_pallas(
            pq64, pt64, width=64, block=64, matrix=BLOSUM62,
            x_threshold=120,
        )
        fn, args = bblock.bench_forward_fn(
            pq64, pt64, width=64, block=64, matrix=BLOSUM62,
            x_threshold=120,
        )
        per = time_kernel(fn, args, k=8)
        rec = dict(
            kernel="banded_block_blosum62_w64_k64", batch=B, seq_len=L,
            wall_ms=round(per * 1e3, 2),
            band_gcups=round(
                int(res.n_rows.astype(np.int64).sum()) * 64 / per / 1e9, 1
            ),
            alignments_per_s=round(B / per, 1),
            device=str(jax.devices()[0].device_kind),
        )
        print(
            f"banded_block_blosum62_w64_k64: {per*1e3/B*1e4:.1f} ms / 10K"
        )
        print("JSON:", json.dumps(rec))
        out.append(rec)

    # fixed-band rowscan (the issue-bound banded tier, BASELINE configs
    # 1-2 geometry): band cells at full-rowscan efficiency
    if jax.devices()[0].platform == "tpu":
        from swtpu.core.scoring import DNA_111
        from swtpu.kernels.pallas.sw_banded import sw_banded_static_pallas

        Bf = 512 if quick else 2048
        qf = rng.integers(0, 4, size=(Bf, L)).astype(np.uint8)
        tf = np.stack([mutate(rng, qf[b], out_len=L) for b in range(Bf)])
        Wf = 32
        fn = lambda a, b: sw_banded_static_pallas(a, b, DNA_111, bandwidth=Wf)
        per = time_kernel(fn, (qf, tf), k=4)
        cells = Bf * L * (2 * Wf + 1)
        rec = dict(
            kernel="banded_fixed_rowscan_w32",
            batch=Bf,
            seq_len=L,
            wall_ms=round(per * 1e3, 2),
            band_gcups=round(cells / per / 1e9, 1),
            alignments_per_s=round(Bf / per, 1),
            device=str(jax.devices()[0].device_kind),
        )
        print(f"banded_fixed_rowscan_w32: {per*1e3/Bf*1e4:.2f} ms / 10K")
        print("JSON:", json.dumps(rec))
        out.append(rec)

        # BASELINE config 2 verbatim: 1M random 128x128 pairs at the
        # fixed band (the reference's 4.4 s/1M workload geometry).
        # Chunked through the engine to bound host memory.
        if not quick:
            B1, L1 = 1_000_000, 128
            CH = 131072
            q1 = rng.integers(0, 4, size=(CH, L1)).astype(np.uint8)
            t1 = rng.integers(0, 4, size=(CH, L1)).astype(np.uint8)
            fn = lambda a, b: sw_banded_static_pallas(
                a, b, DNA_111, bandwidth=Wf
            )
            per_chunk = time_kernel(fn, (q1, t1), k=4)
            n_chunks_1m = -(-B1 // CH)
            wall = per_chunk * n_chunks_1m
            rec = dict(
                kernel="banded_fixed_1m_128x128_w32",
                batch=B1,
                wall_ms=round(wall * 1e3, 1),
                ms_per_1m=round(wall * 1e3, 1),
                band_gcups=round(B1 * L1 * (2 * Wf + 1) / wall / 1e9, 1),
                device=str(jax.devices()[0].device_kind),
            )
            print(
                f"banded_fixed_1m_128x128_w32: {rec['ms_per_1m']} ms / 1M "
                "(reference simd9 full-matrix: 1884)"
            )
            print("JSON:", json.dumps(rec))
            out.append(rec)

        from swtpu.core.scoring import ScoringParams, dna_matrix

        aff = ScoringParams(dna_matrix(1, -1), gap_open=3, gap_extend=1)
        fn = lambda a, b: sw_banded_static_pallas(a, b, aff, bandwidth=Wf)
        per = time_kernel(fn, (qf, tf), k=4)
        rec = dict(
            kernel="banded_fixed_affine_rowscan_w32",
            batch=Bf,
            seq_len=L,
            wall_ms=round(per * 1e3, 2),
            band_gcups=round(cells / per / 1e9, 1),
            alignments_per_s=round(Bf / per, 1),
            device=str(jax.devices()[0].device_kind),
        )
        print(
            f"banded_fixed_affine_rowscan_w32: {per*1e3/Bf*1e4:.2f} ms / 10K"
        )
        print("JSON:", json.dumps(rec))
        out.append(rec)

    # reference-scale geometry runs in a FRESH SUBPROCESS (the dist
    # suite's isolation pattern): the fused fwd+walk executable measures
    # 58 ms in a fresh process but ~117 ms inside this long-lived bench
    # process after the tier sections ran (reproducible; process-state
    # effect on the tunnel) — the record should reflect what a dedicated
    # 16K-traceback job actually costs.
    import subprocess

    proc = subprocess.run(
        [sys.executable, "-m", "swtpu.bench_suite", "--suite",
         "semiglobal16k"] + (["--quick"] if quick else []),
        capture_output=True, text=True, timeout=1800,
    )
    if proc.returncode:
        print("semiglobal16k subprocess failed:", proc.stderr[-2000:])
    else:
        for line in proc.stdout.splitlines():
            if line.startswith("JSON: "):
                out.append(json.loads(line[len("JSON: "):]))
            if not line.startswith("WARNING"):
                print(line)
    return out


def bench_semiglobal_16k(quick=False):
    """Reference-scale geometry: 16384-mers end to end WITH traceback
    (the SemiGlobal_111 / SpeedtestSemiGlobal shape, source.cpp:1776-1834,
    2804-2860), split into stages. The e2e path walks ON DEVICE: the
    tunnel's device->host link runs ~25 MB/s, so fetching even the
    8-bit-compressed band history (8 MB at batch 8) costs ~4x the
    forward — the device walkers ship only per-pair move strings.

    Timing methodology (round 4, replaces the r03 salted-chain number):
    the fused forward+walk is DATA-DEPENDENT — time_kernel's char salt
    collapses pair identity, X-drops the batch, and lets the walk's
    early-exit skip its chunks, understating the walk stage — so the
    fused stage is wall-clocked as dispatch -> wire fetch (the fetch
    forces completion; block_until_ready alone lies over the tunnel),
    min of reps, with a guard-zone pad byte perturbed per rep so the
    tunnel's (executable, args) result cache cannot serve a repeat. The
    perturbation is semantics-free: pad codes stay negative.
    """
    import jax
    import jax.numpy as jnp

    from swtpu.core.encode import mutate
    from swtpu.kernels.xla import banded_scan
    from swtpu import native

    rng = np.random.default_rng(10000)
    out = []

    B16 = 2 if quick else 8
    # reference geometry on TPU; a scaled-down stand-in on CPU (the full
    # 32769-round scan takes minutes per rep on the CPU backend)
    L16 = 16384 if jax.devices()[0].platform == "tpu" else 2048
    q16 = rng.integers(0, 4, size=(B16, L16)).astype(np.uint8)
    t16 = np.stack([mutate(rng, q16[b], out_len=L16) for b in range(B16)])

    def run_e2e(name, Bb, dispatch, warm=1):
        """Stage-timed e2e: fused device fwd+walk + wire fetch (one
        wall-clocked unit per the methodology above), then host decode."""
        for _ in range(warm):  # compile + device warmup
            jax.block_until_ready(dispatch(0))
        walls, fetches, decodes = [], [], []
        wireb = None
        for rep in range(1, 4):
            t0 = time.perf_counter()
            wire = dispatch(rep)
            jax.block_until_ready(wire)
            t_disp = time.perf_counter()
            wireb = np.asarray(wire)
            t1 = time.perf_counter()
            walls.append(t1 - t0)
            fetches.append(t1 - t_disp)
            t0 = time.perf_counter()
            sb, plenb, pathsb = banded_scan.decode_device_walk(
                wireb, as_arrays=True
            )
            decodes.append(time.perf_counter() - t0)
        t_fused, t_fetch, t_decode = min(walls), min(fetches), min(decodes)
        wall = t_fused + t_decode
        rec = dict(
            kernel=name,
            batch=Bb,
            seq_len=L16,
            wall_ms=round(wall * 1e3, 1),
            device_fwd_walk_plus_fetch_ms=round(t_fused * 1e3, 1),
            fetch_portion_ms=round(t_fetch * 1e3, 1),
            moves_kb=round(wireb.nbytes / 1024, 1),
            host_decode_ms=round(t_decode * 1e3, 2),
            decode_mode="native" if native.available() else "numpy",
            alignments_per_s=round(Bb / wall, 2),
            mean_path_len=round(float(np.mean(plenb[:Bb])), 1),
            timing="e2e wall: dispatch->wire fetch (+decode); min of 3 "
                   "perturbed reps",
            device=str(jax.devices()[0].device_kind),
        )
        print(
            f"{name}: {wall*1e3:.0f} ms / {Bb} (device fwd+walk+fetch "
            f"{t_fused*1e3:.0f} [fetch ~{t_fetch*1e3:.0f}] + decode "
            f"{t_decode*1e3:.1f})"
        )
        print("JSON:", json.dumps(rec))
        out.append(rec)

    # per-round tier (W=32), the r03 engine re-recorded honestly.
    # Inputs are STAGED on device; each rep pokes one back-pad byte ON
    # DEVICE from a 4-byte salt (fresh args defeat the tunnel result
    # cache; the poke stays a negative non-char, zero work change) —
    # device-resident e2e, the repo's record convention for compute
    # stages (CLAUDE.md tunnel facts; wire cost is the fetch portion).
    qp, tp, lq, lt = banded_scan._prep_padded(q16, t16, None, None, 32)
    max_steps = 2 * L16 + 1
    qp_d, tp_d = jnp.asarray(qp), jnp.asarray(tp)
    lq_d, lt_d = jnp.asarray(lq), jnp.asarray(lt)

    @jax.jit
    def _round_salted(tp_in, salt):
        tp_s = tp_in.at[0, -1].set((-1 - salt % 2).astype(tp_in.dtype))
        return banded_scan._banded_fwd_walk_impl(
            qp_d, tp_s, lq_d, lt_d, 1, 1, 1, 32, 70, max_steps,
        )

    run_e2e(
        "banded_16k_traceback_e2e", B16,
        lambda rep: _round_salted(tp_d, jnp.int32(rep)),
    )

    # block tier (round 4: W=64 corridor, K=64 blocks) + its device
    # walker; also at batch 128 — the walk's per-step cost is batch-
    # independent up to one lane row, so the wide batch shows the
    # amortized engine rate
    if jax.devices()[0].platform == "tpu":
        from swtpu.kernels.pallas import banded_block as bblock

        for Bb in ((B16,) if quick else (B16, 128)):
            qb = rng.integers(0, 4, size=(Bb, L16)).astype(np.uint8)
            tb = np.stack(
                [mutate(rng, qb[b], out_len=L16) for b in range(Bb)]
            )
            qT, trows, _, _, n_, m_, ppg, rpp, Lp = bblock._prep(qb, tb)

            def _block_salted(trows_in, salt, Bb=Bb, qT=qT, n_=n_,
                              m_=m_, ppg=ppg, rpp=rpp, Lp=Lp):
                tr = trows_in.at[-1, -1].set(-1 - salt % 2)
                return bblock._block_fwd_walk_impl(
                    qT, tr, n_, m_, 64, 64, 70, 1, 1, 1, 32, None,
                    ppg, rpp, Lp, max_steps=n_ + m_ + 1, b_real=Bb,
                )

            _block_salted = jax.jit(_block_salted)
            run_e2e(
                f"banded_block_16k_traceback_e2e_b{Bb}", Bb,
                lambda rep, f=_block_salted, tr=trows: f(
                    tr, jnp.int32(rep)
                ),
            )
    return out


def bench_affine(quick=False):
    """Affine (Gotoh) engines — the BASELINE-mandated extension."""
    import jax

    from swtpu.core.scoring import ScoringParams, dna_matrix
    from swtpu.kernels.xla.affine_scan import sw_affine_batch_diag
    from swtpu.utils import time_kernel

    params = ScoringParams(
        matrix=dna_matrix(10, -30), gap_open=40, gap_extend=15
    )
    n = m = 128
    batch = 1024 if quick else 8192
    qs, ts = _inputs(batch, n, m)
    dq, dt = jax.device_put(qs), jax.device_put(ts)
    engines = [("affine_xla_diag", lambda a, b: sw_affine_batch_diag(a, b, params))]
    if jax.devices()[0].platform == "tpu":
        from swtpu.kernels.pallas.sw_affine import sw_affine_pallas

        engines.append(
            ("affine_rowscan", lambda a, b: sw_affine_pallas(a, b, params))
        )
    out = []
    for name, fn in engines:
        per = time_kernel(fn, (dq, dt), k=4)
        rec = dict(
            kernel=name,
            batch=batch,
            gcups=round(batch * n * m / per / 1e9, 2),
            ms_per_1m=round(per / batch * 1e6 * 1e3),
            device=str(jax.devices()[0].device_kind),
        )
        print(f"{name}: {rec['ms_per_1m']} ms / 1M")
        print("JSON:", json.dumps(rec))
        out.append(rec)
    return out


def bench_protein(quick=False):
    """Protein/BLOSUM62 local alignment (no reference analog)."""
    import jax

    from swtpu.core.protein import BLOSUM62
    from swtpu.core.scoring import ScoringParams
    from swtpu.ops.variants import best_engine
    from swtpu.utils import time_kernel

    n = m = 128
    batch = 1024 if quick else 8192
    rng = np.random.default_rng(10000)
    qs = rng.integers(0, 24, size=(batch, n)).astype(np.uint8)
    ts = rng.integers(0, 24, size=(batch, m)).astype(np.uint8)
    dq, dt = jax.device_put(qs), jax.device_put(ts)
    cases = [
        ("protein_blosum62_best", ScoringParams.linear(BLOSUM62, 11)),
        # BLAST-default affine protein scoring
        (
            "protein_blosum62_affine_best",
            ScoringParams(BLOSUM62, gap_open=11, gap_extend=1),
        ),
    ]
    out = []
    for name, params in cases:
        fn = best_engine(params)
        per = time_kernel(fn, (dq, dt), k=4)
        rec = dict(
            kernel=name,
            batch=batch,
            gcups=round(batch * n * m / per / 1e9, 2),
            ms_per_1m=round(per / batch * 1e6 * 1e3),
            device=str(jax.devices()[0].device_kind),
        )
        print(f"{name}: {rec['ms_per_1m']} ms / 1M")
        print("JSON:", json.dumps(rec))
        out.append(rec)
    return out


def bench_semiglobal_full(quick=False):
    """Full-matrix semi-global with endpoints (≙ SemiGlobal_111 scaled to
    the batch workload; the reference only benches the banded family)."""
    import jax

    from swtpu.kernels.xla.semiglobal_scan import semiglobal_batch_diag
    from swtpu.utils import time_kernel

    n = m = 128
    batch = 1024 if quick else 8192
    qs, ts = _inputs(batch, n, m)
    dq, dt = jax.device_put(qs), jax.device_put(ts)
    engines = [("semiglobal_xla_diag", lambda a, b: semiglobal_batch_diag(a, b)[0])]
    if jax.devices()[0].platform == "tpu" and batch % 1024 == 0:
        from swtpu.core.protein import BLOSUM62
        from swtpu.core.scoring import ScoringParams
        from swtpu.kernels.pallas.semiglobal_batch import (
            semiglobal_batch_pallas,
        )
        from swtpu.kernels.pallas.semiglobal_profile import (
            semiglobal_batch_profile_pallas,
        )

        rng = np.random.default_rng(10000)
        pq = jax.device_put(
            rng.integers(0, 24, size=(batch, n)).astype(np.uint8)
        )
        pt = jax.device_put(
            rng.integers(0, 24, size=(batch, m)).astype(np.uint8)
        )
        aff = ScoringParams(BLOSUM62, gap_open=11, gap_extend=1)
        engines.append(
            ("semiglobal_rowscan", lambda a, b: semiglobal_batch_pallas(a, b)[0])
        )
        engines.append(
            (
                "semiglobal_prof_blosum62_affine",
                lambda a, b, _q=pq, _t=pt: semiglobal_batch_profile_pallas(
                    _q, _t, aff
                )[0],
            )
        )
    out = []
    for name, fn in engines:
        per = time_kernel(fn, (dq, dt), k=4)
        rec = dict(
            kernel=name,
            batch=batch,
            gcups=round(batch * n * m / per / 1e9, 2),
            ms_per_1m=round(per / batch * 1e6 * 1e3),
            device=str(jax.devices()[0].device_kind),
        )
        print(f"{name}: {rec['ms_per_1m']} ms / 1M")
        print("JSON:", json.dumps(rec))
        out.append(rec)
    return out


def bench_varlen(quick=False):
    """BASELINE config 4: variable-length DNA read batch (100-300 bp) vs
    fixed reference windows, bucketed dispatch, with the overflow-
    promotion tier and a traceback-coordinate sample."""
    import jax
    import jax.numpy as jnp

    from swtpu.batch import sw_align_batch, sw_scores_varlen
    from swtpu.batch.bucketing import _fused_masked_engine
    from swtpu.core.encode import pack_2bit
    from swtpu.core.scoring import DNA_111
    from swtpu.ops.variants import resolve_engine
    from swtpu.utils import time_kernel

    rng = np.random.default_rng(10000)
    B = 4096 if quick else 32768
    m = 320

    def read_set(seed):
        """Reads in the 2-bit at-rest format (≙ the reference's packed
        storage, source.cpp:1580; `swtpu pack` .npz) — the e2e wall is
        wire-bound, and packed reads cross the ~55 MB/s post-warmup
        ingress 4x faster; the device decodes them in one VPU pass."""
        r = np.random.default_rng(seed)
        lens = r.integers(100, 301, B)
        qs = pack_2bit(r.integers(0, 4, size=(B, 300)).astype(np.uint8))
        ts = pack_2bit(r.integers(0, 4, size=(B, m)).astype(np.uint8))
        return qs, ts, lens

    # wall-clock over the WHOLE streaming call (upload + device decode/
    # mask/engine + score fetch) on a distinct read set per rep: the
    # tunnel result-cache serves identical calls, so rep data must
    # differ; the warmup set compiles the (quantized, recurring) shapes
    sets = [read_set(s) for s in (10000, 10001, 10002)]
    sw_scores_varlen(
        sets[0][0], sets[0][1], DNA_111, sets[0][2], packed=True
    )
    walls = []
    for qs, ts, lens in sets[1:]:
        t0 = time.perf_counter()
        sw_scores_varlen(qs, ts, DNA_111, lens, packed=True)
        walls.append(time.perf_counter() - t0)
    wall = min(walls)
    lens = sets[-1][2]
    cells = int(lens.sum()) * m
    out = [
        dict(
            kernel="varlen_reads_bucketed",
            batch=B,
            wire="2bit-packed",
            wall_ms=round(wall * 1e3, 1),
            gcups=round(cells / wall / 1e9, 2),
            alignments_per_s=round(B / wall, 1),
            stream_chunks=4 if B >= 16384 else 1,
            device=str(jax.devices()[0].device_kind),
        )
    ]
    # wire floor: upload time of the SAME bytes alone (fresh copies per
    # rep — jax.device_put of an identical numpy object is served from
    # an id-keyed cache) + one score fetch. The e2e record above is
    # honest iff wall_ms sits near this floor; the gap is the engine +
    # pipeline overhead that streaming cannot hide.
    floors = []
    for qs_f, ts_f, _ in sets[1:]:
        qf, tf = qs_f.copy(), ts_f.copy()
        t0 = time.perf_counter()
        jax.block_until_ready(
            (jax.device_put(qf), jax.device_put(tf))
        )
        floors.append(time.perf_counter() - t0)
    fetch_fn = jax.jit(lambda v: jnp.zeros(B, jnp.int32) + v)
    np.asarray(fetch_fn(jnp.int32(0)))  # compile + warm the fetch path
    t0 = time.perf_counter()
    np.asarray(fetch_fn(jnp.int32(1)))  # fixed fetch round-trip
    t_fetch = time.perf_counter() - t0
    floor = min(floors) + t_fetch
    out.append(
        dict(
            kernel="varlen_wire_floor",
            batch=B,
            upload_bytes=int(sets[1][0].nbytes + sets[1][1].nbytes),
            upload_ms=round(min(floors) * 1e3, 1),
            fetch_ms=round(t_fetch * 1e3, 1),
            floor_ms=round(floor * 1e3, 1),
            e2e_over_floor=round(wall / floor, 3),
            device=str(jax.devices()[0].device_kind),
        )
    )

    # device-resident throughput of the same fused (decode + mask +
    # engine) unit, honest-timed with pre-staged inputs — what the path
    # runs at when the data is already on device (e.g. inside search)
    engine, ekey = resolve_engine(DNA_111, None)
    fn = _fused_masked_engine(engine, ekey, 300, 320, 4, 5, packed=True)
    qs, ts, lens = sets[-1]
    dq, dt_ = jnp.asarray(qs), jnp.asarray(ts)
    lq_d = jnp.asarray(lens.astype(np.int32))
    lt_d = jnp.full(B, m, jnp.int32)
    per = time_kernel(
        lambda a, b: fn(a, b, lq_d, lt_d), (dq, dt_), k=8
    )
    out.append(
        dict(
            kernel="varlen_device_resident",
            batch=B,
            wall_ms=round(per * 1e3, 2),
            gcups=round(cells / per / 1e9, 2),
            alignments_per_s=round(B / per, 1),
            device=str(jax.devices()[0].device_kind),
        )
    )
    # overflow-promotion tier on a workload that actually promotes: 1/8
    # of the pairs are near-identical 300-mers (scores ~300 cross the
    # bf16 exact bound of 255), the rest random (scores far below) — the
    # committed record must demonstrate the split doing real work, not
    # promoted_frac=0.0 (the round-2 record's flaw). Since round 4 the
    # split runs in ONE device dispatch (sw_scores_promoted_device:
    # bf16 pass + mask + capped gather + int32 re-run + scatter); the
    # r03 host-orchestrated version paid two tunnel round-trips and ran
    # at 4.5K aln/s.
    from swtpu.batch.promote import (
        _check_promotion_scoring,
        _promoted_device_impl_factory,
        sw_scores_promoted_device,
    )
    from swtpu.core.encode import mutate as _mutate

    qs = rng.integers(0, 4, size=(B, 300)).astype(np.uint8)
    ts = rng.integers(0, 4, size=(B, m)).astype(np.uint8)
    n_hom = B // 8
    for b in range(n_hom):
        ts[b, :300] = _mutate(
            rng, qs[b], p_mismatch=0.02, p_insert=0, p_delete=0
        )
    # e2e wall: upload + fused device split + score fetch. Warmup runs
    # the FULL shape on distinct data (same-shape compile, no result
    # cache hit)
    qs_w = rng.integers(0, 4, size=(B, 300)).astype(np.uint8)
    sw_scores_promoted_device(qs_w, ts, DNA_111)
    t0 = time.perf_counter()
    _, promoted = sw_scores_promoted_device(qs, ts, DNA_111)
    wall = time.perf_counter() - t0
    out.append(
        dict(
            kernel="varlen_promoted_bf16_int32",
            batch=B,
            wall_ms=round(wall * 1e3, 1),
            promoted_frac=round(float(promoted.mean()), 4),
            alignments_per_s=round(B / wall, 1),
            mode="device_fused_e2e",
            device=str(jax.devices()[0].device_kind),
        )
    )
    # device-resident rate of the fused split itself (honest-timed):
    # what promotion costs when the batch is already on device
    match_, mismatch_, g_ = _check_promotion_scoring(DNA_111)
    import swtpu.batch.promote as _promote_mod

    if _promote_mod._PROMOTED_IMPL is None:
        _promote_mod._PROMOTED_IMPL = _promoted_device_impl_factory()
    impl = _promote_mod._PROMOTED_IMPL
    npad = -(-300 // 8) * 8
    qs_p = np.full((B, npad), 4, np.uint8)
    qs_p[:, :300] = qs
    cap_ = max(1, B // 4)
    dqs, dts = jnp.asarray(qs_p), jnp.asarray(ts)
    per = time_kernel(
        lambda a, b: impl(
            a, b, npad, m, match_, mismatch_, 1, g_, cap_
        )[0],
        (dqs, dts),
        k=8,
    )
    out.append(
        dict(
            kernel="varlen_promoted_device_resident",
            batch=B,
            wall_ms=round(per * 1e3, 2),
            cap_frac=0.25,
            alignments_per_s=round(B / per, 1),
            device=str(jax.devices()[0].device_kind),
        )
    )
    # traceback coordinates for a sample of pairs (device endpoints +
    # endpoint-bounded host walk; the reference's forward/traceback split)
    nb = 64
    sw_align_batch(qs[:nb], ts[:nb], DNA_111)  # compile the ends engine
    t0 = time.perf_counter()
    paths = sw_align_batch(qs[:nb], ts[:nb], DNA_111)
    wall = time.perf_counter() - t0
    out.append(
        dict(
            kernel="varlen_traceback_sample",
            batch=nb,
            wall_ms=round(wall * 1e3, 1),
            alignments_per_s=round(nb / wall, 1),
            device=str(jax.devices()[0].device_kind),
        )
    )
    for rec in out:
        ms = rec.get("wall_ms", rec.get("floor_ms"))
        print(f"{rec['kernel']}: {ms} ms / {rec['batch']}")
        print("JSON:", json.dumps(rec))
    return out


def bench_unpack(quick=False):
    """2-bit codec (≙ the reference's unpack family + its 100M-rep
    harness, source.cpp:1580-1774, 2889-2941): host numpy path and the
    device kernel (one fused VPU pass), decoded GB/s."""
    import jax

    from swtpu.core.encode import pack_2bit, unpack_2bit
    from swtpu.kernels.xla.unpack import unpack_2bit_device
    from swtpu.utils import time_kernel

    rng = np.random.default_rng(10000)
    seqs = rng.integers(0, 4, size=(10000, 128)).astype(np.uint8)
    packed = pack_2bit(seqs)
    reps = 10 if quick else 100
    t0 = time.perf_counter()
    for _ in range(reps):
        out = unpack_2bit(packed)
    wall = (time.perf_counter() - t0) / reps
    rec = dict(
        kernel="unpack_2bit_host",
        bytes_per_s=round(seqs.size / wall / 1e9, 3),
        unit="GB/s",
    )
    print(f"unpack: {wall*1e3:.2f} ms / 10K x 128")
    out = [rec]
    print("JSON:", json.dumps(rec))

    # device codec: [8192, 512] packed -> [8192, 2048] codes (16.8 MB
    # decoded per call), honest-timed
    dp = jax.device_put(
        pack_2bit(rng.integers(0, 4, size=(8192, 2048)).astype(np.uint8))
    )
    per = time_kernel(lambda p: unpack_2bit_device(p), (dp,), k=16)
    decoded = 8192 * 2048
    rec = dict(
        kernel="unpack_2bit_device",
        wall_ms=round(per * 1e3, 3),
        bytes_per_s=round(decoded / per / 1e9, 1),
        unit="GB/s",
        device=str(jax.devices()[0].device_kind),
    )
    print(f"unpack_2bit_device: {per*1e3:.3f} ms / 8192 x 2048")
    print("JSON:", json.dumps(rec))
    out.append(rec)
    return out


def bench_protein_swissprot(quick=False):
    """BASELINE config 3 verbatim: Farrar-striped full-matrix SW on
    protein queries vs a small SwissProt subset with BLOSUM62, linear and
    11/1 Gotoh gaps.

    The subset is the frozen synthetic stand-in bundled at
    swtpu/data/swissprot_like_256.fasta (256 sequences, SwissProt amino-
    acid background frequencies + log-normal length distribution, seed
    10000; swap in a real subset by pointing the same loader at e.g.
    `uniprot_sprot.fasta` filtered to 256 records — no downloader runs
    here by design: the bench must be hermetic). Queries are 64 mutated
    120-mer fragments cut from the subset, so the hit structure is
    homologous, not random. Engines: ``colscan`` (the TPU-native
    Farrar-striped schedule, kernels/xla/colscan.py; Farrar 2007 is the
    reference's own citation, README.md:15) and ``rowscan_prof`` (the
    Pallas packed-profile kernel) on TPU.
    """
    import os

    import jax

    from swtpu.core.io import load_fasta_batch
    from swtpu.core.protein import BLOSUM62
    from swtpu.core.scoring import ScoringParams
    from swtpu.kernels.xla.colscan import sw_batch_colscan
    from swtpu.oracle import sw_score_batch
    from swtpu.oracle.affine import sw_affine_score_batch
    from swtpu.utils import time_kernel

    path = os.path.join(
        os.path.dirname(__file__), "data", "swissprot_like_256.fasta"
    )
    names, db, lens = load_fasta_batch(path, alphabet="protein", pad_to=16,
                                       pad_code=25)
    rng = np.random.default_rng(10000)
    nq = 16 if quick else 64
    Lq = 120
    qs = np.empty((nq, Lq), np.uint8)
    for i in range(nq):
        src = int(rng.integers(0, len(db)))
        start = int(rng.integers(0, max(1, lens[src] - Lq)))
        frag = db[src, start : start + Lq].copy()
        sub = rng.random(Lq) < 0.1
        frag[sub] = rng.integers(0, 20, int(sub.sum()))
        qs[i] = np.where(frag >= 24, rng.integers(0, 20, Lq), frag)
    nt = 64 if quick else len(db)
    Nq, Nt = nq, nt
    qq = np.broadcast_to(qs[:, None, :], (Nq, Nt, Lq)).reshape(-1, Lq)
    tt = np.broadcast_to(db[None, :nt], (Nq, Nt, db.shape[1])).reshape(
        -1, db.shape[1]
    )
    real_cells = int(Nq * lens[:nt].sum() * Lq)

    # Length-sorted target buckets (the sw_scores_varlen policy applied
    # to an all-vs-all search batch): the raw broadcast pads EVERY pair
    # to the longest protein (2.5x cell waste on this subset); sorting
    # pairs by target length and dispatching a few own-max-padded groups
    # cuts the waste to ~1.3x. Each bucket's arrays are pre-staged on
    # device and the timed unit runs all buckets in one jit — exactly
    # what a production DB-search driver keeps resident.
    tl = np.broadcast_to(
        lens[None, :nt], (Nq, Nt)
    ).reshape(-1).astype(np.int64)
    order = np.argsort(tl, kind="stable")
    nb = 2 if quick else 6
    splits = [len(order) * i // nb for i in range(nb + 1)]
    bucket_idx = [order[lo:hi] for lo, hi in zip(splits[:-1], splits[1:])]
    bucket_dev = []
    for idxs in bucket_idx:
        bm = int(-(-int(tl[idxs].max()) // 16) * 16)
        bucket_dev.append(
            (jax.device_put(qq[idxs]), jax.device_put(tt[idxs, :bm]))
        )

    results = []
    engines = [("colscan", sw_batch_colscan)]
    if jax.devices()[0].platform == "tpu":
        from swtpu.kernels.pallas.sw_profile import sw_batch_profile_pallas

        engines.append(("rowscan_prof", sw_batch_profile_pallas))
    for gaps, gname in (
        (dict(gap_open=11, gap_extend=11), "linear11"),
        (dict(gap_open=11, gap_extend=1), "gotoh11_1"),
    ):
        params = ScoringParams(BLOSUM62, **gaps)
        oracle = (
            sw_score_batch if params.is_linear else sw_affine_score_batch
        )
        # oracle indexes the 24x24 matrix directly: trim pad codes per pair
        want = np.array(
            [
                int(oracle(qq[p : p + 1],
                           tt[p : p + 1, : lens[p % Nt]], params)[0])
                for p in range(32)
            ],
            np.int32,
        )
        for ename, fn in engines:
            got = np.zeros(Nq * Nt, np.int32)
            for idxs, (dq, dt_) in zip(bucket_idx, bucket_dev):
                got[idxs] = np.asarray(fn(dq, dt_, params))
            parity = bool(np.array_equal(got[:32], want))

            def run_all(b0q, b0t):
                # all buckets in one jitted unit; bucket 0 rides the
                # timing chain's salt, the rest are closed-over constants
                tot = fn(b0q, b0t, params).sum()
                for dq2, dt2 in bucket_dev[1:]:
                    tot = tot + fn(dq2, dt2, params).sum()
                return tot

            per_call = time_kernel(run_all, bucket_dev[0], k=4)
            rec = dict(
                kernel=f"protein_swissprot_{ename}_{gname}",
                queries=Nq, targets=Nt,
                pairs=Nq * Nt,
                buckets=nb,
                wall_ms=round(per_call * 1e3, 1),
                gcups=round(real_cells / per_call / 1e9, 2),
                parity=parity,
                device=str(jax.devices()[0].device_kind),
            )
            print(
                f"protein_swissprot_{ename}_{gname}: "
                f"{per_call*1e3:.1f} ms / {Nq * Nt}"
            )
            print("JSON:", json.dumps(rec))
            results.append(rec)
    return results


def bench_dist(quick=False, subprocess_virtual=True):
    """BASELINE north-star scaling: alignments/s at 1..D mesh devices.

    Three axes: data-parallel batch scoring (dp), sharded all-vs-all top-k
    search (search), and the sequence-parallel longpair forward (sp).
    Weak-scaling efficiency = (aligns/s at d) / (d * aligns/s at 1 dev).

    With one physical device (the single-chip tunnel), the 1-device anchor
    is measured here and the multi-device curve is measured in a subprocess
    on a virtual 8-device CPU mesh (records tagged virtual=true) — the same
    environment the driver's dryrun uses; on a real pod slice the same code
    measures the physical curve.
    """
    import jax

    results = []
    D = len(jax.devices())
    if D == 1 and subprocess_virtual:
        # 1-device anchor on the real device
        results += _bench_dist_curve(quick, [1], virtual=False)
        # virtual weak-scaling curve in a fresh CPU-mesh subprocess
        import os
        import subprocess

        env = dict(os.environ)
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        ).strip()
        proc = subprocess.run(
            [sys.executable, "-m", "swtpu.bench_suite", "--suite", "dist",
             "--cpu-mesh", "8"] + (["--quick"] if quick else []),
            capture_output=True, text=True, env=env, timeout=3600,
        )
        if proc.returncode:
            print("dist subprocess failed:", proc.stderr[-2000:])
        else:
            for line in proc.stdout.splitlines():
                if line.startswith("JSON: "):
                    rec = json.loads(line[len("JSON: "):])
                    print(line)
                    results.append(rec)
    else:
        sizes = [d for d in (1, 2, 4, 8) if d <= D]
        results += _bench_dist_curve(quick, sizes, virtual=D <= 8)
    return results


def _dist_time(fn, args, k=4):
    """Honest chain timing on the tunnel; plain min-wall on the CPU
    mesh (the virtual mesh doesn't lie about completion, and chaining
    k x 5 reps of 1-core 8-device sweeps costs minutes per row)."""
    import jax

    from swtpu.utils import time_kernel

    if jax.devices()[0].platform == "tpu":
        return time_kernel(fn, args, k=k)
    out = fn(*args)
    jax.block_until_ready(out)
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def _bench_dist_curve(quick, sizes, virtual):
    """Weak-scaling curve with self-explaining records (round 4).

    Every record carries: analytic per-step comm bytes for its
    collective pattern, the host's physical core count, and TWO
    efficiency figures —

    - ``efficiency_vs_1dev``: classic weak scaling, aps(d) / (d * aps(1)).
      On a VIRTUAL mesh this is bounded by cores/d (d virtual devices
      share the physical cores), so its collapse measures host
      oversubscription, not the framework: on 1 core the ideal virtual
      curve IS 1/d (r03's committed 0.48/0.185/0.067 ~ 1/d — this field
      was uninterpretable without that context).
    - ``aggregate_efficiency``: aps(d) / aps(1) — total throughput
      retained while the mesh grows. A clean mechanism keeps this ~1.0
      on an oversubscribed virtual mesh (the collectives and sharding
      plumbing add nothing); a real pod reads efficiency_vs_1dev.
    """
    import os

    import jax
    import jax.numpy as jnp

    from swtpu.core.scoring import DNA_10_30_15
    from swtpu.ops.variants import best_engine
    from swtpu.parallel import make_mesh, data_parallel_scores
    from swtpu.parallel.longpair import longpair_sw_score
    from swtpu.parallel.search import sharded_all_vs_all_topk
    from swtpu.utils import time_kernel

    params = DNA_10_30_15
    results = []
    per_dev_b = 1024 if quick else 4096
    n = m = 128
    anchors = {}
    for d in sizes:
        mesh = make_mesh(d)
        # --- dp axis: per-device batch constant (weak scaling)
        B = per_dev_b * d
        qs, ts = _inputs(B, n, m)
        engine = best_engine(params)
        run = lambda a, b: data_parallel_scores(a, b, params, mesh,
                                                engine=engine)
        per_call = time_kernel(run, (jnp.asarray(qs), jnp.asarray(ts)), k=4)
        aps = B / per_call
        anchors.setdefault("dp", aps / d if d == sizes[0] and d == 1 else None)
        eff = (
            round(aps / (d * anchors["dp"]), 3)
            if anchors.get("dp")
            else None
        )
        agg = (
            round(aps / (sizes[0] * anchors["dp"]), 3)
            if anchors.get("dp")
            else None
        )
        rec = dict(
            kernel="dist_dp_weak", devices=d, batch=B,
            alignments_per_s=round(aps, 1),
            gcups=round(B * n * m / per_call / 1e9, 2),
            efficiency_vs_1dev=eff,
            aggregate_efficiency=agg,
            comm_bytes_per_step=0,
            comm_pattern="none (pairs sharded, scores stay sharded)",
            physical_cores=os.cpu_count(),
            virtual=virtual,
            device=str(jax.devices()[0].device_kind),
        )
        print(f"dist_dp_weak[{d}dev]: {per_call*1e3:.2f} ms / {B}")
        print("JSON:", json.dumps(rec))
        results.append(rec)

        # --- search axis: per-device DB shard constant
        nt_per = 512 if quick else 2048
        Nq = 8
        rng = np.random.default_rng(10000)
        Q = rng.integers(0, 4, size=(Nq, n)).astype(np.uint8)
        T = rng.integers(0, 4, size=(nt_per * d, m)).astype(np.uint8)
        sharded_all_vs_all_topk(Q, T, params, mesh, k=8)  # compile
        t0 = time.perf_counter()
        sharded_all_vs_all_topk(Q, T, params, mesh, k=8)
        wall = time.perf_counter() - t0
        aps = Nq * len(T) / wall
        anchors.setdefault(
            "search", aps / d if d == sizes[0] and d == 1 else None
        )
        eff = (
            round(aps / (d * anchors["search"]), 3)
            if anchors.get("search")
            else None
        )
        agg = (
            round(aps / (sizes[0] * anchors["search"]), 3)
            if anchors.get("search")
            else None
        )
        # each device all_gathers every shard's [Nq, k] top-k scores+ids
        comm_b = 2 * Nq * 8 * 4 * d
        rec = dict(
            kernel="dist_search_weak", devices=d, queries=Nq,
            targets=len(T), alignments_per_s=round(aps, 1),
            efficiency_vs_1dev=eff,
            aggregate_efficiency=agg,
            comm_bytes_per_device=comm_b,
            comm_pattern="all_gather of per-shard top-k (scores+ids)",
            physical_cores=os.cpu_count(),
            virtual=virtual,
            device=str(jax.devices()[0].device_kind),
        )
        print(f"dist_search_weak[{d}dev]: {wall*1e3:.1f} ms / {Nq*len(T)}")
        print("JSON:", json.dumps(rec))
        results.append(rec)

        # --- sp axis (longpair): query length grows with the mesh.
        # engine='auto' rides the Pallas strip tiles on TPU (round 5)
        # and the XLA column scan on the virtual CPU mesh.
        from swtpu.parallel.longpair import (
            _run_longpair,
            _strip_engine_ok,
        )

        Lq = (2048 if quick else 4096) * d
        Lt = 2048 if quick else 4096
        q1 = rng.integers(0, 4, size=Lq).astype(np.uint8)
        t1 = rng.integers(0, 4, size=Lt).astype(np.uint8)
        spmesh = make_mesh(d, axis="sp")
        sp_engine = "pallas" if _strip_engine_ok() else "xla"
        longpair_sw_score(q1, t1, params, spmesh)  # compile
        t0 = time.perf_counter()
        longpair_sw_score(q1, t1, params, spmesh)
        wall = time.perf_counter() - t0
        # honest device time (salted in-jit chain): the wall figure over
        # the tunnel is dispatch-bound once the engine runs sub-ms
        run_lp = lambda q_, t_: _run_longpair(
            q_, t_, params, spmesh, "sp", None
        )[:, 0]
        per_dev_sec = _dist_time(
            run_lp,
            (jnp.asarray(q1, jnp.int32), jnp.asarray(t1, jnp.int32)),
        )
        cps = Lq * Lt / per_dev_sec
        anchors.setdefault(
            "sp", cps / d if d == sizes[0] and d == 1 else None
        )
        eff = (
            round(cps / (d * anchors["sp"]), 3)
            if anchors.get("sp")
            else None
        )
        agg = (
            round(cps / (sizes[0] * anchors["sp"]), 3)
            if anchors.get("sp")
            else None
        )
        from swtpu.parallel.longpair import _auto_block

        blk = _auto_block(Lq, Lt, d)
        nsteps = Lt // blk + d - 1
        rec = dict(
            kernel="dist_longpair_weak", devices=d, shape=f"{Lq}x{Lt}",
            gcups=round(cps / 1e9, 2), efficiency_vs_1dev=eff,
            aggregate_efficiency=agg,
            engine=sp_engine,
            wall_ms=round(wall * 1e3, 1),
            honest_ms=round(per_dev_sec * 1e3, 2),
            pipeline_steps=nsteps,
            comm_bytes_per_device=nsteps * (blk + 1) * 4,
            comm_pattern="ppermute of the strip boundary row per step",
            physical_cores=os.cpu_count(),
            virtual=virtual, device=str(jax.devices()[0].device_kind),
        )
        print(f"dist_longpair_weak[{d}dev]: {wall*1e3:.1f} ms / {Lq}x{Lt}")
        print("JSON:", json.dumps(rec))
        results.append(rec)

    # --- fixed-work strong-scaling shape check (round 5, VERDICT #7):
    # the same TOTAL work on a d-device mesh vs the 1-device mesh. On a
    # 1-core virtual mesh the ideal ratio is ~1.0 (one core executes the
    # same flops either way), so wall(d)/wall(1) >> 1 falsifies the
    # sharding mechanism (duplicated compute, extra copies, bad
    # collectives) in a way the oversubscribed weak-scaling rows cannot.
    # Pipeline bubbles make longpair's analytic ideal (nb+d-1)/nb.
    if len(sizes) > 1:
        d_hi = sizes[-1]
        B = per_dev_b * 2  # fixed total batch, divisible by every d
        qs, ts = _inputs(B, n, m)
        engine = best_engine(params)
        walls = {}
        for d in (1, d_hi):
            mesh = make_mesh(d)
            run = lambda a, b: data_parallel_scores(
                a, b, params, mesh, engine=engine
            )
            walls[d] = _dist_time(
                run, (jnp.asarray(qs), jnp.asarray(ts))
            )
        ratio = walls[d_hi] / walls[1]
        rec = dict(
            kernel="dist_fixed_work_dp", devices=d_hi, batch=B,
            wall_1dev_ms=round(walls[1] * 1e3, 2),
            wall_ddev_ms=round(walls[d_hi] * 1e3, 2),
            ratio=round(ratio, 3),
            ideal_ratio=1.0,
            sharding_clean=bool(ratio < 1.5),
            note=(
                "fixed total work; on a 1-core virtual mesh ideal ~1.0 "
                "— a ratio >> 1 falsifies the dp sharding mechanism"
            ),
            physical_cores=os.cpu_count(), virtual=virtual,
            device=str(jax.devices()[0].device_kind),
        )
        print(
            f"dist_fixed_work_dp[{d_hi}dev]: ratio "
            f"{ratio:.2f} (ideal 1.0)"
        )
        print("JSON:", json.dumps(rec))
        results.append(rec)

        Lqf, Ltf = (2048, 2048) if quick else (4096, 4096)
        q1 = rng.integers(0, 4, size=Lqf).astype(np.uint8)
        t1 = rng.integers(0, 4, size=Ltf).astype(np.uint8)
        walls = {}
        nb = {}
        for d in (1, d_hi):
            spmesh = make_mesh(d, axis="sp")
            run_lp = lambda q_, t_: _run_longpair(
                q_, t_, params, spmesh, "sp", None
            )[:, 0]
            walls[d] = _dist_time(
                run_lp,
                (jnp.asarray(q1, jnp.int32), jnp.asarray(t1, jnp.int32)),
            )
            blk = _auto_block(Lqf, Ltf, d)
            nb[d] = Ltf // blk
        ratio = walls[d_hi] / walls[1]
        ideal = (nb[d_hi] + d_hi - 1) / nb[d_hi]
        rec = dict(
            kernel="dist_fixed_work_longpair", devices=d_hi,
            shape=f"{Lqf}x{Ltf}",
            wall_1dev_ms=round(walls[1] * 1e3, 2),
            wall_ddev_ms=round(walls[d_hi] * 1e3, 2),
            ratio=round(ratio, 3),
            ideal_ratio=round(ideal, 3),
            sharding_clean=bool(ratio < 2.0 * ideal),
            note=(
                "fixed 4096^2 matrix; virtual-mesh ideal = pipeline "
                "bubble factor (nb+d-1)/nb"
            ),
            physical_cores=os.cpu_count(), virtual=virtual,
            device=str(jax.devices()[0].device_kind),
        )
        print(
            f"dist_fixed_work_longpair[{d_hi}dev]: ratio {ratio:.2f} "
            f"(ideal {ideal:.2f})"
        )
        print("JSON:", json.dumps(rec))
        results.append(rec)
    return results


def bench_search(quick=False):
    """BASELINE config 5's single-chip anchor: the streaming all-vs-all
    search step (engine + device top-k + deterministic merge fused into
    one executable, swtpu.parallel.search._search_step), honest-timed via
    the salted serial chain, plus a brute-force parity spot-check of the
    full streaming loop. The pod-scale sharded variant of the same merge
    is measured by `--suite dist` (dist_search_weak)."""
    import jax
    import jax.numpy as jnp

    from swtpu.core.scoring import DNA_111
    from swtpu.oracle import sw_score_batch
    from swtpu.ops.variants import best_engine
    from swtpu.parallel.search import _search_step, all_vs_all_topk
    from swtpu.utils import time_kernel

    Nq, L, k = 16, 128, 10
    C = 512 if quick else 2048
    rng = np.random.default_rng(10000)
    Q = rng.integers(0, 4, size=(Nq, L)).astype(np.uint8)
    T = rng.integers(0, 4, size=(C, L)).astype(np.uint8)
    engine = best_engine(DNA_111)
    step = _search_step(engine, "bench", Nq, L, C, L, k, k, Nt=C)
    state_s = jnp.full((Nq, k), -1, jnp.int32)
    state_i = jnp.full((Nq, k), np.iinfo(np.int32).max, jnp.int32)
    per = time_kernel(
        lambda q, t, ss, si, c0: step(q, t, ss, si, c0)[0],
        (jnp.asarray(Q), jnp.asarray(T), state_s, state_i, jnp.int32(0)),
    )
    pairs = Nq * C
    gcups = pairs * L * L / per / 1e9

    # parity: streaming loop (tail chunk + resume state) vs brute force
    sp, ip = all_vs_all_topk(
        Q, T[: C - C // 4 + 3], DNA_111, k=k, chunk_size=C // 4,
        engine=engine,
    )
    Tsub = T[: C - C // 4 + 3]
    ref = np.stack(
        [
            sw_score_batch(
                np.repeat(Q[i : i + 1], len(Tsub), 0), Tsub, DNA_111
            )
            for i in range(Nq)
        ]
    )
    rids = np.arange(len(Tsub))[None, :].repeat(Nq, 0)
    order = np.lexsort((rids, -ref), axis=1)[:, :k]
    parity = bool(
        np.array_equal(ip, order)
        and np.array_equal(
            sp, np.take_along_axis(ref, order, axis=1).astype(np.int32)
        )
    )

    rec = dict(
        kernel="search_step_fused", queries=Nq, chunk=C, topk=k,
        wall_ms=round(per * 1e3, 3),
        aln_per_s=round(pairs / per),
        gcups=round(gcups, 1), parity=parity,
        device=str(jax.devices()[0].device_kind),
    )
    print(
        f"search_step_fused: {per*1e3:.3f} ms / {pairs} pairs "
        f"= {pairs/per/1e6:.2f} M aln/s ({gcups:.1f} GCUPS), "
        f"parity={parity}"
    )
    print("JSON:", json.dumps(rec))
    out = [rec]

    # end-to-end wall throughput of the STREAMING loop on a >=100K-seq
    # database (the real product workload: host streams chunks, device
    # holds the top-k state; double-buffered uploads + windowed syncs).
    # Wall-clocked whole-call on a distinct query set per rep (the
    # tunnel result cache serves identical calls); warmup rep compiles.
    Nt_e2e = 16384 if quick else 131072
    Ce2e = 8192
    T2 = rng.integers(0, 4, size=(Nt_e2e, L)).astype(np.uint8)
    walls = []
    for rep in range(3):
        Qr = np.random.default_rng(777 + rep).integers(
            0, 4, size=(Nq, L)
        ).astype(np.uint8)
        t0 = time.perf_counter()
        all_vs_all_topk(
            Qr, T2, DNA_111, k=k, chunk_size=Ce2e, engine=engine,
            resident=False,
        )
        if rep:
            walls.append(time.perf_counter() - t0)
    wall = min(walls)
    pairs_e2e = Nq * Nt_e2e
    rec = dict(
        kernel="search_e2e_wall", queries=Nq, targets=Nt_e2e,
        chunk=Ce2e, topk=k,
        wall_ms=round(wall * 1e3, 1),
        aln_per_s=round(pairs_e2e / wall),
        gcups=round(pairs_e2e * L * L / wall / 1e9, 1),
        device=str(jax.devices()[0].device_kind),
    )
    print(
        f"search_e2e_wall: {wall*1e3:.1f} ms / {pairs_e2e} pairs "
        f"= {pairs_e2e/wall/1e6:.2f} M aln/s wall"
    )
    print("JSON:", json.dumps(rec))
    out.append(rec)

    # round 5 postmortem: the 2-bit wire alone moved the streaming wall
    # NOT AT ALL (measured 4.7-6.0 M aln/s across runs, vs r4's raw
    # 5.5-5.9M), and neither did 4x chunks — the loop is bound by
    # per-upload costs the tunnel charges regardless of bytes. The
    # production answer for DBs that fit HBM: keep the packed DB
    # DEVICE-RESIDENT (uploaded once, id-cached) and slice chunks
    # in-jit — zero per-chunk wire. Steady-state row (DB upload
    # amortized across query sets, the warmup rep pays it):
    walls2 = []
    for rep in range(3):
        Qr = np.random.default_rng(1777 + rep).integers(
            0, 4, size=(Nq, L)
        ).astype(np.uint8)
        t0 = time.perf_counter()
        all_vs_all_topk(
            Qr, T2, DNA_111, k=k, chunk_size=Ce2e, engine=engine,
            resident=True,
        )
        if rep:
            walls2.append(time.perf_counter() - t0)
    wall2 = min(walls2)
    rec = dict(
        kernel="search_e2e_resident", queries=Nq, targets=Nt_e2e,
        chunk=Ce2e, topk=k,
        wall_ms=round(wall2 * 1e3, 1),
        aln_per_s=round(pairs_e2e / wall2),
        gcups=round(pairs_e2e * L * L / wall2 / 1e9, 1),
        packed_wire=True,
        note=(
            "packed DB device-resident (4 MB, uploaded once + "
            "id-cached), chunks sliced in-jit: zero per-chunk wire"
        ),
        device=str(jax.devices()[0].device_kind),
    )
    print(
        f"search_e2e_resident: {wall2*1e3:.1f} ms / {pairs_e2e} pairs "
        f"= {pairs_e2e/wall2/1e6:.2f} M aln/s wall"
    )
    print("JSON:", json.dumps(rec))
    out.append(rec)

    # ...and the remaining ~90 ms were 16 per-chunk dispatches: the
    # max-throughput config (no mid-sweep checkpoint) runs the whole
    # resident sweep as ONE jitted lax.scan — one dispatch, one fetch
    walls3 = []
    for rep in range(3):
        Qr = np.random.default_rng(2777 + rep).integers(
            0, 4, size=(Nq, L)
        ).astype(np.uint8)
        t0 = time.perf_counter()
        all_vs_all_topk(
            Qr, T2, DNA_111, k=k, chunk_size=Ce2e, engine=engine,
            resident=True, max_retries=0,
        )
        if rep:
            walls3.append(time.perf_counter() - t0)
    wall3 = min(walls3)
    rec = dict(
        kernel="search_e2e_fused_sweep", queries=Nq, targets=Nt_e2e,
        chunk=Ce2e, topk=k,
        wall_ms=round(wall3 * 1e3, 1),
        aln_per_s=round(pairs_e2e / wall3),
        gcups=round(pairs_e2e * L * L / wall3 / 1e9, 1),
        packed_wire=True,
        note=(
            "resident DB + whole sweep in one lax.scan executable "
            "(max-throughput: no mid-sweep checkpoint windows)"
        ),
        device=str(jax.devices()[0].device_kind),
    )
    print(
        f"search_e2e_fused_sweep: {wall3*1e3:.1f} ms / {pairs_e2e} "
        f"pairs = {pairs_e2e/wall3/1e6:.2f} M aln/s wall"
    )
    print("JSON:", json.dumps(rec))
    out.append(rec)
    return out


def bench_map(quick=False):
    """Seed-and-extend read mapping end to end (swtpu.models.mapper):
    k-mer index build (host), seeding (host numpy), batched banded
    X-drop glocal extension (device). Wall-clock timed on distinct read
    sets (the tunnel result-cache serves identical calls, so every
    timed rep uses fresh reads after a warmup set compiles the
    extension executable); quality = fraction of mutation-model reads
    mapped back to their true locus."""
    import time

    import jax

    from swtpu.core.encode import mutate
    from swtpu.models.mapper import build_index, map_reads

    G = 200_000 if quick else 1_000_000
    R = 512 if quick else 4096
    L = 152
    rng = np.random.default_rng(10000)
    genome = rng.integers(0, 4, size=G).astype(np.uint8)

    t0 = time.perf_counter()
    idx = build_index([genome], k=9)
    t_index = time.perf_counter() - t0

    def read_set(seed):
        r = np.random.default_rng(seed)
        starts = r.integers(0, G - L, size=R)
        reads = np.stack(
            [mutate(r, genome[s : s + L], out_len=L) for s in starts]
        )
        return reads, starts

    sets = [read_set(s) for s in (1, 2, 3)]
    map_reads(sets[0][0], index=idx, min_score=20)  # warmup/compile
    walls, correct = [], 0
    for reads, starts in sets[1:]:
        t0 = time.perf_counter()
        hits = map_reads(reads, index=idx, min_score=20)
        walls.append(time.perf_counter() - t0)
        correct = sum(
            1
            for i, h in enumerate(hits)
            if h is not None and abs(h.pos - int(starts[i])) <= 32
        )
    wall = min(walls)
    rec = dict(
        kernel="map_seed_extend", genome_bp=G, reads=R, read_len=L,
        index_s=round(t_index, 3), wall_ms=round(wall * 1e3, 1),
        reads_per_s=round(R / wall),
        correct_locus_frac=round(correct / R, 4),
        device=str(jax.devices()[0].device_kind),
    )
    print(
        f"map_seed_extend: {wall*1e3:.1f} ms / {R} reads vs {G/1e6:.1f} "
        f"Mbp = {R/wall/1e3:.1f} K reads/s (index {t_index:.2f} s, "
        f"correct locus {correct/R:.1%})"
    )
    print("JSON:", json.dumps(rec))
    out = [rec]

    # stage split: host seeding wall alone (what the pipeline overlaps)
    from swtpu.models.mapper import _seed_rows, map_reads_pipelined

    reads, starts = sets[-1]
    lens_full = np.full(R, L, dtype=np.int64)
    t0 = time.perf_counter()
    _seed_rows(reads, lens_full, idx, False, 2, 64, 8, 32)
    t_seed = time.perf_counter() - t0

    # pipelined mapper: a worker thread seeds chunk i+1 while the main
    # thread waits on chunk i's device extension (hit-for-hit identical
    # to map_reads — tested); wall on fresh read sets
    map_reads_pipelined(sets[0][0], index=idx, min_score=20)  # warmup
    walls_p = []
    hits_p = None
    for reads, starts in sets[1:]:
        t0 = time.perf_counter()
        hits_p = map_reads_pipelined(reads, index=idx, min_score=20)
        walls_p.append(time.perf_counter() - t0)
    wall_p = min(walls_p)
    correct_p = sum(
        1
        for i, h in enumerate(hits_p)
        if h is not None and abs(h.pos - int(starts[i])) <= 32
    )
    rec = dict(
        kernel="map_seed_extend_pipelined", genome_bp=G, reads=R,
        read_len=L, chunk_reads=max(1024, -(-R // 2)),
        wall_ms=round(wall_p * 1e3, 1),
        reads_per_s=round(R / wall_p),
        seed_only_ms=round(t_seed * 1e3, 1),
        overlapped_ms=round((wall - wall_p) * 1e3, 1),
        correct_locus_frac=round(correct_p / R, 4),
        device=str(jax.devices()[0].device_kind),
    )
    print(
        f"map_seed_extend_pipelined: {wall_p*1e3:.1f} ms / {R} reads = "
        f"{R/wall_p/1e3:.1f} K reads/s (seeding alone {t_seed*1e3:.0f} "
        f"ms; overlap reclaimed {max(wall-wall_p,0)*1e3:.0f} ms)"
    )
    print("JSON:", json.dumps(rec))
    out.append(rec)
    return out


def bench_msa(quick=False):
    """Center-star MSA end to end (swtpu.models.msa): two batched device
    NW calls (center pick over N(N-1)/2 pairs, star alignment) + host
    path walks and merge. Wall-clock on distinct families per rep (the
    tunnel result-cache serves identical calls); quality = the exact
    projection invariant on every pair."""
    import time

    import jax

    from swtpu.core.encode import mutate
    from swtpu.models.msa import GAP, msa_center_star

    N = 16 if quick else 48
    L = 128 if quick else 256
    rng = np.random.default_rng(10000)

    def family(seed):
        r = np.random.default_rng(seed)
        anc = r.integers(0, 4, size=L).astype(np.uint8)
        return [mutate(r, anc) for _ in range(N)]

    fams = [family(s) for s in (1, 2, 3)]
    msa_center_star(fams[0], match=2, mismatch=3, gap=2)  # warmup/compile
    walls, ok = [], True
    for seqs in fams[1:]:
        t0 = time.perf_counter()
        res = msa_center_star(seqs, match=2, mismatch=3, gap=2)
        walls.append(time.perf_counter() - t0)
        for k in range(N):
            if k == res.center:
                continue
            ra, rb = res.rows[res.center], res.rows[k]
            keep = ~((ra == GAP) & (rb == GAP))
            a, b = ra[keep], rb[keep]
            both = (a != GAP) & (b != GAP)
            proj = int(np.where(a[both] == b[both], 2, -3).sum()) - 2 * int(
                ((a != GAP) ^ (b != GAP)).sum()
            )
            ok &= proj == res.scores[k]
    wall = min(walls)
    rec = dict(
        kernel="msa_center_star", n_seqs=N, seq_len=L,
        wall_ms=round(wall * 1e3, 1),
        seqs_per_s=round(N / wall, 1),
        projection_ok=bool(ok),
        device=str(jax.devices()[0].device_kind),
    )
    print(
        f"msa_center_star: {wall*1e3:.1f} ms / {N} x {L}-mers "
        f"(projection invariant {'ok' if ok else 'FAILED'})"
    )
    print("JSON:", json.dumps(rec))
    out = [rec]

    if not quick:
        # scale record (round 5, VERDICT #10): N = 256 sequences — the
        # center pick scores all N(N-1)/2 = 32640 pairs in one batched
        # device call; center-star is O(N^2 L^2) device work by
        # construction (Gusfield's 2-approximation), which this row
        # makes a measured, committed fact rather than a scope note.
        N2 = 256
        r = np.random.default_rng(7)
        anc = r.integers(0, 4, size=L).astype(np.uint8)
        seqs = [mutate(r, anc) for _ in range(N2)]
        t0 = time.perf_counter()
        res = msa_center_star(seqs, match=2, mismatch=3, gap=2)
        wall2 = time.perf_counter() - t0
        ok2 = True
        for k in range(N2):
            if k == res.center:
                continue
            ra, rb = res.rows[res.center], res.rows[k]
            keep = ~((ra == GAP) & (rb == GAP))
            a, b = ra[keep], rb[keep]
            both = (a != GAP) & (b != GAP)
            proj = int(
                np.where(a[both] == b[both], 2, -3).sum()
            ) - 2 * int(((a != GAP) ^ (b != GAP)).sum())
            ok2 &= proj == res.scores[k]
        rec = dict(
            kernel="msa_center_star_n256", n_seqs=N2, seq_len=L,
            wall_ms=round(wall2 * 1e3, 1),
            pairs_scored=N2 * (N2 - 1) // 2,
            seqs_per_s=round(N2 / wall2, 1),
            projection_ok=bool(ok2),
            device=str(jax.devices()[0].device_kind),
        )
        print(
            f"msa_center_star_n256: {wall2*1e3:.1f} ms / {N2} x "
            f"{L}-mers (projection invariant {'ok' if ok2 else 'FAILED'})"
        )
        print("JSON:", json.dumps(rec))
        out.append(rec)
    return out


def forever(variant_name: str):
    """Infinite loop of one kernel for external profilers (≙ InfinitySW,
    source.cpp:3149-3170). Ctrl-C to stop."""
    import jax

    from swtpu.core.scoring import DNA_10_30_15
    from swtpu.ops import get_variant

    fn = get_variant(variant_name)
    qs, ts = _inputs(8192, 128, 128)
    dq, dts = jax.device_put(qs), jax.device_put(ts)
    i = 0
    while True:
        out = fn(dq, dts, DNA_10_30_15)
        if hasattr(out, "block_until_ready"):
            out.block_until_ready()
        i += 1
        if i % 100 == 0:
            print(i, flush=True)


def variance_summary(runs):
    """Merge N runs' records into per-kernel variance rows — the
    reference's 3-runs-per-machine discipline (ryzen3700x.txt et al.,
    source.cpp:3032-3147 committed 3 runs x 3 machines with <1% spread).
    For every numeric perf field: min / median / spread (max-min over
    median). The MIN is the quotable figure (tunnel/queueing noise is
    strictly additive, utils/timing.py); the spread says how much load
    the shared chip carried."""
    perf_fields = (
        "wall_ms", "wall_ms_per_1m", "ms_per_1m", "gcups", "band_gcups",
        "alignments_per_s", "reads_per_s", "device_fwd_walk_plus_fetch_ms",
        "host_decode_ms",
    )
    by_kernel = {}
    for run in runs:
        for rec in run:
            by_kernel.setdefault(rec.get("kernel", "?"), []).append(rec)
    out = []
    for kernel, recs in by_kernel.items():
        row = dict(kernel=kernel, runs=len(recs))
        for f in perf_fields:
            vals = [r[f] for r in recs if isinstance(r.get(f), (int, float))]
            if not vals:
                continue
            med = float(np.median(vals))
            row[f + "_min"] = min(vals)
            row[f + "_median"] = round(med, 3)
            row[f + "_spread"] = (
                round((max(vals) - min(vals)) / med, 4) if med else None
            )
        out.append(row)
        print("VARIANCE:", json.dumps(row))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument(
        "--runs", type=int, default=1, metavar="N",
        help="repeat the suite N times and append per-kernel "
        "min/median/spread variance rows (the reference's 3-run "
        "discipline)",
    )
    ap.add_argument("--forever", default=None, metavar="VARIANT")
    ap.add_argument(
        "--suite",
        default="all",
        choices=[
            "all", "sw", "semiglobal", "semiglobal16k", "semiglobal_full",
            "affine", "protein", "swissprot", "unpack", "varlen", "dist",
            "search", "map", "msa",
        ],
    )
    ap.add_argument(
        "--cpu-mesh", type=int, default=None, metavar="N",
        help="force the CPU backend with N virtual devices (used by the "
        "dist suite's weak-scaling subprocess; requires XLA_FLAGS "
        "--xla_force_host_platform_device_count=N in the environment)",
    )
    args = ap.parse_args()
    if args.cpu_mesh:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.forever:
        forever(args.forever)
        return
    def one_run():
        results = []
        if args.suite == "dist":
            return bench_dist(args.quick,
                              subprocess_virtual=not args.cpu_mesh)
        if args.suite in ("all", "sw"):
            results += bench_sw_variants(args.quick)
        if args.suite in ("all", "semiglobal"):
            results += bench_semiglobal(args.quick)
        if args.suite == "semiglobal16k":  # the fresh-process 16K section
            results += bench_semiglobal_16k(args.quick)
        if args.suite in ("all", "semiglobal_full"):
            results += bench_semiglobal_full(args.quick)
        if args.suite in ("all", "affine"):
            results += bench_affine(args.quick)
        if args.suite in ("all", "protein"):
            results += bench_protein(args.quick)
        if args.suite in ("all", "swissprot"):
            results += bench_protein_swissprot(args.quick)
        if args.suite in ("all", "varlen"):
            results += bench_varlen(args.quick)
        if args.suite in ("all", "search"):
            results += bench_search(args.quick)
        if args.suite in ("all", "map"):
            results += bench_map(args.quick)
        if args.suite in ("all", "msa"):
            results += bench_msa(args.quick)
        if args.suite in ("all", "unpack"):
            results += bench_unpack(args.quick)
        return results

    runs = []
    for r in range(args.runs):
        if args.runs > 1:
            print(f"=== run {r + 1}/{args.runs} ===")
        runs.append(one_run())
    results = [rec for run in runs for rec in run]
    if args.runs > 1:
        results += variance_summary(runs)
    json.dump(results, sys.stdout, indent=1)
    print()


if __name__ == "__main__":
    main()
