"""XLA batched adaptive-banded X-drop semi-global alignment (forward pass).

Behavioral mirror of the scalar banded oracle
(``SemiGlobal_AdaptiveBanded_XDrop_111_32_70``, source.cpp:1836-1976) —
which *is* the contract for this family (the reference validates its SIMD
marks against the banded scalar, not the full matrix, source.cpp:2773-2784)
— vectorized over a batch of alignments.

Per round (one anti-diagonal per round, y + x == round):
- direction: right iff band[0] < band[W-1], ties go down (source.cpp:1891);
- band state shifts (horizontal/vertical/diagonal) exactly as
  source.cpp:1893-1907, with 0 = dead cell that never propagates
  (source.cpp:1922-1924);
- scores offset by +x_threshold; X-dropped cells zeroed; an all-dead round
  or a boundary overrun ends that alignment (masked "done", since lanes in
  a batch finish at different rounds);
- band history + per-round positions are returned for the host traceback
  pass (swtpu.batch.traceback.banded_traceback), the same forward/traceback
  split as the reference (SIMD forward, scalar traceback,
  source.cpp:2130-2162).

This engine runs the full round cap with masking (no data-dependent early
exit inside jit); the batch driver buckets by length so the cap is tight.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class BandedBatchResult:
    score: np.ndarray  # [B] final scores (offset removed)
    max_round: np.ndarray  # [B]
    n_rounds: np.ndarray  # [B] rounds actually written (history valid below)
    band_history: "np.ndarray | None"  # [R, B, W] int32 / uint8 / None
    pos_y: np.ndarray  # [R, B]
    #: per-round offsets when the history is 8-bit compressed (else None).
    #: Live cells store v - offset[r] + 1 in [1, X+1]; 0 = dead. This is the
    #: reference's own 8-bit trick: X-drop guarantees live values lie within
    #: x_threshold of the running max, so a per-round offset rebias keeps the
    #: band in 8 bits (offset_diff accumulation, source.cpp:2105-2119).
    offsets: "np.ndarray | None" = None

    def history_for(self, b: int) -> np.ndarray:
        """Reconstructed int32 band history for alignment b."""
        if self.offsets is None:
            return self.band_history[:, b]
        h = self.band_history[:, b].astype(np.int32)
        off = self.offsets[:, b][:, None]
        return np.where(h > 0, h - 1 + off, 0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "match", "mismatch", "gap", "bandwidth", "x_threshold",
        "with_history", "compress", "gap_open", "gap_extend",
    ),
)
def _banded_impl(
    qp, tp, n, m, match, mismatch, gap, bandwidth, x_threshold,
    with_history=True, compress=False, gap_open=None, gap_extend=None,
    table=None,
):
    affine = gap_open is not None and gap_open != gap_extend
    EF_DEAD = -(2**28)
    MINF = -(2**30)
    B = qp.shape[0]
    W = bandwidth
    X = x_threshold
    R = (jnp.maximum(n, m).max() + 1) * 2 - 1  # traced; cap below is static
    # static round cap from padded array sizes
    n_max = qp.shape[1] - W - 1
    m_max = tp.shape[1] - 2 * W
    R_cap = (max(n_max, m_max) + 1) * 2 - 1

    off = (W - 1) - jnp.arange(W)[None, :]  # [1, W]

    def shift_down(a):  # horizontal[i] = a[i-1], [0] = 0
        return jnp.pad(a, ((0, 0), (1, 0)))[:, :-1]

    def shift_up(a):  # vertical[i] = a[i+1], [W-1] = 0
        return jnp.pad(a, ((0, 0), (0, 1)))[:, 1:]

    result0 = jnp.zeros((B, W), jnp.int32).at[:, W - 1].set(X)

    # band-aligned character windows, maintained by shift+insert instead of
    # per-round 32-wide gathers (which are pathologically slow on TPU):
    # q_win[k] = qp[now_y + W-1-k], t_win[k] = tp[now_x - W+1+k]
    state0 = dict(
        result=result0,
        horizontal=jnp.zeros((B, W), jnp.int32),
        vertical=jnp.zeros((B, W), jnp.int32),
        now_y=jnp.zeros((B,), jnp.int32),
        now_x=jnp.full((B,), W - 1, jnp.int32),
        q_win=qp[:, :W][:, ::-1],
        t_win=tp[:, :W],
        max_score=jnp.full((B,), X, jnp.int32),
        max_round=jnp.zeros((B,), jnp.int32),
        n_rounds=jnp.ones((B,), jnp.int32),
        done=jnp.zeros((B,), jnp.bool_),
    )
    if affine:
        state0["e_band"] = jnp.full((B, W), EF_DEAD, jnp.int32)
        state0["f_band"] = jnp.full((B, W), EF_DEAD, jnp.int32)
    qp_last = qp.shape[1] - 1
    tp_last = tp.shape[1] - 1

    def step(state, r):
        res = state["result"]
        right = res[:, 0] < res[:, W - 1]
        diagonal = jnp.where(right[:, None], state["vertical"], state["horizontal"])
        horizontal = jnp.where(right[:, None], res, shift_down(res))
        vertical = jnp.where(right[:, None], shift_up(res), res)
        now_x = state["now_x"] + right.astype(jnp.int32)
        now_y = state["now_y"] + (~right).astype(jnp.int32)

        # boundary overrun ends the alignment BEFORE this round is recorded
        # (source.cpp:1898-1900, 1909-1911); so does the oracle's per-pair
        # round cap (max(n,m)+1)*2 - 1 — without it, variable-length
        # batches would keep shorter pairs running to the array-shape cap
        overrun = jnp.where(
            right, now_x > (W + m + (W - 1)), now_y > (n + 1)
        )
        rcap = (jnp.maximum(n, m) + 1) * 2 - 1
        done_pre = state["done"] | overrun | (r >= rcap)
        active = ~done_pre

        # slide char windows: one [B,1] gather per sequence per round
        iq = jnp.take_along_axis(
            qp, jnp.minimum(now_y + W - 1, qp_last)[:, None], axis=1
        )
        it = jnp.take_along_axis(
            tp, jnp.minimum(now_x, tp_last)[:, None], axis=1
        )
        q_win = jnp.where(
            right[:, None],
            state["q_win"],
            jnp.concatenate([iq, state["q_win"][:, :-1]], axis=1),
        )
        t_win = jnp.where(
            right[:, None],
            jnp.concatenate([state["t_win"][:, 1:], it], axis=1),
            state["t_win"],
        )
        yc, xc = q_win, t_win
        valid = (yc >= 0) & (xc >= 0)
        if table is None:
            sc = jnp.where(valid & (yc == xc), match, -mismatch)
        else:
            # general-matrix mode: pad rows/cols of `table` already hold
            # matrix.min() (see _banded_ext_table), so no valid-mask needed
            stride = table.shape[0]
            qi = jnp.where(yc >= 0, yc, stride - 2)
            ti = jnp.where(xc >= 0, xc, stride - 1)
            sc = jnp.take(table.reshape(-1), qi * stride + ti, axis=0)

        r_new = jnp.zeros((B, W), jnp.int32)
        r_new = jnp.where(
            diagonal != 0, jnp.maximum(r_new, diagonal + sc), r_new
        )
        if affine:
            # Gotoh E/F with dead-cell blocking (see oracle/banded_affine)
            eb, fb = state["e_band"], state["f_band"]
            he = jnp.where(
                right[:, None],
                eb,
                jnp.pad(eb, ((0, 0), (1, 0)), constant_values=EF_DEAD)[
                    :, :-1
                ],
            )
            vf = jnp.where(
                right[:, None],
                jnp.pad(fb, ((0, 0), (0, 1)), constant_values=EF_DEAD)[
                    :, 1:
                ],
                fb,
            )
            e_new = jnp.maximum(
                jnp.where(he > EF_DEAD // 2, he - gap_extend, MINF),
                jnp.where(horizontal != 0, horizontal - gap_open, MINF),
            )
            f_new = jnp.maximum(
                jnp.where(vf > EF_DEAD // 2, vf - gap_extend, MINF),
                jnp.where(vertical != 0, vertical - gap_open, MINF),
            )
            r_new = jnp.maximum(
                r_new, jnp.where(e_new > MINF // 2, e_new, 0)
            )
            r_new = jnp.maximum(
                r_new, jnp.where(f_new > MINF // 2, f_new, 0)
            )
        else:
            r_new = jnp.where(
                horizontal != 0, jnp.maximum(r_new, horizontal - gap), r_new
            )
            r_new = jnp.where(
                vertical != 0, jnp.maximum(r_new, vertical - gap), r_new
            )
        round_max = r_new.max(axis=1)

        upd = active & (state["max_score"] < round_max)
        max_score = jnp.where(upd, round_max, state["max_score"])
        max_round = jnp.where(upd, r, state["max_round"])

        r_new = jnp.where(r_new < (max_score[:, None] - X), 0, r_new)

        # freeze state for finished lanes
        keep = lambda new, old: jnp.where(active[:, None], new, old)
        keep1 = lambda new, old: jnp.where(active, new, old)
        state = dict(
            result=keep(r_new, res),
            horizontal=keep(horizontal, state["horizontal"]),
            vertical=keep(vertical, state["vertical"]),
            now_y=keep1(now_y, state["now_y"]),
            now_x=keep1(now_x, state["now_x"]),
            q_win=keep(q_win, state["q_win"]),
            t_win=keep(t_win, state["t_win"]),
            max_score=max_score,
            max_round=max_round,
            n_rounds=keep1(
                jnp.full((B,), r + 1, jnp.int32), state["n_rounds"]
            ),
            done=done_pre | (active & (round_max == 0)),
        )
        if affine:
            e_keep = jnp.where(r_new == 0, EF_DEAD, e_new)
            f_keep = jnp.where(r_new == 0, EF_DEAD, f_new)
            state["e_band"] = keep(e_keep, eb)
            state["f_band"] = keep(f_keep, fb)
        hist = keep(r_new, jnp.zeros((B, W), jnp.int32))
        posy = keep1(now_y, jnp.zeros((B,), jnp.int32))
        # live cells sit in (max_score - X, max_score]; the offset rebias
        # below is what lets callers keep the history in 8 bits
        offs = max_score - X
        return state, (hist, posy, offs)

    rounds = jnp.arange(1, R_cap)
    # unroll: the per-round tensors are small, so XLA loop overhead
    # dominates; unrolling amortizes it
    state, (hist, posy, offs) = jax.lax.scan(
        step, state0, rounds, unroll=8
    )
    # prepend round 0
    hist = jnp.concatenate([result0[None], hist], axis=0)  # [R_cap, B, W]
    posy = jnp.concatenate([jnp.zeros((1, B), jnp.int32), posy], axis=0)
    offs = jnp.concatenate([jnp.zeros((1, B), jnp.int32), offs], axis=0)
    if not with_history:
        # scoring-only: XLA dead-code-eliminates the history stacking, and
        # nothing large crosses the (slow) host link
        hist = posy = offs = None
    elif compress:
        # compress ON DEVICE so the host transfer is uint8 (4x smaller)
        hist = jnp.where(
            hist > 0, hist - offs[:, :, None] + 1, 0
        ).astype(jnp.uint8)
    return (
        state["max_score"] - X,
        state["max_round"],
        state["n_rounds"],
        hist,
        posy,
        offs,
    )


def _banded_ext_table(matrix) -> np.ndarray:
    """Extended substitution table for the banded family: any pad index
    scores matrix.min() (the banded oracles' pad contract — the uniform
    mode's 'pads score -mismatch' generalized)."""
    matrix = np.asarray(matrix, dtype=np.int32)
    A = matrix.shape[0]
    stride = 8 if A <= 6 else 32
    if A + 2 > stride:
        raise NotImplementedError(f"alphabet of {A} letters unsupported")
    ext = np.full((stride, stride), int(matrix.min()), dtype=np.int32)
    ext[:A, :A] = matrix
    return ext


def _prep_padded(qs, ts, lens_q, lens_t, bandwidth):
    """Padded wire arrays for the XLA forward: qp [B, 1+n+W] / tp
    [B, W+m+W] int32 with -1 (≙ 0xF0) pads, per the oracle's layout."""
    qs = np.asarray(qs)
    ts = np.asarray(ts)
    B, n = qs.shape
    m = ts.shape[1]
    W = bandwidth
    lens_q = np.full(B, n) if lens_q is None else np.asarray(lens_q)
    lens_t = np.full(B, m) if lens_t is None else np.asarray(lens_t)
    qp = np.full((B, 1 + n + W), -1, dtype=np.int32)
    tp = np.full((B, W + m + W), -1, dtype=np.int32)
    qp[:, 1 : 1 + n] = np.where(
        np.arange(n)[None, :] < lens_q[:, None], qs.astype(np.int32), -1
    )
    tp[:, W : W + m] = np.where(
        np.arange(m)[None, :] < lens_t[:, None], ts.astype(np.int32), -1
    )
    return qp, tp, lens_q, lens_t


def bench_forward_fn(
    qs,
    ts,
    lens_q=None,
    lens_t=None,
    match=1,
    mismatch=1,
    gap=1,
    bandwidth=32,
    x_threshold=70,
    gap_open=None,
    gap_extend=None,
    matrix=None,
    with_history=False,
):
    """(fn, devargs) for honest timing via swtpu.utils.time_kernel.

    fn(qp, tp) runs the jitted forward on pre-staged device arrays and
    returns the [B] scores (scoring-only mode) or a scalar fold of
    score + history (history mode) so the timing chain fetches nothing
    big. The kernel's wall time is round-cap-bound, not data-dependent,
    so the chain's char salting does not change the work measured.
    """
    import jax.numpy as jnp

    qp, tp, lq, lt = _prep_padded(qs, ts, lens_q, lens_t, int(bandwidth))
    lq_d, lt_d = jnp.asarray(lq), jnp.asarray(lt)
    table = None if matrix is None else jnp.asarray(_banded_ext_table(matrix))

    def fn(qp_d, tp_d):
        out = _banded_impl(
            qp_d, tp_d, lq_d, lt_d, int(match), int(mismatch), int(gap),
            int(bandwidth), int(x_threshold), with_history=with_history,
            compress=with_history, gap_open=gap_open, gap_extend=gap_extend,
            table=table,
        )
        if with_history:
            score, _, _, hist, posy, _ = out
            return (
                score.sum()
                + hist.astype(jnp.int32).sum()
                + posy.sum()
            )
        return out[0]

    return fn, (jnp.asarray(qp), jnp.asarray(tp))


def banded_xdrop_batch(
    qs,
    ts,
    lens_q=None,
    lens_t=None,
    match=1,
    mismatch=1,
    gap=1,
    bandwidth=32,
    x_threshold=70,
    compress_history=False,
    with_history=True,
    gap_open=None,
    gap_extend=None,
    matrix=None,
) -> BandedBatchResult:
    """Batched adaptive-banded X-drop forward pass.

    with_history=False returns scores/endpoint-rounds only (band_history
    None): the fast path for scoring workloads — nothing big crosses the
    host link and XLA removes the history stacking entirely.

    qs: [B, n] uint8, ts: [B, m] uint8; optional per-pair lengths (defaults
    full width). Returns a BandedBatchResult whose per-alignment contents
    are bit-equal to swtpu.oracle.banded_xdrop(..., return_state=True).
    ``matrix`` ([A, A] signed scores) selects the general-matrix / protein
    mode (match/mismatch ignored; oracle parity via its ``matrix=`` arg).
    """
    # padded sequences (pad = -1 ≙ 0xF0): q: 1 front + W back;
    # t: W front + W back (see oracle); vectorized masked writes
    qp, tp, lens_q, lens_t = _prep_padded(
        qs, ts, lens_q, lens_t, bandwidth
    )

    score, max_round, n_rounds, hist, posy, offs = _banded_impl(
        jnp.asarray(qp),
        jnp.asarray(tp),
        jnp.asarray(lens_q),
        jnp.asarray(lens_t),
        int(match),
        int(mismatch),
        int(gap),
        int(bandwidth),
        int(x_threshold),
        with_history=with_history,
        compress=compress_history,
        gap_open=gap_open,
        gap_extend=gap_extend,
        table=(
            None if matrix is None
            else jnp.asarray(_banded_ext_table(matrix))
        ),
    )
    if not with_history:
        return BandedBatchResult(
            score=np.asarray(score),
            max_round=np.asarray(max_round),
            n_rounds=np.asarray(n_rounds),
            band_history=None,
            pos_y=None,
        )
    if compress_history:
        if x_threshold > 254:
            raise ValueError("8-bit history needs x_threshold <= 254")
        return BandedBatchResult(
            score=np.asarray(score),
            max_round=np.asarray(max_round),
            n_rounds=np.asarray(n_rounds),
            band_history=np.asarray(hist),
            pos_y=np.asarray(posy),
            offsets=np.asarray(offs),
        )
    hist = np.asarray(hist)
    return BandedBatchResult(
        score=np.asarray(score),
        max_round=np.asarray(max_round),
        n_rounds=np.asarray(n_rounds),
        band_history=hist,
        pos_y=np.asarray(posy),
    )
