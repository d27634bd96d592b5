"""Native (C++) host runtime: traceback walkers + 2-bit codec.

Compiled lazily with g++ on first use (cached under native/_build/), bound
via ctypes. Every function is semantics-identical to its numpy twin in
swtpu.oracle / swtpu.core.encode and is differential-tested against it;
the batch engines prefer the native path when the toolchain is available
(`swtpu.native.available()`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "swnative.cpp")
_BUILD_DIR = os.path.join(_HERE, "_build")
_LIB_PATH = os.path.join(_BUILD_DIR, "libswnative.so")

_lib = None
_load_error: Optional[str] = None


def _build() -> str:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    if os.path.exists(_LIB_PATH) and os.path.getmtime(
        _LIB_PATH
    ) >= os.path.getmtime(_SRC):
        return _LIB_PATH
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        "-std=c++17",
        _SRC,
        "-o",
        _LIB_PATH,
    ]
    # OpenMP parallelizes the per-read seeding loop; fall back to a
    # serial build if libgomp is unavailable in this toolchain
    try:
        subprocess.run(
            cmd[:1] + ["-fopenmp"] + cmd[1:], check=True,
            capture_output=True,
        )
    except subprocess.CalledProcessError:
        subprocess.run(cmd, check=True, capture_output=True)
    return _LIB_PATH


def _get_lib():
    global _lib, _load_error
    if _lib is not None or _load_error is not None:
        return _lib
    try:
        lib = ctypes.CDLL(_build())
        i8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64 = ctypes.c_int64
        i32 = ctypes.c_int32

        lib.sw_pack_2bit.argtypes = [i8p, i64, i8p]
        lib.sw_unpack_2bit.argtypes = [i8p, i64, i8p]
        lib.sw_traceback.restype = i64
        lib.sw_traceback.argtypes = [
            i8p, i64, i8p, i64, i32p, i32, i32, i32p, i32p,
        ]
        lib.banded_static_traceback.restype = i64
        lib.banded_static_traceback.argtypes = [
            i8p, i64, i8p, i64, i32p, i32, i32, i32, i32, i32p, i32p,
        ]
        lib.sw_affine_traceback.restype = i64
        lib.sw_affine_traceback.argtypes = [
            i8p, i64, i8p, i64, i32p, i32, i32, i32, i32p, i32p,
        ]
        lib.semiglobal_traceback.restype = i64
        lib.semiglobal_traceback.argtypes = [
            i8p, i64, i8p, i64, i32, i32, i32, i32, i32p, i32p,
        ]
        lib.semiglobal_traceback_matrix.restype = i64
        lib.semiglobal_traceback_matrix.argtypes = [
            i8p, i64, i8p, i64, i32p, i32, i32, i32, i32p, i32p,
        ]
        lib.semiglobal_affine_traceback.restype = i64
        lib.semiglobal_affine_traceback.argtypes = [
            i8p, i64, i8p, i64, i32p, i32, i32, i32, i32, i32p, i32p,
        ]
        lib.banded_traceback.restype = i64
        lib.banded_traceback.argtypes = [
            i8p, i64, i8p, i64, i32p, i32p, i64, i64, i32, i32p, i32,
            i32, i32, i32p,
        ]
        lib.banded_affine_traceback.restype = i64
        lib.banded_affine_traceback.argtypes = [
            i8p, i64, i8p, i64, i32p, i32p, i64, i64, i32, i32p, i32,
            i32, i32, i32, i32p,
        ]
        lib.sw_traceback_lowmem.restype = i64
        lib.sw_traceback_lowmem.argtypes = [
            i8p, i64, i8p, i64, i32p, i32, i32, i32, i64, i64, i32,
            i32p, i32p,
        ]
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.seed_candidates.restype = i64
        lib.seed_candidates.argtypes = [
            i64p, i64, i64, i64, i32p, i32p, i64, i64, i64, i64,
            i64p, i64p, i32p,
        ]
        lib.decode_move_wire.restype = i64
        lib.decode_move_wire.argtypes = [
            i8p, i64, i64, i32p, i32p, i32p, i64,
        ]
        _lib = lib
    except Exception as e:  # toolchain missing etc.
        _load_error = str(e)
    return _lib


def available() -> bool:
    return _get_lib() is not None


def _u8(a):
    a = np.ascontiguousarray(a, dtype=np.uint8)
    return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _i32(a):
    a = np.ascontiguousarray(a, dtype=np.int32)
    return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _uniform_matrix_for(q, t, match, mismatch) -> np.ndarray:
    """Uniform match/mismatch as a matrix sized to the observed alphabet
    (the C++ walkers index matrix[q*A + t], and the uniform contract is
    any-alphabet: score = match iff chars equal)."""
    A = int(
        max(
            4,
            (int(q.max()) + 1) if len(q) else 4,
            (int(t.max()) + 1) if len(t) else 4,
        )
    )
    m = np.full((A, A), -int(mismatch), dtype=np.int32)
    np.fill_diagonal(m, int(match))
    return m


def pack_2bit(seq: np.ndarray) -> np.ndarray:
    lib = _get_lib()
    seq, sp = _u8(seq.reshape(-1))
    out = np.empty(len(seq) // 4, np.uint8)
    _, op = _u8(out)
    op = out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    lib.sw_pack_2bit(sp, len(seq), op)
    return out


def unpack_2bit(packed: np.ndarray) -> np.ndarray:
    lib = _get_lib()
    packed, pp = _u8(packed.reshape(-1))
    out = np.empty(len(packed) * 4, np.uint8)
    op = out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    lib.sw_unpack_2bit(pp, len(packed), op)
    return out


def sw_traceback(
    q: np.ndarray, t: np.ndarray, matrix: np.ndarray, gap: int
) -> Tuple[int, List[Tuple[int, int]]]:
    lib = _get_lib()
    q, qp = _u8(q)
    t, tp = _u8(t)
    matrix = np.ascontiguousarray(matrix, dtype=np.int32)
    A = matrix.shape[0]
    mat, mp = _i32(matrix.reshape(-1))
    path = np.empty(2 * (len(q) + len(t) + 2), np.int32)
    pp = path.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    score = ctypes.c_int32(0)
    ln = lib.sw_traceback(
        qp, len(q), tp, len(t), mp, int(A), int(gap), pp,
        ctypes.byref(score),
    )
    if ln < 0:
        raise AssertionError("inconsistent native traceback")
    pairs = path[: 2 * ln].reshape(-1, 2)
    return int(score.value), [tuple(map(int, p)) for p in pairs]


def banded_static_traceback(
    q: np.ndarray,
    t: np.ndarray,
    matrix: np.ndarray,
    gap_open: int,
    gap_extend: int,
    bandwidth: int = 32,
) -> Tuple[int, List[Tuple[int, int]]]:
    """Fixed-band walk (linear when gap_open == gap_extend, else Gotoh)."""
    lib = _get_lib()
    q, qp = _u8(q)
    t, tp = _u8(t)
    matrix = np.ascontiguousarray(matrix, dtype=np.int32)
    A = matrix.shape[0]
    mat, mp = _i32(matrix.reshape(-1))
    path = np.empty(2 * (len(q) + len(t) + 2), np.int32)
    pp = path.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    score = ctypes.c_int32(0)
    ln = lib.banded_static_traceback(
        qp, len(q), tp, len(t), mp, int(A), int(gap_open),
        int(gap_extend), int(bandwidth), pp, ctypes.byref(score),
    )
    if ln < 0:
        raise AssertionError("inconsistent native fixed-band traceback")
    pairs = path[: 2 * ln].reshape(-1, 2)
    return int(score.value), [tuple(map(int, p)) for p in pairs]


def sw_affine_traceback(
    q: np.ndarray,
    t: np.ndarray,
    matrix: np.ndarray,
    gap_open: int,
    gap_extend: int,
) -> Tuple[int, List[Tuple[int, int]]]:
    lib = _get_lib()
    q, qp = _u8(q)
    t, tp = _u8(t)
    matrix = np.ascontiguousarray(matrix, dtype=np.int32)
    A = matrix.shape[0]
    mat, mp = _i32(matrix.reshape(-1))
    path = np.empty(2 * (len(q) + len(t) + 2), np.int32)
    pp = path.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    score = ctypes.c_int32(0)
    ln = lib.sw_affine_traceback(
        qp, len(q), tp, len(t), mp, int(A), int(gap_open),
        int(gap_extend), pp, ctypes.byref(score),
    )
    if ln < 0:
        raise AssertionError("inconsistent native affine traceback")
    pairs = path[: 2 * ln].reshape(-1, 2)
    return int(score.value), [tuple(map(int, p)) for p in pairs]


def sw_traceback_lowmem(
    q: np.ndarray,
    t: np.ndarray,
    matrix: np.ndarray,
    gap_open: int,
    gap_extend: int,
    ends: Optional[Tuple[int, int]] = None,
    row_block: int = 512,
) -> Tuple[int, List[Tuple[int, int]]]:
    """Checkpointed low-memory local-alignment walk (twin of
    swtpu.batch.lowmem.sw_traceback_lowmem; exact for any gap model —
    the C++ serial recurrences need no E-chain decoupling)."""
    lib = _get_lib()
    q, qp = _u8(q)
    t, tp = _u8(t)
    matrix = np.ascontiguousarray(matrix, dtype=np.int32)
    A = matrix.shape[0]
    mat, mp = _i32(matrix.reshape(-1))
    ei, ej = (-1, -1) if ends is None else (int(ends[0]), int(ends[1]))
    path = np.empty(2 * (len(q) + len(t) + 2), np.int32)
    pp = path.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    score = ctypes.c_int32(0)
    ln = lib.sw_traceback_lowmem(
        qp, len(q), tp, len(t), mp, int(A), int(gap_open),
        int(gap_extend), ei, ej, int(row_block), pp, ctypes.byref(score),
    )
    if ln < 0:
        raise AssertionError("inconsistent native lowmem traceback")
    pairs = path[: 2 * ln].reshape(-1, 2)
    return int(score.value), [tuple(map(int, p)) for p in pairs]


def semiglobal_traceback(
    q: np.ndarray, t: np.ndarray, match: int, mismatch: int, gap: int,
    pin_end: bool = False,
) -> Tuple[int, List[Tuple[int, int]]]:
    """pin_end=True pins the endpoint at the (n, m) corner — GLOBAL
    (Needleman-Wunsch) alignment (twin of oracle.nw_full)."""
    lib = _get_lib()
    q, qp = _u8(q)
    t, tp = _u8(t)
    path = np.empty(2 * (len(q) + len(t) + 2), np.int32)
    pp = path.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    score = ctypes.c_int32(0)
    ln = lib.semiglobal_traceback(
        qp, len(q), tp, len(t), int(match), int(mismatch), int(gap),
        int(pin_end), pp, ctypes.byref(score),
    )
    if ln < 0:
        raise AssertionError("inconsistent native semiglobal traceback")
    pairs = path[: 2 * ln].reshape(-1, 2)
    return int(score.value), [tuple(map(int, p)) for p in pairs]


def semiglobal_traceback_matrix(
    q: np.ndarray, t: np.ndarray, matrix: np.ndarray, gap: int,
    pin_end: bool = False,
) -> Tuple[int, List[Tuple[int, int]]]:
    """General-matrix linear-gap semi-global walk (twin of
    oracle.semiglobal_full with matrix=); pin_end -> global/NW."""
    lib = _get_lib()
    q, qp = _u8(q)
    t, tp = _u8(t)
    matrix = np.ascontiguousarray(matrix, dtype=np.int32)
    A = matrix.shape[0]
    mat, mp = _i32(matrix.reshape(-1))
    path = np.empty(2 * (len(q) + len(t) + 2), np.int32)
    pp = path.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    score = ctypes.c_int32(0)
    ln = lib.semiglobal_traceback_matrix(
        qp, len(q), tp, len(t), mp, int(A), int(gap), int(pin_end), pp,
        ctypes.byref(score),
    )
    if ln < 0:
        raise AssertionError("inconsistent native semiglobal matrix traceback")
    pairs = path[: 2 * ln].reshape(-1, 2)
    return int(score.value), [tuple(map(int, p)) for p in pairs]


def semiglobal_affine_traceback(
    q: np.ndarray,
    t: np.ndarray,
    matrix: np.ndarray,
    gap_open: int,
    gap_extend: int,
    pin_end: bool = False,
) -> Tuple[int, List[Tuple[int, int]]]:
    """Gotoh semi-global walk (twin of oracle.semiglobal_affine_full);
    pin_end -> global/NW (twin of oracle.nw_affine_full)."""
    lib = _get_lib()
    q, qp = _u8(q)
    t, tp = _u8(t)
    matrix = np.ascontiguousarray(matrix, dtype=np.int32)
    A = matrix.shape[0]
    mat, mp = _i32(matrix.reshape(-1))
    path = np.empty(2 * (len(q) + len(t) + 2), np.int32)
    pp = path.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    score = ctypes.c_int32(0)
    ln = lib.semiglobal_affine_traceback(
        qp, len(q), tp, len(t), mp, int(A), int(gap_open),
        int(gap_extend), int(pin_end), pp, ctypes.byref(score),
    )
    if ln < 0:
        raise AssertionError("inconsistent native affine semiglobal traceback")
    pairs = path[: 2 * ln].reshape(-1, 2)
    return int(score.value), [tuple(map(int, p)) for p in pairs]


def banded_traceback(
    q: np.ndarray,
    t: np.ndarray,
    band_history: np.ndarray,
    pos_y: np.ndarray,
    n_rounds: int,
    max_round: int,
    max_score_off: int,
    match: int = 1,
    mismatch: int = 1,
    gap: int = 1,
    bandwidth: int = 32,
    matrix=None,
) -> List[Tuple[int, int]]:
    lib = _get_lib()
    q, qp = _u8(q)
    t, tp = _u8(t)
    hist, hp = _i32(band_history[:n_rounds])
    py, pyp = _i32(pos_y[:n_rounds])
    if matrix is None:
        matrix = _uniform_matrix_for(q, t, match, mismatch)
    matrix = np.ascontiguousarray(matrix, dtype=np.int32)
    A = matrix.shape[0]
    mat, mp = _i32(matrix.reshape(-1))
    path = np.empty(2 * (len(q) + len(t) + 2 * bandwidth + 4), np.int32)
    pp = path.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    ln = lib.banded_traceback(
        qp, len(q), tp, len(t), hp, pyp, int(n_rounds), int(max_round),
        int(max_score_off), mp, int(A), int(gap),
        int(bandwidth), pp,
    )
    if ln < 0:
        raise AssertionError("inconsistent native banded traceback")
    pairs = path[: 2 * ln].reshape(-1, 2)
    return [tuple(map(int, p)) for p in pairs]


def banded_affine_traceback(
    q: np.ndarray,
    t: np.ndarray,
    band_history: np.ndarray,
    pos_y: np.ndarray,
    n_rounds: int,
    max_round: int,
    max_score_off: int,
    match: int,
    mismatch: int,
    gap_open: int,
    gap_extend: int,
    bandwidth: int = 32,
    matrix=None,
) -> List[Tuple[int, int]]:
    """Gotoh walk over a device band history (E/F reconstructed in C++)."""
    lib = _get_lib()
    q, qp = _u8(q)
    t, tp = _u8(t)
    hist, hp = _i32(band_history[:n_rounds])
    py, pyp = _i32(pos_y[:n_rounds])
    if matrix is None:
        matrix = _uniform_matrix_for(q, t, match, mismatch)
    matrix = np.ascontiguousarray(matrix, dtype=np.int32)
    A = matrix.shape[0]
    mat, mp = _i32(matrix.reshape(-1))
    path = np.empty(2 * (len(q) + len(t) + 2 * bandwidth + 4), np.int32)
    pp = path.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    ln = lib.banded_affine_traceback(
        qp, len(q), tp, len(t), hp, pyp, int(n_rounds), int(max_round),
        int(max_score_off), mp, int(A), int(gap_open),
        int(gap_extend), int(bandwidth), pp,
    )
    if ln < 0:
        raise AssertionError("inconsistent native affine banded traceback")
    pairs = path[: 2 * ln].reshape(-1, 2)
    return [tuple(map(int, p)) for p in pairs]


def decode_move_wire(
    wire: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode the device banded walker's 2-bit move wire (C++ twin of the
    numpy path in kernels/xla/banded_scan.decode_device_walk; ≙ the
    reference's scalar band traceback, source.cpp:2130-2162).

    wire: [B, row_bytes] uint8 — 20-byte meta + packed moves per pair.
    Returns (scores int32 [B], path_len int32 [B], paths int32
    [B, max_points, 2]) with paths stored start -> end; row b's valid
    points are paths[b, :path_len[b]]. Raises on an unset ok flag.
    """
    lib = _get_lib()
    wire, wp = _u8(wire)
    B, row_bytes = wire.shape
    stride = 4 * (row_bytes - 20) + 1  # max path points
    scores = np.empty(B, np.int32)
    plen = np.empty(B, np.int32)
    paths = np.empty((B, stride, 2), np.int32)
    rc = lib.decode_move_wire(
        wp, B, row_bytes,
        scores.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        plen.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        paths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        stride,
    )
    if rc < 0:
        raise AssertionError(
            f"inconsistent device banded traceback at pair {-rc - 1}"
        )
    return scores, plen, paths


def _i64(a):
    a = np.ascontiguousarray(a, dtype=np.int64)
    return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def seed_candidates(
    qcodes: np.ndarray,
    csr: np.ndarray,
    pos: np.ndarray,
    L: int,
    dw: int,
    max_occ: int,
    min_seeds: int,
    max_loci: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """C++ twin of the mapper's seeding + diagonal clustering
    (swtpu.models.mapper.find_candidates) — bit-equal outputs, OpenMP
    across reads. qcodes: [R, nk] int64 (-1 invalid), csr: the index's
    direct-addressed int32 row starts, pos: int32 positions ordered by
    code. Returns (read, anchor, n_seeds) int64 arrays."""
    lib = _get_lib()
    qcodes, qp = _i64(qcodes)
    csr, cp = _i32(csr)
    pos, pp = _i32(pos)
    R, nk = qcodes.shape
    out_anchor = np.empty(R * max_loci, np.int64)
    out_nseeds = np.empty(R * max_loci, np.int64)
    out_cnt = np.zeros(R, np.int32)
    ap = out_anchor.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    np_ = out_nseeds.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    ctp = out_cnt.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    lib.seed_candidates(
        qp, R, nk, int(L), cp, pp, int(dw), int(max_occ),
        int(min_seeds), int(max_loci), ap, np_, ctp,
    )
    read = np.repeat(np.arange(R, dtype=np.int64), out_cnt)
    keep = (
        np.arange(max_loci)[None, :] < out_cnt[:, None]
    ).reshape(-1)
    return read, out_anchor[keep], out_nseeds[keep]
