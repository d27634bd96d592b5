"""SAM output for alignment results.

The reference emits alignments as (score, [(i, j)...]) coordinate paths
(``SmithWaterman_111_long``, source.cpp:1526-1576; ``SemiGlobal_111``,
source.cpp:1776-1834); swtpu keeps that contract and adds the standard
interchange encoding on top: SAM 1.6 records (CIGAR with soft clips,
``AS`` score and ``NM`` edit-distance tags), so alignments flow straight
into samtools/IGV-style downstream tooling. Enabled with ``--sam`` on the
``align``/``semiglobal``/``banded``/``longpair`` CLI commands.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from swtpu.core.cigar import cigar_stats, path_to_cigar

__all__ = ["sam_header", "sam_record"]


def _decode(codes: np.ndarray, alphabet: str) -> str:
    if alphabet == "protein":
        from swtpu.core.protein import decode_protein

        return decode_protein(codes)
    from swtpu.core.io import decode_dna

    return decode_dna(codes)


def sam_header(
    targets: Sequence[Tuple[str, int]], sort_order: str = "unknown"
) -> str:
    """``@HD`` + one ``@SQ`` per (name, length) + ``@PG``, newline-joined
    (no trailing newline). Duplicate target names are emitted once."""
    lines = [f"@HD\tVN:1.6\tSO:{sort_order}"]
    seen = set()
    for name, length in targets:
        if name in seen:
            continue
        seen.add(name)
        lines.append(f"@SQ\tSN:{name}\tLN:{int(length)}")
    lines.append("@PG\tID:swtpu\tPN:swtpu")
    return "\n".join(lines)


def sam_record(
    qname: str,
    rname: str,
    query: np.ndarray,
    target: np.ndarray,
    score: int,
    path: Sequence[Tuple[int, int]],
    alphabet: str = "dna",
    query_len: Optional[int] = None,
    mapq: int = 255,
    flag: int = 0,
) -> str:
    """One SAM line for an alignment path.

    ``query``/``target`` are the unpadded code arrays the path was walked
    on (``query_len`` defaults to ``len(query)``); ``path`` follows the
    repo-wide convention (1-based DP cells, ``path[0]`` = anchor cell
    before the first aligned column). An empty alignment (< 2 cells)
    becomes an unmapped record (FLAG 4, ``*`` CIGAR). Tags: ``AS:i`` =
    engine score, ``NM:i`` = mismatches + inserted + deleted chars.
    ``flag=16`` marks a reverse-strand hit — per the SAM spec, pass the
    reverse-complemented query (the orientation that was aligned) as
    ``query`` in that case.
    """
    qlen = int(query_len) if query_len is not None else int(len(query))
    seq = _decode(np.asarray(query)[:qlen], alphabet)
    path = [(int(i), int(j)) for i, j in path]
    if len(path) < 2:
        # unmapped, but keep orientation bits (e.g. FLAG 16) so SEQ's
        # strand stays represented: 4 | flag
        return "\t".join(
            [
                qname, str(4 | int(flag)), "*", "0", "0", "*", "*", "0",
                "0", seq or "*", "*",
            ]
        )
    cigar = path_to_cigar(path, query, target, query_len=qlen)
    st = cigar_stats(cigar)
    nm = st["mismatches"] + st["insertions"] + st["deletions"]
    pos = path[0][1] + 1  # 1-based first aligned target column
    return "\t".join(
        [
            qname,
            str(int(flag)),
            rname,
            str(pos),
            str(int(mapq)),
            cigar,
            "*",
            "0",
            "0",
            seq or "*",
            "*",
            f"AS:i:{int(score)}",
            f"NM:i:{nm}",
        ]
    )
