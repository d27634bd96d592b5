"""Scalar/vectorized numpy oracles — the semantic ground truth.

Each function mirrors, in behavior (not code), one of the reference's scalar
oracles; every device kernel in swtpu is differential-tested against these
(the reference's own test strategy, ``source.cpp:2943-3030``).
"""

from swtpu.oracle.sw import (  # noqa: F401
    sw_score,
    sw_score_batch,
    sw_traceback,
)
from swtpu.oracle.semiglobal import (  # noqa: F401
    semiglobal_full,
    banded_xdrop,
)
