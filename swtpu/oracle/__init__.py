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
    semiglobal_affine_full,
    nw_full,
    nw_affine_full,
    banded_xdrop,
)
from swtpu.oracle.affine import (  # noqa: F401
    sw_affine_score,
    sw_affine_score_batch,
    sw_affine_traceback,
)
from swtpu.oracle.banded_affine import banded_affine_xdrop  # noqa: F401
from swtpu.oracle.banded_static import (  # noqa: F401
    sw_banded_static_score,
    sw_banded_static_score_batch,
    sw_banded_static_traceback,
)
