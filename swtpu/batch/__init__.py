from swtpu.batch.traceback import (  # noqa: F401
    sw_align_batch,
    semiglobal_align_batch,
    nw_align_batch,
    banded_align_batch,
    banded_forward_batch,
    banded_walk_batch,
    banded_static_align_batch,
    banded_affine_traceback,
    reconstruct_affine_bands,
)
from swtpu.batch.bucketing import (  # noqa: F401
    sw_scores_bucketed,
    sw_scores_varlen,
    bucket_edges,
)
from swtpu.batch.promote import sw_scores_promoted  # noqa: F401
