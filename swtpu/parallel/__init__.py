from swtpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    data_parallel_scores,
)
from swtpu.parallel.search import (  # noqa: F401
    all_vs_all_topk,
    sharded_all_vs_all_topk,
    SearchCheckpoint,
    init_distributed,
)
from swtpu.parallel.longpair import (  # noqa: F401
    longpair_sw_align,
    longpair_sw_score,
)
