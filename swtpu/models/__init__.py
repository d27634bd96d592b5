from swtpu.models.assembly import assemble_greedy, make_reads  # noqa: F401
from swtpu.models.msa import (  # noqa: F401
    msa_center_star,
    msa_rows_to_strings,
    sp_score,
)
