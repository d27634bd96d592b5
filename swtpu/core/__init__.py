from swtpu.core.scoring import ScoringParams, DNA_111, dna_matrix  # noqa: F401
from swtpu.core.encode import pack_2bit, unpack_2bit, random_dna, mutate  # noqa: F401
from swtpu.core.cigar import path_to_cigar, cigar_stats  # noqa: F401
