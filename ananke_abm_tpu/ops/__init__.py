"""Compute ops: CRF recursions, graph/segment ops, Pallas kernels."""
from ananke_abm_tpu.ops.crf import (
    crf_log_partition,
    crf_marginals,
    crf_nll,
    crf_path_score,
    viterbi_decode,
    viterbi_decode_no_all_home,
)

__all__ = [
    "crf_log_partition",
    "crf_marginals",
    "crf_nll",
    "crf_path_score",
    "viterbi_decode",
    "viterbi_decode_no_all_home",
]
