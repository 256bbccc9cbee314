from .bilevel import SearchState, cosine_iter_schedule, make_arch_tx, make_search_steps, make_weight_tx
from .cells import SearchCell, num_edges, s0_edge_indices
from .decode import decode_arch, genotype_decode, normalize_betas_np, save_decoded, viterbi_decode
from .supernet import (
    AutoStereoSupernet,
    FeatureSupernet,
    MatchingSupernet,
    SupernetConfig,
    arch_label_tree,
    normalize_betas,
)

__all__ = [
    "SearchState",
    "cosine_iter_schedule",
    "make_arch_tx",
    "make_search_steps",
    "make_weight_tx",
    "SearchCell",
    "num_edges",
    "s0_edge_indices",
    "decode_arch",
    "genotype_decode",
    "normalize_betas_np",
    "save_decoded",
    "viterbi_decode",
    "AutoStereoSupernet",
    "FeatureSupernet",
    "MatchingSupernet",
    "SupernetConfig",
    "arch_label_tree",
    "normalize_betas",
]
