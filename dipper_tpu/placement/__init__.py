from dipper_tpu.placement.api import (
    build_placement_tree_from_matrix,
    build_placement_tree_from_seqs,
    add_queries_to_backbone,
)

__all__ = [
    "build_placement_tree_from_matrix",
    "build_placement_tree_from_seqs",
    "add_queries_to_backbone",
]
