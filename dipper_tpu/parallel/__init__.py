from dipper_tpu.parallel.sharded import (
    make_mesh,
    sharded_placement_build,
    sharded_mash_matrix,
)

__all__ = ["make_mesh", "sharded_placement_build", "sharded_mash_matrix"]
