from dipper_tpu.nj.engine import neighbor_joining_device, nj_tree_newick

__all__ = ["neighbor_joining_device", "nj_tree_newick"]
