from dipper_tpu.dc.pipeline import build_dc_tree

__all__ = ["build_dc_tree"]
