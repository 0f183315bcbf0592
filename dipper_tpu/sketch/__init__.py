from dipper_tpu.sketch.minhash import sketch_sequences, sketch_batch_device

__all__ = ["sketch_sequences", "sketch_batch_device"]
