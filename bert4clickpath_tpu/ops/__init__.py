from bert4clickpath_tpu.ops import losses, masking, metrics  # noqa: F401
