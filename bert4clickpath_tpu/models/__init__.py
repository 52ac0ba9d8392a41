from bert4clickpath_tpu.models.model import ClickstreamModel  # noqa: F401
