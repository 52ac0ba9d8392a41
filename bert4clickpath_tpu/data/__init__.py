from bert4clickpath_tpu.data.cloze import ClozeBatch  # noqa: F401
from bert4clickpath_tpu.data.pipeline import ClozeDataset  # noqa: F401
