from bert4clickpath_tpu.training.train_state import TrainState  # noqa: F401
from bert4clickpath_tpu.training.trainer import Trainer  # noqa: F401
