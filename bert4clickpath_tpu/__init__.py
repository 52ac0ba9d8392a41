"""bert4clickpath_tpu — a TPU-native sequential-recommendation framework.

A from-scratch JAX/XLA/pjit/Pallas rebuild of the capabilities of
MiladShahidi/BERT4ClickPath (see SURVEY.md): bidirectional Transformer over
clickstream sequences, Cloze/masked-item training, multi-variable events,
pluggable task heads, masked losses/metrics, recall@k / NDCG@k eval,
data/model-parallel execution over a jax.sharding.Mesh with row-sharded
embedding tables, and Pallas kernels on the hot paths.
"""

__version__ = "0.1.0"

from bert4clickpath_tpu.config import (  # noqa: F401
    FeatureConfig,
    HeadConfig,
    MeshConfig,
    ModelConfig,
    TrainConfig,
)
from bert4clickpath_tpu.models.model import ClickstreamModel  # noqa: F401
from bert4clickpath_tpu.vocab import Vocabulary  # noqa: F401
