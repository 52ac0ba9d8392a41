"""Position encodings.

* Sinusoidal (reference transformer.py:44-61, Vaswani et al.) — computed once
  as a constant; identical formula (even dims sin, odd dims cos, base 10000).
* Learned (the BERT4Rec paper's choice; the reference left it as a ToDo at
  transformer.py:397) — an ``nn.Embed`` over positions.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import linen as nn


def sinusoidal_positions(max_len: int, d_model: int) -> np.ndarray:
    """(max_len, d_model) float32 sinusoidal table."""
    pos = np.arange(max_len, dtype=np.float32)[:, None]
    i = np.arange(d_model, dtype=np.float32)[None, :]
    angle_rates = 1.0 / np.power(10000.0, (2.0 * (i // 2)) / np.float32(d_model))
    angles = pos * angle_rates
    table = np.zeros((max_len, d_model), dtype=np.float32)
    table[:, 0::2] = np.sin(angles[:, 0::2])
    table[:, 1::2] = np.cos(angles[:, 1::2])
    return table


class LearnedPositions(nn.Module):
    max_len: int
    d_model: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, seq_len: int) -> jnp.ndarray:
        table = self.param(
            "embedding",
            nn.initializers.normal(stddev=0.02),
            (self.max_len, self.d_model),
            self.param_dtype,
        )
        return table[:seq_len]
