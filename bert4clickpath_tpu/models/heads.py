"""Pluggable task heads.

Position-wise heads mounted on gathered encoder outputs (reference
head.py:4-69, injected at clickstream_transformer.py:164 and called at :343).
All heads return **logits** — softmax/sigmoid folds into losses and top-k
(the reference emitted probabilities, head.py:21,45,65; fixed here).

The tied-weight softmax head lives in
:mod:`bert4clickpath_tpu.models.model` because it shares the item embedding
table.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class _MLP(nn.Module):
    dense_dims: tuple[int, ...]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # Dense acts on the last axis only, so padded positions never
        # interact with real ones (reference head.py:15-19).
        for i, dim in enumerate(self.dense_dims):
            x = nn.Dense(dim, dtype=self.dtype, param_dtype=jnp.float32, name=f"dense_{i}")(x)
            x = nn.relu(x)
        return x


class SoftmaxHead(nn.Module):
    """MLP -> V logits per position (reference SoftMaxHead, head.py:29-47).

    The "parity head": reference BERT4Rec uses dims [1024, 512, 256, 128]
    into the full catalog (source/main.py:262-263).

    ``trunk`` exposes everything up to (but excluding) the final ``out``
    projection, so training can stream ``out`` through the fused Pallas CE
    kernel (ops/pallas/fused_ce.fused_softmax_ce_bias) instead of
    materializing the (B, P, V) logits.
    """

    dense_dims: tuple[int, ...]
    output_size: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.mlp = _MLP(self.dense_dims, self.dtype)
        self.out = nn.Dense(
            self.output_size, dtype=self.dtype, param_dtype=jnp.float32
        )

    def trunk(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.mlp(x)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.out(self.mlp(x))


class BinaryHead(nn.Module):
    """MLP -> scalar logit per position, squeezed (reference head.py:4-26)."""

    dense_dims: tuple[int, ...]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = _MLP(self.dense_dims, self.dtype, name="mlp")(x)
        logits = nn.Dense(1, dtype=self.dtype, param_dtype=jnp.float32, name="out")(x)
        return jnp.squeeze(logits, axis=-1)


class MultiLabelHead(nn.Module):
    """MLP -> C independent logits (reference
    MultiLabel_MultiClass_classification, head.py:50-69; its squeeze(axis=1)
    collapsed the single-position axis — here the caller gathers P=1
    positions and we squeeze the same axis)."""

    dense_dims: tuple[int, ...]
    output_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = _MLP(self.dense_dims, self.dtype, name="mlp")(x)
        logits = nn.Dense(
            self.output_size, dtype=self.dtype, param_dtype=jnp.float32, name="out"
        )(x)
        if logits.ndim == 3 and logits.shape[1] == 1:
            logits = jnp.squeeze(logits, axis=1)
        return logits
