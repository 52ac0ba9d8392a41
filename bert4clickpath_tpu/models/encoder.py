"""Bidirectional (encoder-only) Transformer stack.

Same semantics as the reference encoder (transformer.py:100-268): post-LN
residual blocks, ReLU feed-forward, padding-masked bidirectional attention,
LayerNorm eps 1e-6, dropout on attention output / ffn output / encoder input.

TPU-native design choices:

* Attention is one fused ``einsum`` path under jit (single (B,H,L,L) score
  tensor, bf16 matmuls on the MXU with f32 softmax), with an optional Pallas
  flash-attention kernel behind the same signature
  (:mod:`bert4clickpath_tpu.ops.pallas.attention`), selected by
  ``attn_impl``.
* ``remat`` wraps each layer in ``jax.checkpoint`` to trade FLOPs for HBM on
  deep configs.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def scaled_dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """(B, H, L, Dh) q/k/v + (B, 1, 1, L) additive bias -> (B, H, L, Dh).

    Softmax accumulates in f32 regardless of compute dtype (reference
    transformer.py:64-97 was pure f32).
    """
    depth = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores / jnp.sqrt(jnp.float32(depth))
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    weights = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v)


def attention_per_head(
    qf: jnp.ndarray,
    kf: jnp.ndarray,
    vf: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    num_heads: int,
) -> jnp.ndarray:
    """Masked MHA over the flat (B, L, D) projections, one head at a time.

    Heads are lane sub-ranges of D; each head's attention is a pair of 3-D
    einsums over contiguous slices. No (B, L, H, Dh) tensor ever exists, so
    XLA's layout assignment has nothing to transpose — the 4-D head-major
    formulations (either operand order) cost ~1.2 ms/step in layout copies
    at the flagship shape (device traces, KERNELS.md round 2).
    """
    d = qf.shape[-1]
    dh = d // num_heads
    b2 = None if bias is None else bias[:, 0, 0][:, None, :].astype(jnp.float32)
    outs = []
    for h in range(num_heads):
        sl = slice(h * dh, (h + 1) * dh)
        s = jnp.einsum(
            "bqd,bkd->bqk", qf[..., sl], kf[..., sl],
            preferred_element_type=jnp.float32,
        ) / jnp.sqrt(jnp.float32(dh))
        if b2 is not None:
            s = s + b2
        p = jax.nn.softmax(s, axis=-1).astype(qf.dtype)
        outs.append(jnp.einsum("bqk,bkd->bqd", p, vf[..., sl]))
    return jnp.concatenate(outs, axis=-1)


def attention_blhd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """Same math in (B, L, H, Dh) layout — heads stay where the reshape from
    (B, L, D) put them, so XLA never materializes a (B, H, L, Dh) transpose.
    The explicit-transpose formulation cost ~1.1 ms/step in layout copies at
    the flagship shape (device trace, KERNELS.md round 2)."""
    depth = q.shape[-1]
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores / jnp.sqrt(jnp.float32(depth))
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    weights = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v)


# attn_impl="auto" switches to the Pallas kernels at this sequence length.
# Device-measured speedups vs the xla per-head path (KERNELS.md round 4,
# 1x v5e, 4L/256d bf16 train step): 0.85x at L=53, 0.88x at 128, then wins
# everywhere above — 1.06x at 256, 1.46x at 512 (whole-row fused MHA),
# 1.21x at 768, 1.48x at 1024, 3.47x at 4096 (blockwise (B, L, D) kernel,
# which replaced the head-major flash grid that used to LOSE this regime).
FLASH_ATTN_MIN_LEN = 256


class MultiHeadAttention(nn.Module):
    d_model: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"  # "xla" | "pallas" | "auto" (length-switched)
    # single (D, 3D) projection instead of three (D, D) ones — better MXU
    # fill at narrow d_model; param tree changes (wqkv), see ModelConfig
    qkv_fused: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, bias: Optional[jnp.ndarray]) -> jnp.ndarray:
        assert self.d_model % self.num_heads == 0
        depth = self.d_model // self.num_heads
        dense = lambda name: nn.Dense(  # noqa: E731
            self.d_model, dtype=self.dtype, param_dtype=jnp.float32, name=name
        )
        b, l, _ = x.shape
        impl = self.attn_impl
        if impl == "auto":
            # measured crossover (FLASH_ATTN_MIN_LEN note): xla below,
            # pallas (whole-row or blockwise, both win) above
            impl = "pallas" if l >= FLASH_ATTN_MIN_LEN else "xla"
        if self.qkv_fused:
            qkv = nn.Dense(
                3 * self.d_model, dtype=self.dtype, param_dtype=jnp.float32,
                name="wqkv",
            )(x)
            d = self.d_model
            qf, kf, vf = qkv[..., :d], qkv[..., d : 2 * d], qkv[..., 2 * d :]
        else:
            qf, kf, vf = dense("wq")(x), dense("wk")(x), dense("wv")(x)  # (B, L, D)
        if impl == "pallas":
            from bert4clickpath_tpu.ops.pallas.attention import (
                blockwise_mha,
                fused_mha,
                fused_mha_supported,
            )

            if fused_mha_supported(
                l, self.d_model, self.num_heads,
                itemsize=jnp.dtype(self.dtype).itemsize,
            ):
                # short-L path: heads never leave the (B, L, D) layout
                return dense("wo")(fused_mha(qf, kf, vf, bias, self.num_heads))
            # long-L path: same heads-in-lanes layout, k/v streamed
            # blockwise (the head-major flash kernel lost to XLA at every
            # measured L — KERNELS.md round 4)
            return dense("wo")(blockwise_mha(qf, kf, vf, bias, self.num_heads))
        elif impl == "xla_4d":
            # reference-shaped head-major path, kept for comparison
            split = lambda t: t.reshape(b, l, self.num_heads, depth)  # noqa: E731
            attn = attention_blhd(split(qf), split(kf), split(vf), bias).reshape(
                b, l, self.d_model
            )
            return dense("wo")(attn)
        else:
            attn = attention_per_head(qf, kf, vf, bias, self.num_heads)
        attn = attn.reshape(b, l, self.d_model)
        return dense("wo")(attn)


def apply_dropout(mod: nn.Module, x, rate: float, deterministic: bool, impl: str):
    """Dropout with selectable backend: 'xla' (flax) or 'pallas' (fused
    in-kernel PRNG, no materialized masks — ops/pallas/dropout.py)."""
    if deterministic or rate == 0.0:
        return x
    if impl == "pallas":
        from bert4clickpath_tpu.ops.pallas.dropout import fused_dropout

        seed = jax.random.randint(
            mod.make_rng("dropout"), (), 0, 2**31 - 1, dtype=jnp.int32
        )
        return fused_dropout(x, seed, rate)
    return nn.Dropout(rate)(x, deterministic=False)


class EncoderLayer(nn.Module):
    d_model: int
    num_heads: int
    ffn_dim: int
    dropout_rate: float
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    dropout_impl: str = "xla"
    qkv_fused: bool = False
    # "post" = reference residual order (transformer.py:202-213). "pre"
    # normalizes the sublayer INPUT and keeps the residual stream un-normed
    # (GPT-2/T5 style) — the standard fix for post-LN's depth instability:
    # BASELINE.md round 4 measured 6L post-LN collapsing (~-45% NDCG) under
    # every LR tried, the known post-LN gradient-amplification failure.
    # Param tree is identical (ln1/ln2 reused) except the stack's ln_final.
    norm_style: str = "post"

    @nn.compact
    def __call__(self, x: jnp.ndarray, bias, deterministic: bool) -> jnp.ndarray:
        ln = lambda name: nn.LayerNorm(  # noqa: E731
            epsilon=1e-6, dtype=self.dtype, name=name
        )
        mha = MultiHeadAttention(
            self.d_model, self.num_heads, self.dtype, self.attn_impl,
            self.qkv_fused, name="mha",
        )
        ffn1 = nn.Dense(
            self.ffn_dim, dtype=self.dtype, param_dtype=jnp.float32, name="ffn1"
        )
        ffn2 = nn.Dense(
            self.d_model, dtype=self.dtype, param_dtype=jnp.float32, name="ffn2"
        )
        drop = lambda t: apply_dropout(  # noqa: E731
            self, t, self.dropout_rate, deterministic, self.dropout_impl
        )
        if self.norm_style == "pre":
            x = x + drop(mha(ln("ln1")(x), bias))
            return x + drop(ffn2(nn.relu(ffn1(ln("ln2")(x)))))
        # Post-LN residual, eps 1e-6 (reference transformer.py:183-184,202-213)
        x = ln("ln1")(x + drop(mha(x, bias)))
        return ln("ln2")(x + drop(ffn2(nn.relu(ffn1(x)))))


class Encoder(nn.Module):
    num_layers: int
    d_model: int
    num_heads: int
    ffn_dim: int
    dropout_rate: float
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    remat: bool = False
    dropout_impl: str = "xla"
    qkv_fused: bool = False
    norm_style: str = "post"  # see EncoderLayer.norm_style

    @nn.compact
    def __call__(self, x: jnp.ndarray, bias, deterministic: bool) -> jnp.ndarray:
        x = apply_dropout(self, x, self.dropout_rate, deterministic, self.dropout_impl)
        layer_cls = EncoderLayer
        if self.remat:
            layer_cls = nn.remat(EncoderLayer, static_argnums=(3,))
        for i in range(self.num_layers):
            x = layer_cls(
                self.d_model,
                self.num_heads,
                self.ffn_dim,
                self.dropout_rate,
                self.dtype,
                self.attn_impl,
                self.dropout_impl,
                self.qkv_fused,
                self.norm_style,
                name=f"layer_{i}",
            )(x, bias, deterministic)
        if self.norm_style == "pre":
            # pre-LN leaves the residual stream un-normalized; one final LN
            # feeds the head the same normalized scale post-LN produced
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ln_final")(x)
        return x
