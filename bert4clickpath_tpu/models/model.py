"""ClickstreamModel — the user-facing model facade.

TPU-native replacement for the reference ``ClickstreamTransformer``
(clickstream_transformer.py:106-382). Differences by design (SURVEY.md §7):

* Inputs are **integer ids** with static shapes. String->id lookup happens in
  the host pipeline (:mod:`bert4clickpath_tpu.vocab`); the [CLS]/[SEP]
  chaining happens in :mod:`bert4clickpath_tpu.data.chaining` at static
  offsets. Nothing ragged reaches the device.
* ``value_to_head`` routing is a fixed-width ``(B, P)`` gather of positions
  computed by the pipeline, replacing the ragged [MASK]-gather
  (clickstream_transformer.py:260-297) and with it the whole
  per-replica-pad adaptor (source/utils.py:56-113).
* ``segment_to_head`` routing is a static slice (``segment_bounds``): with
  fixed per-segment lengths the SEP positions are compile-time constants, so
  the reference's runtime SEP-scan (clickstream_transformer.py:81-94) is
  gone.
* The TPU-native default head ties the output projection to the item
  embedding table (``tied_softmax``), which the reference never does; the
  reference's MLP softmax head remains available as the parity head.

Multi-variable events are supported exactly as in the reference: each
feature ((action, item) pairs etc.) is embedded separately and the embeddings
are concatenated on the last axis, d_model = sum of dims
(transformer.py:346-390).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from bert4clickpath_tpu.config import ModelConfig
from bert4clickpath_tpu.constants import NUM_RESERVED_TOKENS
from bert4clickpath_tpu.models.encoder import Encoder
from bert4clickpath_tpu.models.heads import BinaryHead, MultiLabelHead, SoftmaxHead
from bert4clickpath_tpu.models.positional import LearnedPositions, sinusoidal_positions
from bert4clickpath_tpu.ops.masking import padding_bias


class ClickstreamModel(nn.Module):
    config: ModelConfig
    attn_impl: str = "xla"  # "xla" | "pallas"
    remat: bool = False
    dropout_impl: str = "xla"  # "xla" | "pallas" (fused in-kernel PRNG)
    # "pallas": fused gather+scale+pos-add kernel (ops/pallas/gather.py) for
    # single-feature models — one HBM write of the (B, L, D) activation
    # instead of three read/write passes
    embed_impl: str = "xla"  # "xla" | "pallas"

    @property
    def _dtype(self):
        return jnp.bfloat16 if self.config.dtype == "bfloat16" else jnp.float32

    def setup(self):
        cfg = self.config
        self.embeds = {
            name: nn.Embed(
                fc.vocab_rows,
                fc.embedding_dim,
                param_dtype=jnp.float32,
                name=f"embed_{name}",
            )
            for name, fc in cfg.features.items()
        }
        embed_sum = sum(fc.embedding_dim for fc in cfg.features.values())
        if cfg.encoder_dim and cfg.encoder_dim != embed_sum:
            # ALBERT-style factorized input (config.encoder_dim)
            self.input_proj = nn.Dense(
                cfg.d_model, dtype=self._dtype, param_dtype=jnp.float32,
                name="input_proj",
            )
        if cfg.positional == "learned":
            self.positions = LearnedPositions(cfg.max_len, cfg.d_model, name="positions")
        if cfg.use_segment_embeddings:
            self.segment_embed = nn.Embed(
                cfg.max_segments,
                cfg.d_model,
                param_dtype=jnp.float32,
                name="segment_embed",
            )
        self.encoder = Encoder(
            num_layers=cfg.num_layers,
            d_model=cfg.d_model,
            num_heads=cfg.num_heads,
            ffn_dim=cfg.ffn_dim,
            dropout_rate=cfg.dropout_rate,
            dtype=self._dtype,
            attn_impl=self.attn_impl,
            remat=self.remat,
            dropout_impl=self.dropout_impl,
            qkv_fused=cfg.qkv_fused,
            norm_style=cfg.norm_style,
            name="encoder",
        )
        head = cfg.head
        if head.kind == "softmax":
            self.head = SoftmaxHead(
                tuple(head.dense_dims), head.output_size, self._dtype, name="head"
            )
        elif head.kind == "binary":
            self.head = BinaryHead(tuple(head.dense_dims), self._dtype, name="head")
        elif head.kind == "multilabel":
            self.head = MultiLabelHead(
                tuple(head.dense_dims), head.output_size, self._dtype, name="head"
            )
        # tied_softmax: optional BERT-MLM-style transform before the tied
        # projection (head.dense_dims -> Dense+gelu stack + LayerNorm);
        # otherwise no parameters of its own — see __call__.
        if head.kind == "tied_softmax":
            if head.dense_dims:
                self.tied_transform = [
                    nn.Dense(
                        dim, dtype=self._dtype, param_dtype=jnp.float32,
                        name=f"tied_transform_{i}",
                    )
                    for i, dim in enumerate(head.dense_dims)
                ]
                self.tied_transform_ln = nn.LayerNorm(
                    epsilon=1e-6, dtype=self._dtype, name="tied_transform_ln"
                )
            d_item = cfg.features[cfg.item_feature].embedding_dim
            width = head.dense_dims[-1] if head.dense_dims else cfg.d_model
            if width != d_item:
                # down/up-project to the item embedding width before tying
                self.tied_proj = nn.Dense(
                    d_item, dtype=self._dtype, param_dtype=jnp.float32,
                    name="tied_proj",
                )
            if head.tied_bias:
                v = head.output_size or (
                    cfg.features[cfg.item_feature].vocab_rows
                    - NUM_RESERVED_TOKENS
                    - 1
                )
                self.tied_out_bias = self.param(
                    "tied_out_bias", nn.initializers.zeros, (v,), jnp.float32
                )

    def encode(
        self, features: dict[str, jnp.ndarray], deterministic: bool = True
    ) -> jnp.ndarray:
        """dict of (B, L) int32 -> (B, L, d_model) contextual embeddings."""
        cfg = self.config
        names = list(cfg.features.keys())
        first = features[names[0]]
        bias = padding_bias(first, jnp.float32)
        seq_len = first.shape[1]
        if cfg.positional == "learned":
            pos = self.positions(seq_len)
        else:
            pos = jnp.asarray(sinusoidal_positions(cfg.max_len, cfg.d_model))[:seq_len]
        tile = None
        # the fused gather kernel emits scale+pos directly in table space;
        # skip it when a factorized input projection sits in between
        if (
            self.embed_impl == "pallas"
            and len(names) == 1
            and not hasattr(self, "input_proj")
        ):
            from bert4clickpath_tpu.ops.pallas.gather import pick_tile

            tile = pick_tile(first.size)
        if tile is not None:
            # Fused gather+scale+pos-add: one kernel, one HBM write of the
            # (B, L, D) activation (vs gather + 2 elementwise passes).
            from bert4clickpath_tpu.ops.pallas.gather import fused_embed_scale_pos

            import math

            embedded = fused_embed_scale_pos(
                self.embeds[names[0]].embedding,
                features[names[0]],
                pos,
                math.sqrt(cfg.d_model),
                self._dtype,
                tile,
            )
        else:
            # Per-feature embed, concat on the embedding axis (multi-variable
            # events; reference transformer.py:384-388).
            embedded = jnp.concatenate(
                [self.embeds[n](features[n]).astype(self._dtype) for n in names],
                axis=-1,
            )
            # ×√(embedding width), BEFORE any factorized up-projection: the
            # reference's ×√d_model (transformer.py:390) normalizes its
            # 1/√d-initialized table to unit scale; applying √d_model after a
            # narrower table + lecun-init projection would enter the encoder
            # √(d_model/d_embed)× too hot (and amplify the table's input-side
            # grads by the same factor vs its tied output-side grads).
            embedded = embedded * jnp.sqrt(
                jnp.asarray(embedded.shape[-1], self._dtype)
            )
            embedded = self.apply_input_proj(embedded)
            embedded = embedded + pos.astype(self._dtype)[None]
        if cfg.use_segment_embeddings:
            # cumulative-SEP markers: [CLS][SEP] s1 [SEP] s2 -> 0 1.. 2..
            from bert4clickpath_tpu.constants import SEP_ID
            from bert4clickpath_tpu.ops.masking import segment_ids

            seg = jnp.clip(segment_ids(first, SEP_ID), 0, cfg.max_segments - 1)
            embedded = embedded + self.segment_embed(seg).astype(self._dtype)
        return self.encoder(embedded, bias, deterministic)

    def apply_input_proj(self, x: jnp.ndarray) -> jnp.ndarray:
        """Factorized-input up-projection (identity unless ``encoder_dim`` is
        set and differs from the concatenated embedding width)."""
        if hasattr(self, "input_proj"):
            return self.input_proj(x.astype(self._dtype))
        return x

    def apply_tied_transform(self, x: jnp.ndarray) -> jnp.ndarray:
        """BERT-MLM-style pre-projection for the tied head: Dense+gelu per
        configured dim then LayerNorm (identity when dense_dims is empty),
        plus the width-matching projection to the item embedding dim. Output
        is ready for ``x @ E^T``."""
        cfg = self.config
        if cfg.head.kind != "tied_softmax":
            return x
        if cfg.head.dense_dims:
            x = x.astype(self._dtype)
            for layer in self.tied_transform:
                x = nn.gelu(layer(x))
            x = self.tied_transform_ln(x)
        if hasattr(self, "tied_proj"):
            x = self.tied_proj(x.astype(self._dtype))
        return x

    def _route(
        self, h: jnp.ndarray, head_positions: Optional[jnp.ndarray]
    ) -> jnp.ndarray:
        """Gather the head's input positions from the encoder output."""
        cfg = self.config
        if cfg.routing == "mask":
            if head_positions is None:
                raise ValueError("routing='mask' requires head_positions")
            return jnp.take_along_axis(
                h, head_positions[..., None].astype(jnp.int32), axis=1
            )
        start, end = cfg.segment_bounds
        return h[:, start:end]

    def gather_head_inputs(
        self,
        features: dict[str, jnp.ndarray],
        head_positions: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Encode, gather the routed positions, and (for tied heads) apply
        the pre-projection transform — everything EXCEPT the final catalog
        projection.

        (B, P, d_head) f32 — the input the fused Pallas tied-projection CE
        kernel consumes (ops/pallas/fused_ce.py), so the (B, P, V) logits
        never materialize. Use via ``model.apply(..., method='gather_head_inputs')``.
        """
        h = self.encode(features, deterministic)
        gathered = self._route(h, head_positions)
        return self.apply_tied_transform(gathered).astype(jnp.float32)

    def head_trunk_outputs(
        self,
        features: dict[str, jnp.ndarray],
        head_positions: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Encode, gather, and run the softmax head's MLP trunk — every
        layer EXCEPT the final ``Dense(V)`` catalog projection.

        (B, P, d_trunk) f32 — the fused-CE input for the ``softmax``
        (reference parity MLP) head; the counterpart of
        ``gather_head_inputs`` for tied heads. The final projection's
        kernel/bias feed ``fused_softmax_ce_bias`` directly, so the
        (B, P, V) logits never materialize.
        """
        if self.config.head.kind != "softmax":
            raise ValueError("head_trunk_outputs requires head kind 'softmax'")
        h = self.encode(features, deterministic)
        gathered = self._route(h, head_positions)
        return self.head.trunk(gathered).astype(jnp.float32)

    def __call__(
        self,
        features: dict[str, jnp.ndarray],
        head_positions: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Forward to head logits.

        features: {name: (B, L) int32 model-space ids}
        head_positions: (B, P) int32 token indices for routing='mask'
            (positions of [MASK] tokens, 0-padded; pad rows are ignored
            downstream because their labels are LABEL_PAD).
        Returns (B, P, V) logits for softmax heads, (B, P) for binary.
        """
        cfg = self.config
        h = self.encode(features, deterministic)
        gathered = self._route(h, head_positions)  # (B, P, d_model)
        if cfg.head.kind == "tied_softmax":
            return self._tied_logits(gathered)
        return self.head(gathered)

    def _tied_logits(self, x: jnp.ndarray) -> jnp.ndarray:
        """Tied-weight output projection over the raw-vocab rows.

        logits = x @ E_items[10:10+V]^T, sharing the item embedding table
        (BASELINE.json north star; enables vocab-sharded CE under the model
        mesh axis).

        V comes from ``head.output_size`` when set — required whenever the
        table rows were padded (padded_vocab_rows), otherwise untrained
        OOV/padding rows would be rankable. The fallback (rows - reserved -
        1 OOV) is only right for unpadded tables.
        """
        cfg = self.config
        x = self.apply_tied_transform(x)
        table = self.embeds[cfg.item_feature].embedding  # (rows, D_item)
        v = cfg.head.output_size or (table.shape[0] - NUM_RESERVED_TOKENS - 1)
        weights = table[NUM_RESERVED_TOKENS : NUM_RESERVED_TOKENS + v]
        logits = jnp.einsum(
            "bpd,vd->bpv",
            x,
            weights.astype(self._dtype),
            preferred_element_type=jnp.float32,
        )
        if cfg.head.tied_bias:
            logits = logits + self.tied_out_bias
        return logits


def tied_bias_model_space(bias: jnp.ndarray, rows: int) -> jnp.ndarray:
    """(rows,) model-space bias: the (V_label,) ``tied_out_bias`` placed at
    the reserved-token offset; reserved/OOV/padding rows stay 0 (those rows
    are blinded by every consumer anyway)."""
    return jax.lax.dynamic_update_slice(
        jnp.zeros((rows,), bias.dtype), bias, (NUM_RESERVED_TOKENS,)
    )


def head_catalog(config: ModelConfig, params, pad_rows: bool = False):
    """The catalog a softmax-family head ranks: (table, bias, row_offset,
    base_rows).

    tied_softmax: the (rows, D_item) item embedding table with
    ``tied_out_bias`` (if any) spread via :func:`tied_bias_model_space`;
    row_offset = NUM_RESERVED_TOKENS. softmax (the reference's MLP head):
    the final Dense(V) kernel transposed to (V, d_trunk) rows + its bias,
    row_offset 0 — always padded to the fused-CE/chunked-eval tile
    (``ops.pallas.fused_ce.padded_rows``). ``pad_rows=True`` pads a tied
    table too (serving can't assume the training driver pre-padded
    vocab_rows). ``base_rows`` is the pre-padding row count, for deriving
    num_valid.

    Shared by the fused-CE train loss, the chunked eval step, and serving —
    one place owns the params-tree paths and the padding arithmetic.
    """
    from bert4clickpath_tpu.ops.pallas.fused_ce import padded_rows

    p = params["params"] if "params" in params else params
    kind = config.head.kind
    if kind == "tied_softmax":
        table = p[f"embed_{config.item_feature}"]["embedding"]
        base_rows = table.shape[0]
        bias = (
            tied_bias_model_space(p["tied_out_bias"], base_rows)
            if config.head.tied_bias
            else None
        )
        if pad_rows:
            pad = padded_rows(base_rows) - base_rows
            if pad:
                table = jnp.pad(table, ((0, pad), (0, 0)))
                bias = None if bias is None else jnp.pad(bias, (0, pad))
        return table, bias, NUM_RESERVED_TOKENS, base_rows
    if kind == "softmax":
        wk = p["head"]["out"]["kernel"]  # (d_trunk, V)
        bk = p["head"]["out"]["bias"]  # (V,)
        v = wk.shape[1]
        pad = padded_rows(v) - v
        return jnp.pad(wk.T, ((0, pad), (0, 0))), jnp.pad(bk, (0, pad)), 0, v
    raise ValueError(f"softmax-family head required, got {kind!r}")
