"""Explicit-SPMD train/eval steps over a (data, model) mesh via shard_map.

The multi-chip execution tier (SURVEY.md §2.2). Everything the reference
delegated to MirroredStrategy's hidden NCCL all-reduce (source/main.py:52)
is explicit here, expressed as XLA collectives:

* batch shards over ``data``; grads pmean over ``data``;
* the item embedding table row-shards over ``model``; lookups psum over
  ``model`` (parallel/embedding.py); the tied output projection never
  materializes full logits (vocab-parallel CE);
* loss/metric normalization is global by construction.

The optimizer update runs inside the same shard_map: Adam is elementwise, so
each device updates exactly the rows it owns — optimizer state shards with
the parameters (ZeRO-for-free on the big table).

Dropout: the PRNG key is folded with the ``data`` coordinate only, so model
shards (which redundantly compute the same replicated encoder) stay bitwise
identical while data shards decorrelate.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bert4clickpath_tpu.config import ModelConfig
from bert4clickpath_tpu.constants import NUM_RESERVED_TOKENS
from bert4clickpath_tpu.models.encoder import Encoder
from bert4clickpath_tpu.models.positional import sinusoidal_positions
from bert4clickpath_tpu.ops.masking import padding_bias
from bert4clickpath_tpu.parallel import embedding as emb_ops
from bert4clickpath_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
from bert4clickpath_tpu.training.train_state import TrainState


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def padded_vocab_rows(vocab_rows: int, model_shards: int, kernel_tile: int = 1024) -> int:
    """Table rows padded so (a) the row-shard divides evenly over the model
    axis and (b) each shard is a multiple of the fused-CE kernel's vocab
    tile (ops/pallas/fused_ce.py); extra rows are blinded in the projection
    (embedding.sharded_logits_local)."""
    per_shard = round_up(-(-vocab_rows // model_shards), kernel_tile)
    return per_shard * model_shards


def _is_sharded_table(path_keys, config: ModelConfig) -> bool:
    names = [getattr(k, "key", getattr(k, "name", str(k))) for k in path_keys]
    return f"embed_{config.item_feature}" in names and "embedding" in names


def param_specs(params, config: ModelConfig):
    """PartitionSpec tree: item table P(model, None); all else replicated."""

    def spec(path, leaf):
        if _is_sharded_table(path, config):
            return P(MODEL_AXIS, None)
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def state_specs(state: TrainState, config: ModelConfig):
    """Specs for the full TrainState: opt_state mirrors params (mu/nu shard
    with their rows); scalars replicated."""
    p_spec = param_specs(state.params, config)

    def opt_spec(path, leaf):
        if _is_sharded_table(path, config) and leaf.ndim >= 2:
            return P(MODEL_AXIS, None)
        return P()

    o_spec = jax.tree_util.tree_map_with_path(opt_spec, state.opt_state)
    return TrainState(step=P(), params=p_spec, opt_state=o_spec, lr_scale=P())


def batch_specs(config: ModelConfig):
    return {
        "features": {n: P(DATA_AXIS, None) for n in config.features},
        "head_positions": P(DATA_AXIS, None),
        "labels": P(DATA_AXIS, None),
    }


def shard_state(state: TrainState, mesh: Mesh, config: ModelConfig) -> TrainState:
    specs = state_specs(state, config)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), state, specs
    )


def shard_batch(batch: dict, mesh: Mesh, config: ModelConfig) -> dict:
    specs = batch_specs(config)
    return jax.tree.map(
        lambda x, s: jax.device_put(jnp.asarray(x), NamedSharding(mesh, s)),
        batch,
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def _check_spmd_supported(config: ModelConfig) -> None:
    """Features the SPMD forward doesn't wire yet must fail loudly, not
    silently train/eval without them."""
    assert config.head.kind == "tied_softmax", "SPMD step uses the tied head"
    assert not config.head.dense_dims, (
        "tied-head transform (head.dense_dims) is not wired into the SPMD "
        "forward yet — use the single-chip step or an empty transform"
    )
    assert not config.use_segment_embeddings, (
        "segment embeddings are not wired into the SPMD forward yet — they "
        "would train to zero gradient and serve as random noise"
    )


def _encoder_module(config: ModelConfig, remat: bool = False) -> Encoder:
    dtype = jnp.bfloat16 if config.dtype == "bfloat16" else jnp.float32
    return Encoder(
        num_layers=config.num_layers,
        d_model=config.d_model,
        num_heads=config.num_heads,
        ffn_dim=config.ffn_dim,
        dropout_rate=config.dropout_rate,
        dtype=dtype,
        remat=remat,
    )


def _forward_gathered(
    config: ModelConfig,
    encoder: Encoder,
    params: dict,
    features: dict,
    head_positions: jnp.ndarray,
    rng,
    deterministic: bool,
):
    """Shared forward to gathered head inputs, inside shard_map.

    Returns (gathered (B, P, d_model), item table shard). The item feature's
    table is row-sharded; any additional features use replicated tables.
    """
    dtype = jnp.bfloat16 if config.dtype == "bfloat16" else jnp.float32
    names = list(config.features.keys())
    first_tokens = features[names[0]]
    table_shard = params[f"embed_{config.item_feature}"]["embedding"]
    parts = []
    for n in names:
        if n == config.item_feature:
            e = emb_ops.sharded_embedding_lookup(
                table_shard, features[n], MODEL_AXIS, compute_dtype=dtype
            )
        else:
            e = jnp.take(
                params[f"embed_{n}"]["embedding"].astype(dtype), features[n], axis=0
            )
        parts.append(e)
    x = jnp.concatenate(parts, axis=-1) * jnp.sqrt(jnp.asarray(config.d_model, dtype))
    if config.positional == "learned":
        pos = params["positions"]["embedding"]
    else:
        pos = jnp.asarray(sinusoidal_positions(config.max_len, config.d_model))
    x = x + pos[: first_tokens.shape[1]].astype(dtype)[None]
    bias = padding_bias(first_tokens)
    rngs = None if deterministic else {"dropout": rng}
    h = encoder.apply(
        {"params": params["encoder"]}, x, bias, deterministic, rngs=rngs
    )
    gathered = jnp.take_along_axis(
        h, head_positions[..., None].astype(jnp.int32), axis=1
    )
    return gathered.astype(jnp.float32), table_shard


def make_spmd_train_step(
    config: ModelConfig,
    mesh: Mesh,
    tx: optax.GradientTransformation,
    schedule: Callable,
    label_vocab_size: int,
    remat: bool = False,
):
    """Jitted sharded train step: (state, batch, rng) -> (state, loss).

    Requires head kind 'tied_softmax' and a single (item) sharded feature for
    the projection (the flagship large-catalog config).
    """
    _check_spmd_supported(config)
    encoder = _encoder_module(config, remat)

    def step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))

        def loss_fn(params):
            gathered, table_shard = _forward_gathered(
                config,
                encoder,
                params,
                batch["features"],
                batch["head_positions"],
                rng,
                deterministic=False,
            )
            if gathered.shape[-1] != table_shard.shape[-1]:
                raise ValueError(
                    "tied SPMD head requires d_model == item embedding dim"
                )
            # Pallas fused vocab-parallel CE with a hand-written VJP — the
            # only grad-safe CE inside shard_map (see parallel/embedding.py).
            from bert4clickpath_tpu.ops.pallas.fused_ce import (
                sharded_fused_softmax_ce,
            )

            return sharded_fused_softmax_ce(
                gathered,
                table_shard,
                batch["labels"],
                NUM_RESERVED_TOKENS,
                label_vocab_size,
                MODEL_AXIS,
                DATA_AXIS,
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        # The loss is already the GLOBAL mean (psum(sum)/psum(count)), so each
        # data shard's grad is only its batch's share of the full gradient —
        # psum (not pmean) reassembles d(global loss)/d(params).
        grads = jax.lax.psum(grads, DATA_AXIS)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        lr = schedule(state.step) * state.lr_scale
        updates = jax.tree.map(lambda u: u * lr, updates)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state
        )
        return new_state, loss

    def sharded(state, batch, rng):
        s_specs = state_specs(state, config)
        return jax.shard_map(
            step,
            mesh=mesh,
            in_specs=(s_specs, batch_specs(config), P()),
            out_specs=(s_specs, P()),
            check_vma=False,
        )(state, batch, rng)

    return jax.jit(sharded, donate_argnums=(0,))


def make_spmd_eval_step(
    config: ModelConfig,
    mesh: Mesh,
    label_vocab_size: int,
    ks=(5, 10),
):
    """Jitted sharded eval step: (params, batch) -> stats sums dict."""
    _check_spmd_supported(config)
    encoder = _encoder_module(config)

    def step(params, batch):
        gathered, table_shard = _forward_gathered(
            config,
            encoder,
            params,
            batch["features"],
            batch["head_positions"],
            None,
            deterministic=True,
        )
        # chunked per-shard scan: eval never materializes (B, P, V_local)
        # logits either, so 10M-row shards evaluate fine
        return emb_ops.sharded_chunked_eval_stats(
            gathered,
            table_shard,
            batch["labels"],
            ks=ks,
            model_axis=MODEL_AXIS,
            data_axis=DATA_AXIS,
            row_offset=NUM_RESERVED_TOKENS,
            num_valid=label_vocab_size,
        )

    def sharded(params, batch):
        p_specs = param_specs(params, config)
        return jax.shard_map(
            step,
            mesh=mesh,
            in_specs=(p_specs, batch_specs(config)),
            out_specs=_stats_specs(ks),
            check_vma=False,
        )(params, batch)

    return jax.jit(sharded)


def _stats_specs(ks):
    keys = ["n", "loss_sum"]
    for k in ks:
        keys += [f"recall@{k}_sum", f"ndcg@{k}_sum"]
    return {k: P() for k in keys}
