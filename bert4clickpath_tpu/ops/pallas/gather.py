"""Fused embedding gather (Pallas TPU): table rows -> scaled, position-added
activations in one pass.

The third north-star kernel (BASELINE.json): for each token,
``out[b, l, :] = table[ids[b, l], :] * sqrt(d_model) + pos[l, :]``.
The XLA path is a gather + two elementwise passes over the (B, L, D)
activation; here the row ids are scalar-prefetched so each grid step DMAs
exactly the rows it needs from the HBM-resident table into VMEM (double
buffered), applies the scale and positional add on the VPU, and writes the
fused result — one HBM write of the activation instead of three
read/writes, and no logical-size gather intermediate.

Gradient note: this kernel is forward-only by design — embedding-gather
backward is a scatter-add into the (possibly sharded) table, already handled
by the custom VJPs in parallel/embedding.py; wrap with
:func:`fused_embed_scale_pos` (custom_vjp, scatter-add backward) for a
differentiable drop-in.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


WINDOW = 8  # DMA slices must be sublane(8)-aligned on TPU


def _gather_kernel(ids_ref, pos_ref, table_ref, out_ref, row_buf, sem, *, tile, scale):
    """grid: (n_tiles,) over flattened (B*L). ids are scalar-prefetched; the
    table stays in HBM/ANY. Each token DMAs the 8-aligned window containing
    its row (double buffered), selects the row with a masked reduce, and the
    tile accumulates in a loop carry written once at the end."""
    t = pl.program_id(0)
    d = out_ref.shape[-1]

    def get_dma(slot, k):
        row = ids_ref[t * tile + k]
        start = pl.multiple_of((row // WINDOW) * WINDOW, WINDOW)
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(start, WINDOW)], row_buf.at[slot], sem.at[slot]
        )

    get_dma(0, 0).start()

    def body(k, acc):
        slot = k % 2

        @pl.when(k + 1 < tile)
        def _():
            get_dma((k + 1) % 2, k + 1).start()

        get_dma(slot, k).wait()
        row = ids_ref[t * tile + k]
        # select the row from the 8-row window with a masked reduce
        sel = (
            jax.lax.broadcasted_iota(jnp.int32, (WINDOW, 1), 0) == row % WINDOW
        ).astype(jnp.float32)
        rowvec = jnp.sum(row_buf[slot].astype(jnp.float32) * sel, axis=0)  # (d,)
        keep = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0) == k
        return jnp.where(keep, rowvec[None, :], acc)

    acc = jax.lax.fori_loop(
        0, tile, body, jnp.zeros((tile, d), jnp.float32), unroll=False
    )
    out_ref[:] = (acc * scale + pos_ref[:].astype(jnp.float32)).astype(out_ref.dtype)


def pick_tile(n: int) -> int | None:
    """Largest supported row tile dividing the flattened token count, or
    None when the shape can't tile (caller falls back to the XLA path)."""
    for t in (256, 128, 64, 32, 16, 8):
        if n % t == 0:
            return t
    return None


def fused_gather_scale_pos(
    table: jnp.ndarray,  # (V, D)
    ids: jnp.ndarray,  # (B, L) int32 row ids
    pos: jnp.ndarray,  # (L, D) positional table slice
    scale: float,
    out_dtype=jnp.bfloat16,
    tile: int = 64,
) -> jnp.ndarray:
    """Forward fused gather: (B, L, D) = table[ids] * scale + pos."""
    b, l = ids.shape
    v, d = table.shape
    n = b * l
    assert n % tile == 0, f"B*L={n} must divide tile {tile}"
    if v % WINDOW:  # aligned-window DMAs need 8-divisible rows; production
        table = jnp.pad(table, ((0, WINDOW - v % WINDOW), (0, 0)))  # tables
        v = table.shape[0]  # are padded already (padded_vocab_rows)
    ids_flat = ids.reshape(-1).astype(jnp.int32)
    pos_full = jnp.broadcast_to(pos[None], (b, l, d)).reshape(n, d)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # ids available before the kernel body
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((tile, d), lambda t, ids: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # table stays off-chip
        ],
        out_specs=pl.BlockSpec(
            (tile, d), lambda t, ids: (t, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, WINDOW, d), table.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_gather_kernel, tile=tile, scale=scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, d), out_dtype),
        interpret=_interpret(),
    )(ids_flat, pos_full, table)
    return out.reshape(b, l, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_embed_scale_pos(table, ids, pos, scale, out_dtype=jnp.bfloat16, tile=64):
    """Differentiable fused gather+scale+pos-add.

    Backward: d_table = scatter-add(ids, g * scale); d_pos = sum_b(g).
    """
    return fused_gather_scale_pos(table, ids, pos, scale, out_dtype, tile)


def _fesp_fwd(table, ids, pos, scale, out_dtype, tile):
    out = fused_gather_scale_pos(table, ids, pos, scale, out_dtype, tile)
    shard_aval = jnp.zeros((table.shape[0], 0), table.dtype)
    return out, (shard_aval, ids)


def _fesp_bwd(scale, out_dtype, tile, res, g):
    shard_aval, ids = res
    v, dtype = shard_aval.shape[0], shard_aval.dtype
    d = g.shape[-1]
    g32 = g.astype(jnp.float32)
    d_table = (
        jnp.zeros((v, d), jnp.float32)
        .at[ids.reshape(-1)]
        .add(g32.reshape(-1, d) * scale)
        .astype(dtype)
    )
    d_pos = jnp.sum(g32, axis=0).astype(dtype)
    return d_table, None, d_pos


fused_embed_scale_pos.defvjp(_fesp_fwd, _fesp_bwd)
