"""Fused embedding-gather kernel vs dense reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from bert4clickpath_tpu.ops.pallas.gather import (
    fused_embed_scale_pos,
    fused_gather_scale_pos,
)


def _case(b=2, l=32, v=50, d=16, seed=0):
    rng = np.random.default_rng(seed)
    table = jnp.asarray(rng.normal(size=(v, d)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, v, size=(b, l)), jnp.int32)
    pos = jnp.asarray(rng.normal(size=(l, d)), jnp.float32)
    return table, ids, pos


def test_forward_matches_dense():
    table, ids, pos = _case()
    scale = 4.0
    got = fused_gather_scale_pos(table, ids, pos, scale, out_dtype=jnp.float32, tile=16)
    want = table[ids] * scale + pos[None]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_bf16_output():
    table, ids, pos = _case()
    got = fused_gather_scale_pos(table, ids, pos, 2.0, out_dtype=jnp.bfloat16, tile=16)
    want = (table[ids] * 2.0 + pos[None]).astype(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), rtol=2e-2, atol=1e-2
    )


def test_gradients_scatter_add():
    table, ids, pos = _case(b=1, l=16)
    scale = 3.0

    def loss_fused(t, p):
        out = fused_embed_scale_pos(t, ids, p, scale, jnp.float32, 16)
        return jnp.sum(out * out)

    def loss_dense(t, p):
        out = t[ids] * scale + p[None]
        return jnp.sum(out * out)

    gf = jax.grad(loss_fused, argnums=(0, 1))(table, pos)
    gd = jax.grad(loss_dense, argnums=(0, 1))(table, pos)
    np.testing.assert_allclose(np.asarray(gf[0]), np.asarray(gd[0]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(gd[1]), rtol=1e-5)


def test_repeated_ids_accumulate():
    table, _, pos = _case(l=16)
    ids = jnp.zeros((1, 16), jnp.int32)  # all tokens hit row 0

    def loss(t):
        return jnp.sum(fused_embed_scale_pos(t, ids, pos, 1.0, jnp.float32, 16))

    g = jax.grad(loss)(table)
    np.testing.assert_allclose(float(g[0, 0]), 16.0, rtol=1e-6)
    np.testing.assert_allclose(float(np.abs(np.asarray(g[1:])).max()), 0.0)
