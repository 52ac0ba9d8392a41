"""Fused Pallas dropout vs semantics (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from bert4clickpath_tpu.ops.pallas.dropout import fused_dropout


def test_rate_zero_identity():
    x = jnp.ones((4, 16))
    np.testing.assert_array_equal(
        np.asarray(fused_dropout(x, jnp.int32(3), 0.0)), np.asarray(x)
    )


def test_keep_fraction_and_scaling():
    rate = 0.3
    x = jnp.ones((256, 128), jnp.float32)
    y = np.asarray(fused_dropout(x, jnp.int32(7), rate))
    kept = y != 0
    frac = kept.mean()
    assert abs(frac - (1 - rate)) < 0.03  # 32k samples
    np.testing.assert_allclose(y[kept], 1.0 / (1 - rate), rtol=1e-5)


def test_deterministic_in_seed():
    x = jnp.ones((64, 32))
    a = np.asarray(fused_dropout(x, jnp.int32(5), 0.5))
    b = np.asarray(fused_dropout(x, jnp.int32(5), 0.5))
    c = np.asarray(fused_dropout(x, jnp.int32(6), 0.5))
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_backward_uses_same_mask():
    """grad must be the same mask applied to the cotangent — the whole point
    of regenerating from the seed (no stored mask)."""
    x = jnp.asarray(np.random.default_rng(0).normal(size=(64, 32)), jnp.float32)
    seed = jnp.int32(11)
    rate = 0.4
    y, vjp = jax.vjp(lambda x: fused_dropout(x, seed, rate), x)
    g = jnp.ones_like(y)
    (dx,) = vjp(g)
    mask_fwd = np.asarray(y) != 0
    mask_bwd = np.asarray(dx) != 0
    np.testing.assert_array_equal(mask_fwd, mask_bwd)
    np.testing.assert_allclose(np.asarray(dx)[mask_bwd], 1.0 / (1 - rate), rtol=1e-5)


def test_3d_shapes():
    x = jnp.ones((2, 16, 32))
    y = fused_dropout(x, jnp.int32(1), 0.5)
    assert y.shape == x.shape
