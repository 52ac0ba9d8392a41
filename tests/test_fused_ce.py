"""Fused Pallas CE kernel vs the dense oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bert4clickpath_tpu.constants import LABEL_PAD, NUM_RESERVED_TOKENS
from bert4clickpath_tpu.ops.losses import masked_softmax_cross_entropy
from bert4clickpath_tpu.ops.pallas.fused_ce import (
    fused_masked_softmax_cross_entropy,
    fused_softmax_ce,
)


def _case(n=16, d=8, v=64, num_valid=40, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d)).astype(np.float32)
    table = rng.normal(size=(v, d)).astype(np.float32)
    labels = rng.integers(0, num_valid, size=(n,)).astype(np.int32)
    labels[::5] = LABEL_PAD
    return jnp.asarray(x), jnp.asarray(table), jnp.asarray(labels)


def _dense_nll(x, table, labels, num_valid):
    logits = x @ table[NUM_RESERVED_TOKENS : NUM_RESERVED_TOKENS + num_valid].T
    logz = jax.nn.logsumexp(logits, axis=-1)
    safe = jnp.where(labels == LABEL_PAD, 0, labels)
    picked = jnp.take_along_axis(logits, safe[:, None], axis=1)[:, 0]
    mask = (labels != LABEL_PAD).astype(jnp.float32)
    return (logz - picked) * mask


def test_forward_matches_dense():
    x, table, labels = _case()
    nll = fused_softmax_ce(x, table, labels, NUM_RESERVED_TOKENS, 40)
    want = _dense_nll(x, table, labels, 40)
    np.testing.assert_allclose(np.asarray(nll), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_forward_all_pad_rows_zero():
    x, table, labels = _case()
    labels = jnp.full_like(labels, LABEL_PAD)
    nll = fused_softmax_ce(x, table, labels, NUM_RESERVED_TOKENS, 40)
    np.testing.assert_array_equal(np.asarray(nll), 0.0)


def test_gradients_match_dense():
    x, table, labels = _case()

    def fused_loss(x, t):
        nll = fused_softmax_ce(x, t, labels, NUM_RESERVED_TOKENS, 40)
        return jnp.sum(nll) / jnp.maximum(
            jnp.sum((labels != LABEL_PAD).astype(jnp.float32)), 1.0
        )

    def dense_loss(x, t):
        nll = _dense_nll(x, t, labels, 40)
        return jnp.sum(nll) / jnp.maximum(
            jnp.sum((labels != LABEL_PAD).astype(jnp.float32)), 1.0
        )

    (lf, (gx_f, gt_f)) = jax.value_and_grad(fused_loss, argnums=(0, 1))(x, table)
    (ld, (gx_d, gt_d)) = jax.value_and_grad(dense_loss, argnums=(0, 1))(x, table)
    np.testing.assert_allclose(float(lf), float(ld), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_d), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gt_f), np.asarray(gt_d), rtol=1e-4, atol=1e-6)
    # blinded rows (reserved/OOV/padding) must receive zero table grad
    blinded = np.ones(table.shape[0], bool)
    blinded[NUM_RESERVED_TOKENS : NUM_RESERVED_TOKENS + 40] = False
    np.testing.assert_array_equal(np.asarray(gt_f)[blinded], 0.0)


def test_chunked_backward_matches_dense(monkeypatch):
    """N past the merged backward's VMEM scratch budget: _bwd_auto must run
    the merged kernel over row chunks (uneven last chunk included) and sum
    dw/db exactly — the B=512 cliff fix (KERNELS.md round 5). Budget is
    shrunk so the n=24 test shape splits into a 16-row and an 8-row chunk."""
    from bert4clickpath_tpu.ops.pallas import fused_ce as F

    x, table, labels = _case(n=24)
    orig = F._bwd_auto
    calls = {"n": 0}

    def tiny_budget(*args, **kwargs):
        calls["n"] += 1
        kwargs["vmem_budget"] = 16 * 8 * 4  # -> 16-row chunks: 16 + uneven 8
        return orig(*args, **kwargs)

    monkeypatch.setattr(F, "_bwd_auto", tiny_budget)

    def fused_loss(x, t):
        nll = fused_softmax_ce(x, t, labels, NUM_RESERVED_TOKENS, 40)
        return jnp.sum(nll) / jnp.maximum(
            jnp.sum((labels != LABEL_PAD).astype(jnp.float32)), 1.0
        )

    def dense_loss(x, t):
        nll = _dense_nll(x, t, labels, 40)
        return jnp.sum(nll) / jnp.maximum(
            jnp.sum((labels != LABEL_PAD).astype(jnp.float32)), 1.0
        )

    (gx_f, gt_f) = jax.grad(fused_loss, argnums=(0, 1))(x, table)
    (gx_d, gt_d) = jax.grad(dense_loss, argnums=(0, 1))(x, table)
    assert calls["n"] == 1
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_d), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gt_f), np.asarray(gt_d), rtol=1e-4, atol=1e-6)


def test_bwd_chunk_rows_keeps_mxu_tiles():
    """The chunk size must stay a multiple of the largest _row_tile candidate
    it can hold — an 8-aligned-only chunk (2728 at d=384) would degrade every
    chunk to 8-row MXU blocks."""
    from bert4clickpath_tpu.ops.pallas.fused_ce import _bwd_chunk_rows, _row_tile

    B = 4 * 1024 * 1024
    assert _bwd_chunk_rows(256, B) == 4096 and _row_tile(4096) == 512
    assert _bwd_chunk_rows(384, B) == 2560 and _row_tile(2560) == 512
    assert _bwd_chunk_rows(2048, B) == 512
    assert _bwd_chunk_rows(4096, B) == 256  # below 512: largest fitting tile
    assert _bwd_chunk_rows(8, 16 * 8 * 4) == 16  # the tiny-budget test shape
    assert _bwd_chunk_rows(8, 7 * 8 * 4) < 8  # degenerate -> two-pass path


def test_chunked_backward_bf16_accumulates_in_f32(monkeypatch):
    """Chunked dw must round to the bf16 table dtype ONCE (like the single
    merged kernel), not once per chunk: summing in f32 keeps the chunked and
    unchunked paths' gradients close."""
    from bert4clickpath_tpu.ops.pallas import fused_ce as F

    x, table, labels = _case(n=24)
    x, table = x.astype(jnp.bfloat16), table.astype(jnp.bfloat16)

    def grads(budget):
        orig = F._bwd_auto

        def with_budget(*args, **kwargs):
            kwargs["vmem_budget"] = budget
            return orig(*args, **kwargs)

        monkeypatch.setattr(F, "_bwd_auto", with_budget)

        def loss(t):
            nll = fused_softmax_ce(x, t, labels, NUM_RESERVED_TOKENS, 40)
            return jnp.sum(nll)

        g = jax.grad(loss)(table)
        monkeypatch.setattr(F, "_bwd_auto", orig)
        assert g.dtype == jnp.bfloat16
        return np.asarray(g, np.float32)

    g_one = grads(24 * 8 * 4)  # single merged call
    g_chunked = grads(8 * 8 * 4)  # three 8-row chunks
    np.testing.assert_allclose(g_chunked, g_one, rtol=1e-2, atol=1e-3)


def test_wrapper_matches_masked_ce():
    x, table, labels = _case(n=24)
    xb = x.reshape(8, 3, -1)
    lb = labels.reshape(8, 3)
    got = fused_masked_softmax_cross_entropy(xb, table, lb, NUM_RESERVED_TOKENS, 40)
    dense_logits = jnp.einsum(
        "bpd,vd->bpv", xb, table[NUM_RESERVED_TOKENS : NUM_RESERVED_TOKENS + 40]
    )
    want = masked_softmax_cross_entropy(dense_logits, lb)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_uneven_tiles():
    # n=8 (one tile), v=128 with valid range crossing a tile boundary
    x, table, labels = _case(n=8, d=16, v=256, num_valid=100, seed=3)
    nll = fused_softmax_ce(x, table, labels, NUM_RESERVED_TOKENS, 100)
    want = _dense_nll(x, table, labels, 100)
    np.testing.assert_allclose(np.asarray(nll), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_bf16_inputs():
    x, table, labels = _case()
    nll = fused_softmax_ce(
        x.astype(jnp.bfloat16), table, labels, NUM_RESERVED_TOKENS, 40
    )
    want = _dense_nll(x.astype(jnp.bfloat16).astype(jnp.float32), table, labels, 40)
    np.testing.assert_allclose(np.asarray(nll), np.asarray(want), rtol=5e-2, atol=1e-2)


def test_sharded_fused_matches_dense():
    """sharded_fused_softmax_ce inside shard_map == dense CE (8-dev mesh)."""
    import jax
    from jax.sharding import PartitionSpec as P

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from bert4clickpath_tpu.config import MeshConfig
    from bert4clickpath_tpu.ops.pallas.fused_ce import sharded_fused_softmax_ce
    from bert4clickpath_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(MeshConfig(data=2, model=4))
    rng = np.random.default_rng(5)
    v, d, nv = 512, 16, 400  # 128 rows/shard
    x = jnp.asarray(rng.normal(size=(4, 8, d)), jnp.float32)
    table = jnp.asarray(rng.normal(size=(v, d)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, nv, size=(4, 8)), jnp.int32)
    labels = labels.at[0, 3].set(LABEL_PAD)

    def f(x, t, lbl):
        return sharded_fused_softmax_ce(
            x, t, lbl, NUM_RESERVED_TOKENS, nv, "model", "data"
        )

    def mapped(x, t, l):
        loss, (gx, gt) = jax.value_and_grad(f, argnums=(0, 1))(x, t, l)
        # dW holds only this data-shard's batch contribution -> psum over
        # data (what a train step does before the optimizer)
        return loss, (gx, jax.lax.psum(gt, "data"))

    loss, (gx, gt) = jax.jit(
        jax.shard_map(
            mapped,
            mesh=mesh,
            in_specs=(P("data", None, None), P("model", None), P("data", None)),
            out_specs=(P(), (P("data", None, None), P("model", None))),
            check_vma=False,
        )
    )(x, table, labels)

    def dense(x, t):
        logits = jnp.einsum(
            "bpd,vd->bpv", x, t[NUM_RESERVED_TOKENS : NUM_RESERVED_TOKENS + nv]
        )
        from bert4clickpath_tpu.ops.losses import masked_softmax_cross_entropy

        return masked_softmax_cross_entropy(logits, labels)

    want, (wgx, wgt) = jax.value_and_grad(dense, argnums=(0, 1))(x, table)
    np.testing.assert_allclose(float(loss), float(want), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(wgx), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gt), np.asarray(wgt), rtol=1e-4, atol=1e-6)


def test_oov_label_fails_loudly():
    # A label >= num_valid maps to a table row excluded from the partition
    # function; the hoisted label-pick must blind it to -1e30 (matching the
    # old in-kernel one-hot that never fired) so the nll is absurdly large,
    # not silently plausible.
    x, table, labels = _case()
    labels = labels.at[0].set(50)  # >= num_valid=40, < v=64: a real table row
    nll = fused_softmax_ce(x, table, labels, NUM_RESERVED_TOKENS, 40)
    assert float(nll[0]) > 1e20
    # the rest of the batch is unaffected
    want = _dense_nll(x, table, labels, 40)
    np.testing.assert_allclose(
        np.asarray(nll)[1:], np.asarray(want)[1:], rtol=1e-5, atol=1e-6
    )


def test_malformed_tile_env_ignored(monkeypatch):
    monkeypatch.setenv("B4CP_CE_VOCAB_TILE", "not-an-int")
    monkeypatch.setenv("B4CP_CE_ROW_TILE", "1e3")
    x, table, labels = _case()
    with pytest.warns(UserWarning, match="malformed"):
        nll = fused_softmax_ce(x, table, labels, NUM_RESERVED_TOKENS, 40)
    want = _dense_nll(x, table, labels, 40)
    np.testing.assert_allclose(np.asarray(nll), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_vocab_tile_override_respects_backward_vmem_budget(monkeypatch):
    """Tv=2048 at D=256 is Mosaic-infeasible on v5e (the merged backward's
    adjoint tile + f32 w/dw double buffers exceed the 16MB scoped-vmem
    limit — measured, round 4); the env override must fall back to the
    default rather than hand Mosaic an uncompilable grid. Tv=1024 (the
    verified-good config) must be honored."""
    from bert4clickpath_tpu.ops.pallas.fused_ce import _vocab_tile

    monkeypatch.setenv("B4CP_CE_VOCAB_TILE", "2048")
    assert _vocab_tile(55_296, 256) == 1024  # rejected -> default
    assert _vocab_tile(55_296, 64) == 2048  # narrow D: fits, honored
    monkeypatch.setenv("B4CP_CE_VOCAB_TILE", "1024")
    assert _vocab_tile(55_296, 256) == 1024


def test_sharded_oov_label_fails_loudly():
    """Sharded path: an OOV label (>= num_valid) must blind to -1e30 and
    explode the loss, same as the single-chip path."""
    import jax
    from jax.sharding import PartitionSpec as P

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from bert4clickpath_tpu.config import MeshConfig
    from bert4clickpath_tpu.ops.pallas.fused_ce import sharded_fused_softmax_ce
    from bert4clickpath_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(MeshConfig(data=2, model=4))
    rng = np.random.default_rng(7)
    v, d, nv = 512, 16, 400
    x = jnp.asarray(rng.normal(size=(4, 8, d)), jnp.float32)
    table = jnp.asarray(rng.normal(size=(v, d)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, nv, size=(4, 8)), jnp.int32)
    labels = labels.at[1, 2].set(nv + 5)  # OOV: a real table row beyond num_valid

    def f(x, t, lbl):
        return sharded_fused_softmax_ce(
            x, t, lbl, NUM_RESERVED_TOKENS, nv, "model", "data"
        )

    loss = jax.jit(
        jax.shard_map(
            f,
            mesh=mesh,
            in_specs=(P("data", None, None), P("model", None), P("data", None)),
            out_specs=P(),
            check_vma=False,
        )
    )(x, table, labels)
    assert float(loss) > 1e20
