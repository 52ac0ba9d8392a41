"""Fused tied-projection softmax cross-entropy (Pallas TPU kernel).

The single hottest op in this framework: the tied output projection
``logits = x @ E^T`` over the full catalog followed by softmax CE. The XLA
path materializes a ``(B*P, V)`` f32 logits tensor in HBM — 558 MB at
Beauty scale (B=256, P=10, V≈54.5k), ~4 GB at the 10M-item stress config —
and reads it back for the softmax and again for the backward. This kernel
streams the projection table through VMEM in vocab tiles with an online
(flash-attention-style) max/sum-exp, so HBM traffic drops from
O(N·V) to O(V·D + N·D):

  forward:  per (row-tile i, vocab-tile j):  s = x_i @ W_j^T  (MXU, f32 acc)
            m, l carried online; the label logit is one (N, D) row-gather +
            row-dot OUTSIDE the kernel (hoisted off the VPU hot loop).
  backward: recompute s, form A = dnll * (softmax - onehot), accumulate
            dx_i += A @ W_j and emit dW_j = A^T @ x_i   (custom VJP).

Row blinding: tied tables hold model-space rows (reserved tokens, OOV,
divisibility padding). Rows outside [row_offset, row_offset+num_valid) get
-1e30 before the online max, exactly like the sharded CE
(parallel/embedding.py) — model-space CE == label-space CE.

Interface (pure function, differentiable wrt x and table):
    nll = fused_softmax_ce(x, table, labels, row_offset, num_valid)
with x (N, D), table (V, D), labels (N,) label-space ids (may be LABEL_PAD;
those rows get nll=0), nll (N,) f32. Masked-mean reduction stays outside —
it is O(N).

On non-TPU backends the same ``pallas_call``s run in interpreter mode, which
keeps CPU tests honest against the dense oracle.
"""

from __future__ import annotations

import functools
import os
import warnings

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bert4clickpath_tpu.constants import LABEL_PAD

NEG_BIG = -1e30


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# Chip-sweep overrides for the tile sizes (benchmarks/profile_step.py
# --ce_row_tile/--ce_vocab_tile set these): honored only when they divide
# the dimension, respect TPU (8, 128) tiling, and stay inside the VMEM
# budget (Tn×Tv f32 score tile) — so a stale env var cannot produce a
# Mosaic-invalid grid.
_ROW_TILE_ENV = "B4CP_CE_ROW_TILE"
_VOCAB_TILE_ENV = "B4CP_CE_VOCAB_TILE"
_MAX_SCORE_TILE_BYTES = 8 << 20  # see the backward-kernel budget in _vocab_tile


def _env_int(name: str) -> int:
    """Parse an int env override; a malformed value is reported and ignored
    (0 = no override) rather than raising an uncontextualized ValueError."""
    raw = os.environ.get(name, "0")
    try:
        return int(raw)
    except ValueError:
        warnings.warn(f"ignoring malformed {name}={raw!r} (expected an int)")
        return 0


def _row_tile(n: int) -> int:
    t0 = _env_int(_ROW_TILE_ENV)
    if 0 < t0 <= 512 and t0 % 8 == 0 and n % t0 == 0:
        return t0
    for t in (512, 256, 128, 64, 32, 16, 8):
        if n % t == 0:
            return t
    return n


def padded_rows(v: int) -> int:
    """Smallest row count >= v that ``_vocab_tile`` (and chunked_eval's
    ``pick_chunk``) accepts: a multiple of 128 below the 4096 whole-table
    cutoff, of 1024 above, of 65536 past 1M rows. The single source of
    truth for catalog-row padding — train/eval/serving all pad through here
    so a tile-tier change cannot strand a call site on a stale formula.

    The 65536 tier exists for the eval/serving catalog scan: chunk count is
    V/chunk *sequential* lax.scan steps, so a 10M-row catalog at 4096-row
    chunks pays ~2,400 dispatch-granularity steps (~330 ms/request batch
    measured, serving_bench round 4) where 64k chunks pay ~150. The extra
    padding is <=0.65% of a >1M-row table and the rows are blinded
    everywhere (sharded_logits_local / chunked_scores)."""
    if v > 1_000_000:
        return v + (-v % 65536)
    return v + (-v % (1024 if v > 4096 else 128))


def _vocab_tile(v: int, d: int) -> int:
    t0 = _env_int(_VOCAB_TILE_ENV)
    if (
        t0 >= 128
        and t0 % 128 == 0
        and v % t0 == 0
        # The BACKWARD kernel is the binding constraint (measured on v5e:
        # Tv=2048 at D=256 dies in Mosaic with "scoped vmem 21.12M > 16M"
        # while the forward alone fits): f32 (Tn<=512, Tv) adjoint tile +
        # double-buffered f32 (Tv, D) w blocks + double-buffered f32 (Tv, D)
        # dw out-blocks. Budgeting those three terms keeps every accepted
        # override Mosaic-compilable; Tv=1024 at D=256 (6 MB here) is the
        # largest verified-good configuration.
        and 512 * t0 * 4 + 4 * t0 * d * 4 <= _MAX_SCORE_TILE_BYTES
    ):
        return t0
    # 1024 keeps the (Tn, Tv) f32 score tile + double-buffered w tiles under
    # the 16MB VMEM budget with Tn=512.
    for t in (1024, 512, 256, 128):
        if v % t == 0:
            return t
    if v <= 4096:  # tiny test tables: whole-table tile is fine
        return v
    raise ValueError(
        f"table rows {v} not divisible by a vocab tile (>=128); pad rows via "
        "parallel.spmd.padded_vocab_rows (a full-table VMEM block would OOM)"
    )


# -- forward kernel -------------------------------------------------------


def _fwd_kernel(
    row_start_ref,  # (1, 1) SMEM: global row id of this table's first row
    x_ref,  # (Tn, D)
    w_ref,  # (Tv, D)
    *rest,  # [b_ref (1, Tv) when has_bias] m_ref, l_ref
    tv: int,
    row_offset: int,
    num_valid: int,
    has_bias: bool = False,
):
    # The label logit is computed OUTSIDE the kernel (one (N, D) row-gather
    # + row-dot; the sharded tier masks+psums it) — the one-hot pick used to
    # cost iota/compare/mul/reduce VPU passes over every interior score tile.
    rest = list(rest)
    b_ref = rest.pop(0) if has_bias else None
    m_ref, l_ref = rest
    j = pl.program_id(1)
    row_start = row_start_ref[0, 0]

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_BIG)
        l_ref[:] = jnp.zeros_like(l_ref)

    x = x_ref[:]
    w = w_ref[:].astype(x.dtype)  # keep the MXU in the compute dtype
    s = jax.lax.dot_general(
        x,
        w,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Tn, Tv)
    if has_bias:
        s = s + b_ref[:]  # (1, Tv) broadcasts over rows; before blinding

    tile0 = row_start + j * tv
    # Boundary tiles (containing reserved/OOV/padding rows) need blinding;
    # interior tiles skip the whole mask computation on the VPU.
    interior = (tile0 >= row_offset) & (tile0 + tv <= row_offset + num_valid)

    def _blind(s):
        rows = tile0 + jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
        return jnp.where(
            (rows >= row_offset) & (rows < row_offset + num_valid), s, NEG_BIG
        )

    s = jax.lax.cond(interior, lambda s: s, _blind, s)

    # online max / sumexp
    m_prev = m_ref[:]  # (Tn, 1)
    m_tile = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_tile)
    l_ref[:] = l_ref[:] * jnp.exp(m_prev - m_new) + jnp.sum(
        jnp.exp(s - m_new), axis=1, keepdims=True
    )
    m_ref[:] = m_new


def _fwd_stats(x, table, row_start, row_offset, num_valid, bias=None):
    """Online (max, sumexp) over this table's rows.

    ``row_start`` (traced int32 scalar) is the global row id of
    ``table[0]`` — 0 single-chip, ``shard_index * V_local`` under shard_map.
    ``bias`` (optional, (1, V) f32): per-row logit bias added before blinding.
    The label logit is NOT computed here — single-chip it is one XLA
    row-gather + dot (:func:`_label_logit`); the sharded tier gathers its
    local rows and psums (_sharded_fwd_impl).
    """
    n, d = x.shape
    v = table.shape[0]
    tn, tv = _row_tile(n), _vocab_tile(v, d)
    grid = (n // tn, v // tv)
    kernel = functools.partial(
        _fwd_kernel, tv=tv, row_offset=row_offset, num_valid=num_valid,
        has_bias=bias is not None,
    )
    n_out = 2
    out_shape = [jax.ShapeDtypeStruct((n, 1), jnp.float32)] * n_out
    in_specs = [
        pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((tn, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tv, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
    ]
    operands = [jnp.reshape(row_start.astype(jnp.int32), (1, 1)), x, table]
    if bias is not None:
        in_specs.append(
            pl.BlockSpec((1, tv), lambda i, j: (0, j), memory_space=pltpu.VMEM)
        )
        operands.append(bias.astype(jnp.float32))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((tn, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
        ]
        * n_out,
        out_shape=out_shape,
        interpret=_interpret(),
    )(*operands)
    m, l = outs
    return m, l


def _label_logit(x, table, labels_model, row_offset, num_valid, bias=None):
    """Label logit via one (N, D) row-gather + row-dot — same MXU-dtype math
    as the in-kernel one-hot pick (bf16 operands, f32 accumulation). Pad rows
    (labels_model -1) read row 0; callers mask their nll to 0. Labels outside
    [row_offset, row_offset+num_valid) are blinded to NEG_BIG, preserving the
    in-kernel one-hot's behavior (it never fired for excluded rows): an OOV
    label yields a ~1e30 nll and fails loudly instead of silently gathering a
    row excluded from the partition function."""
    lab_m = labels_model[:, 0]
    lab = jnp.maximum(lab_m, 0)
    w_rows = table[lab].astype(x.dtype)
    g = jnp.einsum("nd,nd->n", x, w_rows, preferred_element_type=jnp.float32)
    if bias is not None:
        g = g + bias[0, lab]
    in_range = (lab_m >= row_offset) & (lab_m < row_offset + num_valid)
    return jnp.where(in_range, g, NEG_BIG)


def _fwd(x, table, labels_model, row_offset, num_valid, bias=None):
    m, l = _fwd_stats(
        x, table, jnp.zeros((), jnp.int32), row_offset, num_valid, bias=bias
    )
    logz = m[:, 0] + jnp.log(l[:, 0])
    return logz, _label_logit(x, table, labels_model, row_offset, num_valid, bias=bias)


# -- backward kernel ------------------------------------------------------


def _softmax_adjoint(x, w, lab, logz, dnll, tile0, tv, row_offset, num_valid,
                     bias=None):
    """Recompute the tile's A = dnll * (softmax - onehot) on the MXU/VPU."""
    s = jax.lax.dot_general(
        x,
        w,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        s = s + bias  # (1, Tv) broadcasts; before blinding (as forward)
    rows = tile0 + jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
    interior = (tile0 >= row_offset) & (tile0 + tv <= row_offset + num_valid)
    s = jax.lax.cond(
        interior,
        lambda s: s,
        lambda s: jnp.where(
            (rows >= row_offset) & (rows < row_offset + num_valid), s, NEG_BIG
        ),
        s,
    )
    p = jnp.exp(s - logz)  # blinded rows -> exp(-huge) = 0
    onehot = (rows == lab).astype(jnp.float32)
    return dnll * (p - onehot)


def _bwd_dx_kernel(
    row_start_ref, x_ref, w_ref, *rest,
    tv, row_offset, num_valid, has_bias=False
):
    # grid (i, j), j inner: dx block i revisited consecutively -> accumulate
    if has_bias:
        b_ref, lab_ref, logz_ref, dnll_ref, dx_ref = rest
    else:
        lab_ref, logz_ref, dnll_ref, dx_ref = rest
        b_ref = None
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        dx_ref[:] = jnp.zeros_like(dx_ref)

    w = w_ref[:].astype(x_ref.dtype)
    a = _softmax_adjoint(
        x_ref[:], w, lab_ref[:], logz_ref[:], dnll_ref[:],
        row_start_ref[0, 0] + j * tv, tv, row_offset, num_valid,
        bias=None if b_ref is None else b_ref[:],
    )
    dx_ref[:] += jax.lax.dot_general(
        a.astype(x_ref.dtype), w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dx_ref.dtype)


def _bwd_dw_kernel(
    row_start_ref, x_ref, w_ref, *rest,
    tv, row_offset, num_valid, has_bias=False
):
    # grid (j, i), i inner: dw (and db) block j revisited consecutively ->
    # accumulate
    if has_bias:
        b_ref, lab_ref, logz_ref, dnll_ref, dw_ref, db_ref = rest
    else:
        lab_ref, logz_ref, dnll_ref, dw_ref = rest
        b_ref = db_ref = None
    j = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        if db_ref is not None:
            db_ref[:] = jnp.zeros_like(db_ref)

    x = x_ref[:]
    a = _softmax_adjoint(
        x, w_ref[:].astype(x.dtype), lab_ref[:], logz_ref[:], dnll_ref[:],
        row_start_ref[0, 0] + j * tv, tv, row_offset, num_valid,
        bias=None if b_ref is None else b_ref[:],
    )
    dw_ref[:] += jax.lax.dot_general(
        a.astype(x.dtype), x, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dw_ref.dtype)
    if db_ref is not None:
        db_ref[:] += jnp.sum(a, axis=0, keepdims=True)


def _bwd(x, table, labels_model, logz, dnll, row_offset, num_valid,
         row_start=None, bias=None):
    n, d = x.shape
    v = table.shape[0]
    tn, tv = _row_tile(n), _vocab_tile(v, d)
    if row_start is None:
        row_start = jnp.zeros((), jnp.int32)
    row_start = jnp.reshape(row_start.astype(jnp.int32), (1, 1))
    has_bias = bias is not None
    common = dict(
        tv=tv, row_offset=row_offset, num_valid=num_valid, has_bias=has_bias
    )
    row_specs = [
        pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((tn, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tv, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
    ]
    row_operands = [row_start, x, table]
    if has_bias:
        row_specs.append(
            pl.BlockSpec((1, tv), lambda i, j: (0, j), memory_space=pltpu.VMEM)
        )
        row_operands.append(bias.astype(jnp.float32))
    row_specs += [
        pl.BlockSpec((tn, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tn, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tn, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
    ]
    row_operands += [labels_model, logz[:, None], dnll[:, None]]
    dx = pl.pallas_call(
        functools.partial(_bwd_dx_kernel, **common),
        grid=(n // tn, v // tv),
        in_specs=row_specs,
        out_specs=pl.BlockSpec((tn, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, d), x.dtype),
        interpret=_interpret(),
    )(*row_operands)
    # second kernel: swap grid order so dW's accumulation axis is inner
    col_specs = [
        pl.BlockSpec((1, 1), lambda j, i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((tn, d), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tv, d), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
    ]
    col_operands = [row_start, x, table]
    if has_bias:
        col_specs.append(
            pl.BlockSpec((1, tv), lambda j, i: (0, j), memory_space=pltpu.VMEM)
        )
        col_operands.append(bias.astype(jnp.float32))
    col_specs += [
        pl.BlockSpec((tn, 1), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tn, 1), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tn, 1), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
    ]
    col_operands += [labels_model, logz[:, None], dnll[:, None]]
    # dW accumulates across the inner sweep — keep the buffer f32 so a bf16
    # table never suffers repeated round-off; cast once at the end.
    out_specs = [
        pl.BlockSpec((tv, d), lambda j, i: (j, 0), memory_space=pltpu.VMEM)
    ]
    out_shape = [jax.ShapeDtypeStruct((v, d), jnp.float32)]
    if has_bias:
        out_specs.append(
            pl.BlockSpec((1, tv), lambda j, i: (0, j), memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((1, v), jnp.float32))
    outs = pl.pallas_call(
        functools.partial(_bwd_dw_kernel, **common),
        grid=(v // tv, n // tn),
        in_specs=col_specs,
        out_specs=out_specs if has_bias else out_specs[0],
        out_shape=out_shape if has_bias else out_shape[0],
        interpret=_interpret(),
    )(*col_operands)
    if has_bias:
        dw, db = outs
        return dx, dw.astype(table.dtype), db
    return dx, outs.astype(table.dtype)


# -- public custom-vjp op -------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_softmax_ce(x, table, labels, row_offset: int, num_valid: int):
    """Per-row NLL of ``labels`` under softmax(x @ table^T) with row blinding.

    x: (N, D); table: (V, D); labels: (N,) label-space int32, LABEL_PAD
    allowed (those rows return 0). Returns nll (N,) f32.
    """
    nll, _ = _fused_fwd(x, table, labels, row_offset, num_valid)
    return nll


def _labels_model(labels, row_offset):
    # pad rows -> an impossible row id so the one-hot never fires
    return jnp.where(labels == LABEL_PAD, -1, labels + row_offset)[:, None].astype(
        jnp.int32
    )


def _fused_fwd(x, table, labels, row_offset, num_valid):
    lab = _labels_model(labels, row_offset)
    logz, label_logit = _fwd(x, table, lab, row_offset, num_valid)
    mask = (labels != LABEL_PAD).astype(jnp.float32)
    nll = (logz - label_logit) * mask
    return nll, (x, table, labels, logz)


def _fused_bwd(row_offset, num_valid, res, g):
    x, table, labels, logz = res
    mask = (labels != LABEL_PAD).astype(jnp.float32)
    dnll = (g * mask).astype(jnp.float32)
    lab = _labels_model(labels, row_offset)
    bwd = _bwd_auto
    dx, dw = bwd(x, table, lab, logz, dnll, row_offset, num_valid)
    return dx, dw, None


fused_softmax_ce.defvjp(_fused_fwd, _fused_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_softmax_ce_bias(x, table, bias, labels, row_offset: int, num_valid: int):
    """``fused_softmax_ce`` with a per-row logit bias.

    logits = x @ table^T + bias, with ``bias`` (V,) f32 aligned to the
    table's model-space rows (pad/reserved rows carry any value — they are
    blinded). Serves (a) the reference's MLP softmax head, whose final
    ``Dense(V)`` has a bias (head.py:29-47 via nn.Dense), and (b) tied heads
    with a free per-item output bias (``tied_bias``). Returns nll (N,) f32;
    differentiable wrt x, table, and bias.
    """
    nll, _ = _fused_bias_fwd(x, table, bias, labels, row_offset, num_valid)
    return nll


def _fused_bias_fwd(x, table, bias, labels, row_offset, num_valid):
    lab = _labels_model(labels, row_offset)
    brow = bias.reshape(1, -1)
    logz, label_logit = _fwd(x, table, lab, row_offset, num_valid, bias=brow)
    mask = (labels != LABEL_PAD).astype(jnp.float32)
    nll = (logz - label_logit) * mask
    return nll, (x, table, bias, labels, logz)


def _fused_bias_bwd(row_offset, num_valid, res, g):
    x, table, bias, labels, logz = res
    mask = (labels != LABEL_PAD).astype(jnp.float32)
    dnll = (g * mask).astype(jnp.float32)
    lab = _labels_model(labels, row_offset)
    brow = bias.reshape(1, -1)
    bwd = _bwd_auto
    dx, dw, db = bwd(
        x, table, lab, logz, dnll, row_offset, num_valid, bias=brow
    )
    return dx, dw, db.reshape(bias.shape).astype(bias.dtype), None


fused_softmax_ce_bias.defvjp(_fused_bias_fwd, _fused_bias_bwd)


def fused_masked_ce_sums(
    x: jnp.ndarray,  # (B, P, D)
    table: jnp.ndarray,  # (V, D) model-space rows
    labels: jnp.ndarray,  # (B, P) label-space, LABEL_PAD padded
    row_offset: int,
    num_valid: int,
    bias: jnp.ndarray | None = None,  # (V,) per-row logit bias
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(nll_sum, mask_count) on this shard — no reduction, no collectives.

    The data-parallel building block: differentiate the local sum, then psum
    grads/sums OUTSIDE autodiff (parallel/spmd.make_dp_train_step's pattern —
    collectives inside a differentiated shard_map body mis-transpose
    silently, see that module's docstring).
    """
    b, p, d = x.shape
    if bias is not None:
        nll = fused_softmax_ce_bias(
            x.reshape(b * p, d), table, bias, labels.reshape(-1),
            row_offset, num_valid,
        )
    else:
        nll = fused_softmax_ce(
            x.reshape(b * p, d), table, labels.reshape(-1), row_offset, num_valid
        )
    mask = (labels.reshape(-1) != LABEL_PAD).astype(jnp.float32)
    return jnp.sum(nll), jnp.sum(mask)


def fused_masked_softmax_cross_entropy(
    x: jnp.ndarray,  # (B, P, D)
    table: jnp.ndarray,  # (V, D) model-space rows
    labels: jnp.ndarray,  # (B, P) label-space, LABEL_PAD padded
    row_offset: int,
    num_valid: int,
    bias: jnp.ndarray | None = None,  # (V,) per-row logit bias
) -> jnp.ndarray:
    """Drop-in masked-mean CE on top of the fused kernel (local mean)."""
    total, count = fused_masked_ce_sums(
        x, table, labels, row_offset, num_valid, bias=bias
    )
    return total / jnp.maximum(count, 1.0)


# -- sharded variant (inside shard_map) -----------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def sharded_fused_softmax_ce(
    x,
    table_shard,
    labels,
    row_offset: int,
    num_valid: int,
    model_axis: str = "model",
    data_axis=None,
):
    """Vocab-parallel fused CE for use INSIDE ``jax.shard_map``.

    Each ``model``-shard streams its (V_local, D) rows through the fused
    kernel (so even a 10M-row shard never materializes (N, V_local) logits),
    then the online stats combine across shards with pmax/psum — the
    composition of ops/pallas/fused_ce.py with parallel/embedding.py's
    vocab-parallel scheme. Returns the global masked-mean CE (data-axis
    normalized when ``data_axis`` is given); gradients flow to x (psum over
    model) and to the local table shard.
    """
    loss, _ = _sharded_fwd(
        x, table_shard, labels, row_offset, num_valid, model_axis, data_axis
    )
    return loss


def _shard_row_start(table_shard, model_axis):
    idx = jax.lax.axis_index(model_axis)
    return (idx * table_shard.shape[0]).astype(jnp.int32)


def _local_bias_row(bias_full, row_start, v_local):
    """This shard's (1, V_local) slice of the replicated model-space bias."""
    return jax.lax.dynamic_slice(
        bias_full.astype(jnp.float32), (row_start,), (v_local,)
    ).reshape(1, -1)


def _sharded_fwd_impl(
    x, table_shard, bias_full, labels, row_offset, num_valid, model_axis, data_axis
):
    b, p, d = x.shape
    n = b * p
    xf = x.reshape(n, d)
    labf = labels.reshape(-1)
    lab_model = _labels_model(labf, row_offset)
    row_start = _shard_row_start(table_shard, model_axis)
    brow = None
    if bias_full is not None:
        brow = _local_bias_row(bias_full, row_start, table_shard.shape[0])
    m, l = _fwd_stats(
        xf, table_shard, row_start, row_offset, num_valid, bias=brow
    )
    gmax = jax.lax.pmax(m, model_axis)  # (n, 1)
    total = jax.lax.psum(l * jnp.exp(m - gmax), model_axis)
    logz = (gmax + jnp.log(total))[:, 0]  # (n,)
    # label logit hoisted out of the kernel (same as the single-chip path):
    # the owning shard gathers its rows, everyone else contributes 0, psum
    # assembles — the embedding-lookup pattern (parallel/embedding.py)
    v_local = table_shard.shape[0]
    local = lab_model[:, 0] - row_start
    in_shard = (local >= 0) & (local < v_local)
    idx = jnp.clip(local, 0, v_local - 1)
    g_loc = jnp.einsum(
        "nd,nd->n", xf, table_shard[idx].astype(xf.dtype),
        preferred_element_type=jnp.float32,
    )
    if brow is not None:
        g_loc = g_loc + brow[0, idx]
    label_logit = jax.lax.psum(jnp.where(in_shard, g_loc, 0.0), model_axis)
    # blind labels outside [row_offset, row_offset+num_valid) — same loud
    # OOV failure as _label_logit (the old in-kernel one-hot never fired
    # for excluded rows, so an OOV label must not yield a plausible nll)
    in_range = (lab_model[:, 0] >= row_offset) & (
        lab_model[:, 0] < row_offset + num_valid
    )
    label_logit = jnp.where(in_range, label_logit, NEG_BIG)
    mask = (labf != LABEL_PAD).astype(jnp.float32)
    total_loss = jnp.sum((logz - label_logit) * mask)
    count = jnp.sum(mask)
    if data_axis is not None:
        total_loss = jax.lax.psum(total_loss, data_axis)
        count = jax.lax.psum(count, data_axis)
    count = jnp.maximum(count, 1.0)
    loss = total_loss / count
    return loss, (x, table_shard, bias_full, labels, logz, count)


def _sharded_bwd_impl(row_offset, num_valid, model_axis, data_axis, res, gbar):
    x, table_shard, bias_full, labels, logz, count = res
    b, p, d = x.shape
    n = b * p
    labf = labels.reshape(-1)
    mask = (labf != LABEL_PAD).astype(jnp.float32)
    dnll = (gbar / count) * mask  # (n,) d(loss)/d(nll_i)
    lab_model = _labels_model(labf, row_offset)
    row_start = _shard_row_start(table_shard, model_axis)
    brow = None
    if bias_full is not None:
        brow = _local_bias_row(bias_full, row_start, table_shard.shape[0])
    bwd = _bwd_auto
    outs = bwd(
        x.reshape(n, d),
        table_shard,
        lab_model,
        logz,
        dnll.astype(jnp.float32),
        row_offset,
        num_valid,
        row_start=row_start,
        bias=brow,
    )
    # each shard's dx covers only its vocab rows' contribution
    dx = jax.lax.psum(outs[0], model_axis)
    dw = outs[1]
    if bias_full is None:
        return dx.reshape(b, p, d), dw
    # bias_full is REPLICATED: scatter this shard's db into its row window
    # and psum so every shard returns the complete gradient. The psum lives
    # in this hand-written VJP — never autodiffed through.
    db_full = jax.lax.dynamic_update_slice(
        jnp.zeros_like(bias_full, dtype=jnp.float32),
        outs[2].reshape(-1),
        (row_start,),
    )
    db_full = jax.lax.psum(db_full, model_axis).astype(bias_full.dtype)
    return dx.reshape(b, p, d), dw, db_full


def _sharded_fwd(x, table_shard, labels, row_offset, num_valid, model_axis, data_axis):
    loss, res = _sharded_fwd_impl(
        x, table_shard, None, labels, row_offset, num_valid, model_axis, data_axis
    )
    x, table_shard, _, labels, logz, count = res
    return loss, (x, table_shard, labels, logz, count)


def _sharded_bwd(row_offset, num_valid, model_axis, data_axis, res, gbar):
    x, table_shard, labels, logz, count = res
    dx, dw = _sharded_bwd_impl(
        row_offset, num_valid, model_axis, data_axis,
        (x, table_shard, None, labels, logz, count), gbar,
    )
    return dx, dw, None


sharded_fused_softmax_ce.defvjp(_sharded_fwd, _sharded_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def sharded_fused_softmax_ce_bias(
    x,
    table_shard,
    bias_full,
    labels,
    row_offset: int,
    num_valid: int,
    model_axis: str = "model",
    data_axis=None,
):
    """``sharded_fused_softmax_ce`` with a replicated model-space bias.

    ``bias_full`` is the FULL (V_total,) model-space per-row bias, replicated
    on every shard (it is small — one f32 per catalog row); each shard
    slices its own row window. The VJP returns the complete psum'd bias
    gradient on every shard, so a replicated bias param (e.g. the tied
    head's ``tied_out_bias``) trains correctly under vocab sharding.
    """
    loss, _ = _sharded_bias_fwd(
        x, table_shard, bias_full, labels, row_offset, num_valid,
        model_axis, data_axis,
    )
    return loss


def _sharded_bias_fwd(
    x, table_shard, bias_full, labels, row_offset, num_valid, model_axis, data_axis
):
    return _sharded_fwd_impl(
        x, table_shard, bias_full, labels, row_offset, num_valid,
        model_axis, data_axis,
    )


def _sharded_bias_bwd(row_offset, num_valid, model_axis, data_axis, res, gbar):
    dx, dw, db = _sharded_bwd_impl(
        row_offset, num_valid, model_axis, data_axis, res, gbar
    )
    return dx, dw, db, None


sharded_fused_softmax_ce_bias.defvjp(_sharded_bias_fwd, _sharded_bias_bwd)


# -- single-pass backward (dx in VMEM scratch; dw per-block) --------------


def _bwd_fused_kernel(
    row_start_ref, x_ref, w_ref, *rest,
    tn: int, tv: int, row_offset: int, num_valid: int, has_bias: bool = False,
):
    """grid (j, i), i inner: dw (and db) block j accumulates across the inner
    sweep; dx accumulates in a persistent (N, D) VMEM scratch and each dx
    out-block is (re)written on every visit — only the final j sweep's write
    survives, which by then holds the full sum. One s-recompute instead of
    two."""
    if has_bias:
        b_ref, lab_ref, logz_ref, dnll_ref, dx_ref, dw_ref, db_ref, dx_acc = rest
    else:
        lab_ref, logz_ref, dnll_ref, dx_ref, dw_ref, dx_acc = rest
        b_ref = db_ref = None
    j = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init_dw():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        if db_ref is not None:
            db_ref[:] = jnp.zeros_like(db_ref)

    @pl.when(j == 0)
    def _init_dx_acc():
        dx_acc[pl.ds(i * tn, tn), :] = jnp.zeros((tn, dx_acc.shape[1]), dx_acc.dtype)

    x = x_ref[:]
    w = w_ref[:].astype(x.dtype)
    a = _softmax_adjoint(
        x, w, lab_ref[:], logz_ref[:], dnll_ref[:],
        row_start_ref[0, 0] + j * tv, tv, row_offset, num_valid,
        bias=None if b_ref is None else b_ref[:],
    )
    ab = a.astype(x.dtype)
    dw_ref[:] += jax.lax.dot_general(
        ab, x, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dw_ref.dtype)
    if db_ref is not None:
        db_ref[:] += jnp.sum(a, axis=0, keepdims=True)
    acc = dx_acc[pl.ds(i * tn, tn), :] + jax.lax.dot_general(
        ab, w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dx_acc[pl.ds(i * tn, tn), :] = acc
    dx_ref[:] = acc.astype(dx_ref.dtype)


def _bwd_fused(x, table, labels_model, logz, dnll, row_offset, num_valid,
               row_start=None, bias=None):
    n, d = x.shape
    v = table.shape[0]
    tn, tv = _row_tile(n), _vocab_tile(v, d)
    if row_start is None:
        row_start = jnp.zeros((), jnp.int32)
    row_start = jnp.reshape(row_start.astype(jnp.int32), (1, 1))
    has_bias = bias is not None
    in_specs = [
        pl.BlockSpec((1, 1), lambda j, i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((tn, d), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tv, d), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
    ]
    operands = [row_start, x, table]
    if has_bias:
        in_specs.append(
            pl.BlockSpec((1, tv), lambda j, i: (0, j), memory_space=pltpu.VMEM)
        )
        operands.append(bias.astype(jnp.float32))
    in_specs += [
        pl.BlockSpec((tn, 1), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tn, 1), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tn, 1), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
    ]
    operands += [labels_model, logz[:, None], dnll[:, None]]
    out_specs = [
        pl.BlockSpec((tn, d), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tv, d), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n, d), x.dtype),
        # f32 so inner-sweep accumulation is exact even for bf16 tables
        jax.ShapeDtypeStruct((v, d), jnp.float32),
    ]
    if has_bias:
        out_specs.append(
            pl.BlockSpec((1, tv), lambda j, i: (0, j), memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((1, v), jnp.float32))
    outs = pl.pallas_call(
        functools.partial(
            _bwd_fused_kernel, tn=tn, tv=tv, row_offset=row_offset,
            num_valid=num_valid, has_bias=has_bias,
        ),
        grid=(v // tv, n // tn),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((n, d), jnp.float32)],
        interpret=_interpret(),
    )(*operands)
    # dw stays f32 here; _bwd_auto (the only caller) casts to the table
    # dtype once — after summing chunks, so a bf16 table rounds once total
    return outs


def use_fused_backward(n: int, d: int, vmem_budget: int = 4 * 1024 * 1024) -> bool:
    """The merged backward holds an (N, D) f32 scratch in VMEM.

    The budget is the scratch alone — the kernel's double-buffered x/w/dx/dw
    blocks need the rest of VMEM on top. 4 MiB (N=4096 at D=256) is the
    largest configuration verified to compile on v5e; 6 MiB (N=6144) dies in
    the Mosaic compile, so past the budget :func:`_bwd_auto` runs the merged
    kernel over row chunks instead.
    """
    return n * d * 4 <= vmem_budget


def _bwd_chunk_rows(d: int, vmem_budget: int) -> int:
    """Rows per chunk whose (chunk, D) f32 scratch fits the VMEM budget,
    rounded down to a multiple of the largest ``_row_tile`` candidate it can
    hold: an 8-aligned-only chunk (e.g. 2728 at d=384) would fall through
    every tile size to 8-row MXU blocks and run far slower than the two-pass
    backward it replaces. Only the ragged last chunk may tile below the
    chosen candidate."""
    chunk = vmem_budget // (4 * d)
    for t in (512, 256, 128, 64, 32, 16, 8):
        if chunk >= t:
            return chunk - chunk % t
    return chunk


def _bwd_auto(x, table, labels_model, logz, dnll, row_offset, num_valid,
              row_start=None, bias=None, vmem_budget: int = 4 * 1024 * 1024):
    """Shape-aware backward dispatch.

    Merged single-pass kernel when the (N, D) f32 dx scratch fits VMEM;
    past that, the merged kernel over static row CHUNKS — each chunk
    recomputes scores only for its own rows, so the total stays ONE
    s-recompute (the two-pass backward pays two: at B=512/N=5120 its
    dw+dx passes measured 2.40+2.06 ms vs ~3.4 ms projected for two merged
    chunks — KERNELS.md round 5). dw/db sum across chunks in f32 and round
    to the table dtype once at the end, matching the single-call kernel's
    numerics. The two-pass kernels remain as the fallback for degenerate
    shapes (chunk < one row tile).
    """
    n, d = x.shape
    if use_fused_backward(n, d, vmem_budget):
        outs = _bwd_fused(
            x, table, labels_model, logz, dnll, row_offset, num_valid,
            row_start=row_start, bias=bias,
        )
        return (outs[0], outs[1].astype(table.dtype), *outs[2:])
    chunk = _bwd_chunk_rows(d, vmem_budget)
    if chunk < 8:
        return _bwd(
            x, table, labels_model, logz, dnll, row_offset, num_valid,
            row_start=row_start, bias=bias,
        )
    dxs, acc = [], None
    for i in range(0, n, chunk):
        j = min(n, i + chunk)
        outs = _bwd_fused(
            x[i:j], table, labels_model[i:j], logz[i:j], dnll[i:j],
            row_offset, num_valid, row_start=row_start, bias=bias,
        )
        dxs.append(outs[0])
        # dw/db arrive in f32 from _bwd_fused: sum across chunks in f32 so a
        # bf16 table rounds once at the end, not once per chunk
        rest = list(outs[1:])
        acc = rest if acc is None else [a + b for a, b in zip(acc, rest)]
    acc[0] = acc[0].astype(table.dtype)
    return (jnp.concatenate(dxs, axis=0), *acc)
