"""Fused masked attention kernels (Pallas TPU).

The encoder's padding-masked bidirectional attention
(models/encoder.py:attention_per_head) as fused kernels, both in the
(B, L, D) layout with heads as lane sub-ranges — no head-major tensor ever
exists in HBM (the head-major formulations cost ~1.2 ms/step in layout
copies at the flagship shape, and a head-major blockwise grid lost to
dense XLA at every measured L before being replaced — KERNELS.md rounds
2/4):

* :func:`fused_mha` — whole-row kernel, one batch row per program,
  backward recomputes softmax entirely in VMEM. Short/medium L
  (``fused_mha_supported``).
* :func:`blockwise_mha` — same layout with k/v streamed blockwise through
  VMEM (online softmax, per-head running stats), so it runs at any L:
  the long-sequence degradation path (SURVEY.md §5 — blockwise, no
  ring/CP). Device-measured 1.2-3.5x over dense XLA at L=768-4096.

Layout: q, k, v are (B, L, D); the additive padding bias is (B, 1, 1, L)
(ops/masking.py:padding_bias). Requires L blocks Mosaic-legal (lane dims
multiples of 128 or whole-L); non-TPU backends run the interpreter for
tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_BIG = -1e9


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# -- short-sequence fused MHA over (B, L, D) ------------------------------
#
# At the reference shapes (L≈53) the blockwise kernel's (batch, head) grid
# is overhead-bound AND the surrounding XLA graph pays ~1.3 ms/step in
# (B, L, H, Dh) layout-transpose copies that the head-major view forces
# (device trace, KERNELS.md round 2). This kernel instead consumes the
# dense projections exactly as produced — (B, L, D) with heads as lane
# sub-ranges — and computes every head of one batch row per program, so no
# head-major tensor ever exists in HBM. Backward recomputes the softmax
# (everything sits in VMEM), which also deletes the (B, H, L, L)
# score-tensor remat copies the XLA path pays.


def _mha_fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, num_heads, scale):
    q = q_ref[0]  # (L, D)
    k = k_ref[0]
    v = v_ref[0]
    bias = bias_ref[0, 0, 0].astype(jnp.float32)  # (L,)
    dh = q.shape[1] // num_heads
    for h in range(num_heads):
        qh = jax.lax.slice_in_dim(q, h * dh, (h + 1) * dh, axis=1)
        kh = jax.lax.slice_in_dim(k, h * dh, (h + 1) * dh, axis=1)
        vh = jax.lax.slice_in_dim(v, h * dh, (h + 1) * dh, axis=1)
        s = jax.lax.dot_general(
            qh, kh, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale + bias[None, :]
        p = jax.nn.softmax(s, axis=-1)
        oh = jax.lax.dot_general(
            p.astype(vh.dtype), vh, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, h * dh : (h + 1) * dh] = oh.astype(o_ref.dtype)


def _mha_bwd_kernel(
    q_ref, k_ref, v_ref, bias_ref, do_ref, dq_ref, dk_ref, dv_ref,
    *, num_heads, scale,
):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    bias = bias_ref[0, 0, 0].astype(jnp.float32)
    dh = q.shape[1] // num_heads
    for h in range(num_heads):
        sl = lambda t: jax.lax.slice_in_dim(t, h * dh, (h + 1) * dh, axis=1)  # noqa: E731
        qh, kh, vh, doh = sl(q), sl(k), sl(v), sl(do).astype(jnp.float32)
        s = jax.lax.dot_general(
            qh, kh, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale + bias[None, :]
        p = jax.nn.softmax(s, axis=-1)  # (L, L) f32
        dv_ref[0, :, h * dh : (h + 1) * dh] = jax.lax.dot_general(
            p.astype(doh.dtype), doh, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dv_ref.dtype)
        dp = jax.lax.dot_general(
            doh, vh.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        delta = jnp.sum(p * dp, axis=1, keepdims=True)
        ds = p * (dp - delta) * scale  # (L, L) f32
        dsc = ds.astype(kh.dtype)
        dq_ref[0, :, h * dh : (h + 1) * dh] = jax.lax.dot_general(
            dsc, kh, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dq_ref.dtype)
        dk_ref[0, :, h * dh : (h + 1) * dh] = jax.lax.dot_general(
            dsc, qh, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dk_ref.dtype)


def _mha_specs(b, l, d):
    blk = pl.BlockSpec((1, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    bias_blk = pl.BlockSpec(
        (1, 1, 1, l), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    return blk, bias_blk


def _fused_mha_fwd(q, k, v, bias, num_heads):
    b, l, d = q.shape
    scale = 1.0 / ((d // num_heads) ** 0.5)
    blk, bias_blk = _mha_specs(b, l, d)
    return pl.pallas_call(
        functools.partial(_mha_fwd_kernel, num_heads=num_heads, scale=scale),
        grid=(b,),
        in_specs=[blk, blk, blk, bias_blk],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((b, l, d), q.dtype),
        interpret=_interpret(),
    )(q, k, v, bias)


def _fused_mha_bwd(num_heads, res, do):
    q, k, v, bias = res
    b, l, d = q.shape
    scale = 1.0 / ((d // num_heads) ** 0.5)
    blk, bias_blk = _mha_specs(b, l, d)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_mha_bwd_kernel, num_heads=num_heads, scale=scale),
        grid=(b,),
        in_specs=[blk, blk, blk, bias_blk, blk],
        out_specs=[blk, blk, blk],
        out_shape=[jax.ShapeDtypeStruct((b, l, d), q.dtype)] * 3,
        interpret=_interpret(),
    )(q, k, v, bias, do)
    return dq, dk, dv, None


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_mha(q, k, v, bias, num_heads):
    """(B, L, D) masked MHA, heads = lane sub-ranges of D.

    All heads of one batch row per program; backward recomputes softmax in
    VMEM. For sequences where (L, D) tiles don't fit VMEM use
    :func:`blockwise_mha` instead — see ``fused_mha_supported``.
    """
    return _fused_mha_fwd(q, k, v, bias, num_heads)


def _fused_mha_fwd_rule(q, k, v, bias, num_heads):
    return _fused_mha_fwd(q, k, v, bias, num_heads), (q, k, v, bias)


fused_mha.defvjp(_fused_mha_fwd_rule, _fused_mha_bwd)


def fused_mha_supported(
    l: int, d: int, num_heads: int, itemsize: int = 2,
    vmem_budget: int = 6 * 1024 * 1024,
) -> bool:
    """Whole-row fused MHA needs ~5 (L, D) tiles + one f32 (L, L) score per
    head's working set in VMEM at once."""
    return 5 * l * d * itemsize + 3 * l * l * 4 <= vmem_budget


# -- blockwise fused MHA over (B, L, D) ------------------------------------
#
# The head-major blockwise kernel above LOSES to XLA's dense path at every
# measured L (0.44x at 1024, 0.69x at 4096 — KERNELS.md round 4): its
# (batch, head, q-block, k-block) grid issues thousands of programs over
# tiny (block, Dh) tiles. This kernel keeps the layout that made the
# whole-row kernel win (heads as lane sub-ranges of (L, D), zero head-major
# tensors in HBM) and adds the online-softmax k-streaming the whole-row
# kernel lacks: grid (batch, q-block, k-block), ALL heads per program,
# per-head (m, l) running stats in a (Tq, H) scratch. H x fewer programs,
# D-wide (not Dh-wide) DMAs, and the same O(L^2)-HBM avoidance.


def _hpad(num_heads: int) -> int:
    return max(8, ((num_heads + 7) // 8) * 8)


def _bmha_fwd_kernel(
    q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, acc, m_scr, l_scr,
    *, num_heads, scale, nk,
):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)
        m_scr[:] = jnp.full_like(m_scr, NEG_BIG)
        l_scr[:] = jnp.zeros_like(l_scr)

    q = q_ref[0]  # (Tq, D)
    k = k_ref[0]  # (Tk, D)
    v = v_ref[0]
    bias = bias_ref[0, 0, 0].astype(jnp.float32)  # (Tk,)
    d = q.shape[1]
    dh = d // num_heads
    for h in range(num_heads):
        sl = slice(h * dh, (h + 1) * dh)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale + bias[None, :]
        m_prev = m_scr[:, h : h + 1]
        l_prev = l_scr[:, h : h + 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_scr[:, h : h + 1] = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc[:, sl] = acc[:, sl] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v[:, sl],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scr[:, h : h + 1] = m_new

    @pl.when(j == nk - 1)
    def _finalize():
        lse = m_scr[:] + jnp.log(l_scr[:])  # (Tq, H)
        hp = lse_ref.shape[-1]
        for h in range(num_heads):
            sl = slice(h * dh, (h + 1) * dh)
            o_ref[0, :, sl] = (acc[:, sl] / l_scr[:, h : h + 1]).astype(o_ref.dtype)
        lse_ref[0] = jnp.pad(lse, ((0, 0), (0, hp - num_heads)))


def _bmha_dq_kernel(
    q_ref, k_ref, v_ref, bias_ref, lse_ref, do_ref, delta_ref, dq_ref,
    *, num_heads, scale,
):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        dq_ref[:] = jnp.zeros_like(dq_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    bias = bias_ref[0, 0, 0].astype(jnp.float32)
    d = q.shape[1]
    dh = d // num_heads
    do = do_ref[0]
    for h in range(num_heads):
        sl = slice(h * dh, (h + 1) * dh)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale + bias[None, :]
        p = jnp.exp(s - lse_ref[0][:, h : h + 1])  # (Tq, Tk)
        doh = do[:, sl].astype(jnp.float32)
        dp = jax.lax.dot_general(
            doh, v[:, sl].astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta_ref[0][:, h : h + 1]) * scale
        dq_ref[0, :, sl] += jax.lax.dot_general(
            ds.astype(k.dtype), k[:, sl],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dq_ref.dtype)


def _bmha_dkv_kernel(
    q_ref, k_ref, v_ref, bias_ref, lse_ref, do_ref, delta_ref, dk_ref, dv_ref,
    *, num_heads, scale,
):
    i = pl.program_id(2)  # q-block (inner): dk/dv accumulate across it

    @pl.when(i == 0)
    def _init():
        dk_ref[:] = jnp.zeros_like(dk_ref)
        dv_ref[:] = jnp.zeros_like(dv_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    bias = bias_ref[0, 0, 0].astype(jnp.float32)
    d = q.shape[1]
    dh = d // num_heads
    do = do_ref[0]
    for h in range(num_heads):
        sl = slice(h * dh, (h + 1) * dh)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale + bias[None, :]
        p = jnp.exp(s - lse_ref[0][:, h : h + 1])
        doh = do[:, sl].astype(jnp.float32)
        dv_ref[0, :, sl] += jax.lax.dot_general(
            p.astype(doh.dtype), doh,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dv_ref.dtype)
        dp = jax.lax.dot_general(
            doh, v[:, sl].astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta_ref[0][:, h : h + 1]) * scale
        dk_ref[0, :, sl] += jax.lax.dot_general(
            ds.astype(q.dtype), q[:, sl],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dk_ref.dtype)


_BMHA_BLOCK = 512  # (Tq, D) + (Tk, D) + f32 (Tq, Tk) score fits VMEM to D=512


def _bmha_blocks(l: int, d: int, itemsize: int = 2) -> tuple[int, int]:
    """(Tq, Tk) for the (B, L, D) blockwise kernel.

    Both must keep lane-dim blocks Mosaic-legal: multiples of 128, or the
    whole L (a 64-wide bias block passed interpret mode and failed only on
    the chip at L=768). Tk is chosen as LARGE as the VMEM budget allows —
    measured on v5e (KERNELS.md round 4): 256-wide k blocks at L=768 ran
    0.75x of dense XLA while 512+ blocks win 1.4-2.9x, so small k tiles are
    the failure mode, not the safety choice. Budget: f32 (Tq, Tk) score
    tile + double-buffered k/v (Tk, D) blocks within ~8 MB.
    """
    tq = next((t for t in (512, 256, 128) if l % t == 0), l)
    # Mosaic holds several head iterations' f32 score tiles live at once
    # (unrolled loop), so the budget is deliberately tight: Tk=2048 at D=256
    # hit "scoped vmem 17.39M > 16M" on chip; Tk=1024 (4 MB by this
    # formula) compiles and wins 1.48x/2.9x at L=1024/4096. The candidate
    # list caps at the chip-validated Tk=1024: 1536/2048 tiles can pass the
    # formula at small D while the unroll multiplicity (~3-4 live f32
    # (Tq, Tk) temporaries per head iteration in the backward kernels) still
    # blows the 16 MB scoped-vmem limit at compile time — re-admit larger
    # tiles only with a device compile check at that exact (Tq, Tk, D).
    budget = 4 << 20
    for tk in (1024, 768, 512, 384, 256, 128):
        if l % tk == 0 and tq * tk * 4 + 4 * tk * d * itemsize <= budget:
            return tq, tk
    return tq, l  # tiny/odd L: single k block (block == dim is legal)


def _bmha_specs(b, l, d, bq, bk, hp, swap):
    # swap=False: grid (b, q-block i, k-block j); True: (b, j, i)
    if swap:
        qix = lambda b, j, i: (b, i, 0)  # noqa: E731
        kix = lambda b, j, i: (b, j, 0)  # noqa: E731
        bix = lambda b, j, i: (b, 0, 0, j)  # noqa: E731
        rix = lambda b, j, i: (b, i, 0)  # noqa: E731
    else:
        qix = lambda b, i, j: (b, i, 0)  # noqa: E731
        kix = lambda b, i, j: (b, j, 0)  # noqa: E731
        bix = lambda b, i, j: (b, 0, 0, j)  # noqa: E731
        rix = lambda b, i, j: (b, i, 0)  # noqa: E731
    qspec = pl.BlockSpec((1, bq, d), qix, memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, bk, d), kix, memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, 1, 1, bk), bix, memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, bq, hp), rix, memory_space=pltpu.VMEM)
    return qspec, kspec, bias_spec, row_spec


def _bmha_fwd(q, k, v, bias, num_heads):
    b, l, d = q.shape
    bq, bk = _bmha_blocks(l, d, jnp.dtype(q.dtype).itemsize)
    nk = l // bk
    hp = _hpad(num_heads)
    scale = 1.0 / ((d // num_heads) ** 0.5)
    qspec, kspec, bias_spec, row_spec = _bmha_specs(b, l, d, bq, bk, hp, False)
    out, lse = pl.pallas_call(
        functools.partial(
            _bmha_fwd_kernel, num_heads=num_heads, scale=scale, nk=nk
        ),
        grid=(b, l // bq, nk),
        in_specs=[qspec, kspec, kspec, bias_spec],
        out_specs=[qspec, row_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, l, d), q.dtype),
            jax.ShapeDtypeStruct((b, l, hp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, d), jnp.float32),
            pltpu.VMEM((bq, num_heads), jnp.float32),
            pltpu.VMEM((bq, num_heads), jnp.float32),
        ],
        interpret=_interpret(),
    )(q, k, v, bias)
    return out, lse


def _bmha_bwd(num_heads, res, g):
    q, k, v, bias, out, lse = res
    do, _ = g
    b, l, d = q.shape
    bq, bk = _bmha_blocks(l, d, jnp.dtype(q.dtype).itemsize)
    hp = _hpad(num_heads)
    dh = d // num_heads
    scale = 1.0 / (dh ** 0.5)
    # per-(row, head) delta = sum_dh(do_h * o_h), padded to the lse layout
    delta = jnp.einsum(
        "blhd,blhd->blh",
        do.astype(jnp.float32).reshape(b, l, num_heads, dh),
        out.astype(jnp.float32).reshape(b, l, num_heads, dh),
    )
    delta = jnp.pad(delta, ((0, 0), (0, 0), (0, hp - num_heads)))
    qspec, kspec, bias_spec, row_spec = _bmha_specs(b, l, d, bq, bk, hp, False)
    dq = pl.pallas_call(
        functools.partial(_bmha_dq_kernel, num_heads=num_heads, scale=scale),
        grid=(b, l // bq, l // bk),
        in_specs=[qspec, kspec, kspec, bias_spec, row_spec, qspec, row_spec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=_interpret(),
    )(q, k, v, bias, lse, do, delta)
    qspec2, kspec2, bias_spec2, row_spec2 = _bmha_specs(b, l, d, bq, bk, hp, True)
    dk, dv = pl.pallas_call(
        functools.partial(_bmha_dkv_kernel, num_heads=num_heads, scale=scale),
        grid=(b, l // bk, l // bq),
        in_specs=[qspec2, kspec2, kspec2, bias_spec2, row_spec2, qspec2, row_spec2],
        out_specs=[kspec2, kspec2],
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        interpret=_interpret(),
    )(q, k, v, bias, lse, do, delta)
    return dq, dk, dv, None


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _bmha(q, k, v, bias, num_heads):
    return _bmha_fwd(q, k, v, bias, num_heads)


def _bmha_fwd_rule(q, k, v, bias, num_heads):
    out, lse = _bmha_fwd(q, k, v, bias, num_heads)
    return (out, lse), (q, k, v, bias, out, lse)


_bmha.defvjp(_bmha_fwd_rule, _bmha_bwd)


def blockwise_mha(q, k, v, bias, num_heads):
    """(B, L, D) blockwise masked MHA, heads = lane sub-ranges of D.

    The long-L path: same layout as :func:`fused_mha` (no head-major tensor
    ever exists in HBM) with k/v streamed blockwise through VMEM, so it runs
    at any L. bias: (B, 1, 1, L) additive padding bias.
    """
    out, _ = _bmha(q, k, v, bias, num_heads)
    return out
