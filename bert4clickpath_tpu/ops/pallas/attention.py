"""Blockwise masked flash attention (Pallas TPU).

The encoder's padding-masked bidirectional attention
(models/encoder.py:scaled_dot_product_attention) as a fused kernel: per
(batch, head, q-block) the k/v sequence streams through VMEM in blocks with
the online-softmax recurrence, so the (B, H, L, L) score tensor never
reaches HBM. At the reference's L≈53 this is one block; the same kernel
degrades gracefully to long sequences (SURVEY.md §5 long-context note —
blockwise-ready, no ring/CP).

Layout: q, k, v are (B, H, L, Dh); the additive padding bias is (B, 1, 1, L)
(ops/masking.py:padding_bias). Forward also emits the per-row logsumexp for
the standard flash backward (dq accumulated over k-blocks; dk/dv over
q-blocks in a second kernel, mirroring ops/pallas/fused_ce.py's split).

Requires L % block == 0 and Dh aligned to the lane tile — the model pads
sequences to multiples of 8 (f32) / 16 (bf16); non-TPU backends run the
interpreter for tests.
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


def _block(l: int, target: int = 128) -> int:
    for t in (target, 64, 32, 16, 8):
        if l % t == 0:
            return t
    return l


# -- forward --------------------------------------------------------------


def _fwd_kernel2(
    q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, acc, m_scr, l_scr, *, scale, nk
):
    j = pl.program_id(3)

    @pl.when(j == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)
        m_scr[:] = jnp.full_like(m_scr, NEG_BIG)
        l_scr[:] = jnp.zeros_like(l_scr)

    q = q_ref[0, 0]
    kk = k_ref[0, 0]
    vv = v_ref[0, 0]
    s = jax.lax.dot_general(
        q, kk, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    s = s + bias_ref[0, 0, 0][None, :].astype(jnp.float32)

    m_prev = m_scr[:]
    l_prev = l_scr[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    p = jnp.exp(s - m_new)  # (Bq, Bk)
    alpha = jnp.exp(m_prev - m_new)
    l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc[:] = acc[:] * alpha + jax.lax.dot_general(
        p.astype(vv.dtype), vv, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:] = m_new
    l_scr[:] = l_new

    @pl.when(j == nk - 1)
    def _finalize():
        o_ref[0, 0] = (acc[:] / l_scr[:]).astype(o_ref.dtype)
        # (bq, 8) broadcast: TPU block tiling needs the trailing sublane dim
        lse_ref[0, 0] = jnp.broadcast_to(
            m_scr[:] + jnp.log(l_scr[:]), lse_ref.shape[2:]
        )


def _flash_fwd(q, k, v, bias):
    b, h, l, dh = q.shape
    bq = _block(l)
    bk = _block(l)
    nk = l // bk
    scale = 1.0 / (dh ** 0.5)
    kernel = functools.partial(_fwd_kernel2, scale=scale, nk=nk)
    out, lse = pl.pallas_call(
        kernel,
        grid=(b, h, l // bq, nk),
        in_specs=[
            pl.BlockSpec(
                (1, 1, bq, dh), lambda b, h, i, j: (b, h, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, bk, dh), lambda b, h, i, j: (b, h, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, bk, dh), lambda b, h, i, j: (b, h, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 1, bk), lambda b, h, i, j: (b, 0, 0, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, bq, dh), lambda b, h, i, j: (b, h, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, bq, 8), lambda b, h, i, j: (b, h, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, l, dh), q.dtype),
            jax.ShapeDtypeStruct((b, h, l, 8), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, dh), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(q, k, v, bias)
    return out, lse


# -- backward -------------------------------------------------------------


def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, bias_ref, lse_ref, do_ref, delta_ref, dq_ref, *, scale
):
    j = pl.program_id(3)

    @pl.when(j == 0)
    def _init():
        dq_ref[:] = jnp.zeros_like(dq_ref)

    q = q_ref[0, 0]
    kk = k_ref[0, 0]
    vv = v_ref[0, 0]
    s = jax.lax.dot_general(
        q, kk, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    s = s + bias_ref[0, 0, 0][None, :].astype(jnp.float32)
    p = jnp.exp(s - lse_ref[0, 0][:, 0:1])  # (Bq, Bk)
    do = do_ref[0, 0].astype(jnp.float32)
    dp = jax.lax.dot_general(
        do, vv.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta_ref[0, 0][:, 0:1]) * scale  # (Bq, Bk)
    dq_ref[0, 0] += jax.lax.dot_general(
        ds.astype(kk.dtype), kk, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, bias_ref, lse_ref, do_ref, delta_ref, dk_ref, dv_ref,
    *, scale,
):
    i = pl.program_id(3)  # q-block index (inner)

    @pl.when(i == 0)
    def _init():
        dk_ref[:] = jnp.zeros_like(dk_ref)
        dv_ref[:] = jnp.zeros_like(dv_ref)

    q = q_ref[0, 0]
    kk = k_ref[0, 0]
    vv = v_ref[0, 0]
    s = jax.lax.dot_general(
        q, kk, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    s = s + bias_ref[0, 0, 0][None, :].astype(jnp.float32)
    p = jnp.exp(s - lse_ref[0, 0][:, 0:1])  # (Bq, Bk)
    do = do_ref[0, 0].astype(jnp.float32)
    dv_ref[0, 0] += jax.lax.dot_general(
        p.astype(do.dtype), do, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)
    dp = jax.lax.dot_general(
        do, vv.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta_ref[0, 0][:, 0:1]) * scale
    dk_ref[0, 0] += jax.lax.dot_general(
        ds.astype(q.dtype), q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dk_ref.dtype)


def _flash_bwd(res, g):
    q, k, v, bias, out, lse = res
    do, _ = g  # cotangents for (out, lse); lse cotangent unused
    b, h, l, dh = q.shape
    bq = _block(l)
    bk = _block(l)
    scale = 1.0 / (dh ** 0.5)
    delta = jnp.sum(out.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)
    delta = jnp.broadcast_to(delta[..., None], (*delta.shape, 8))

    qspec = pl.BlockSpec(
        (1, 1, bq, dh), lambda b, h, i, j: (b, h, i, 0), memory_space=pltpu.VMEM
    )
    kspec = pl.BlockSpec(
        (1, 1, bk, dh), lambda b, h, i, j: (b, h, j, 0), memory_space=pltpu.VMEM
    )
    bspec = pl.BlockSpec(
        (1, 1, 1, bk), lambda b, h, i, j: (b, 0, 0, j), memory_space=pltpu.VMEM
    )
    rowspec = pl.BlockSpec(
        (1, 1, bq, 8), lambda b, h, i, j: (b, h, i, 0), memory_space=pltpu.VMEM
    )
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale),
        grid=(b, h, l // bq, l // bk),
        in_specs=[qspec, kspec, kspec, bspec, rowspec, qspec, rowspec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=_interpret(),
    )(q, k, v, bias, lse, do, delta)

    # swapped grid: (b, h, kv-block, q-block) so dk/dv accumulate innermost
    qspec2 = pl.BlockSpec(
        (1, 1, bq, dh), lambda b, h, j, i: (b, h, i, 0), memory_space=pltpu.VMEM
    )
    kspec2 = pl.BlockSpec(
        (1, 1, bk, dh), lambda b, h, j, i: (b, h, j, 0), memory_space=pltpu.VMEM
    )
    bspec2 = pl.BlockSpec(
        (1, 1, 1, bk), lambda b, h, j, i: (b, 0, 0, j), memory_space=pltpu.VMEM
    )
    rowspec2 = pl.BlockSpec(
        (1, 1, bq, 8), lambda b, h, j, i: (b, h, i, 0), memory_space=pltpu.VMEM
    )
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale),
        grid=(b, h, l // bk, l // bq),
        in_specs=[qspec2, kspec2, kspec2, bspec2, rowspec2, qspec2, rowspec2],
        out_specs=[kspec2, kspec2],
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        interpret=_interpret(),
    )(q, k, v, bias, lse, do, delta)
    return dq, dk, dv, None


@jax.custom_vjp
def _flash(q, k, v, bias):
    return _flash_fwd(q, k, v, bias)


def _flash_fwd_rule(q, k, v, bias):
    out, lse = _flash_fwd(q, k, v, bias)
    return (out, lse), (q, k, v, bias, out, lse)


_flash.defvjp(_flash_fwd_rule, _flash_bwd)


def flash_attention(q, k, v, bias):
    """(B, H, L, Dh) fused masked attention. bias: (B, 1, 1, L) additive."""
    out, _ = _flash(q, k, v, bias)
    return out


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
    ``flash_attention`` (blockwise) instead — see ``fused_mha_supported``.
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
