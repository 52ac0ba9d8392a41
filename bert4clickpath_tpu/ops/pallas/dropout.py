"""Fused dropout (Pallas TPU): in-kernel PRNG, no materialized masks.

The XLA dropout path materializes per-element random bits and a keep-mask in
HBM and re-reads the mask in the backward — at the flagship config that is
~50 MB × several dropout sites × fwd+bwd of pure mask traffic per step
(visible as u32/pred copies in traces, KERNELS.md). This kernel seeds the
per-core PRNG inside the kernel (seed mixed with the grid position),
generates bits in VMEM, and the custom VJP *regenerates the identical mask*
in the backward from the same seed — zero mask bytes ever touch HBM.

    y = fused_dropout(x, seed, rate)            # scaled (inverted) dropout
    d/dx = regenerate(seed) -> g * keep / (1-rate)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _row_tile(n: int) -> int:
    for t in (1024, 512, 256, 128, 64, 32, 16, 8):
        if n % t == 0:
            return t
    return n


def _mask_kernel_body(seed_ref, shape):
    """Seed per grid step and draw keep-bits for this block."""
    i = pl.program_id(0)
    # golden-ratio mix of the grid position into the seed (int32-safe)
    mixed = seed_ref[0, 0] ^ (i * jnp.int32(0x61C88647))
    pltpu.prng_seed(mixed)
    # prng_random_bits returns int32 on TPU — bitcast for unsigned compare
    return pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)


def _make_kernel(threshold, inv_keep):
    def kernel(seed_ref, x_ref, o_ref):
        bits = _mask_kernel_body(seed_ref, x_ref.shape)
        keep = bits > jnp.uint32(threshold)
        scaled = (x_ref[:].astype(jnp.float32) * inv_keep).astype(o_ref.dtype)
        o_ref[:] = jnp.where(keep, scaled, jnp.zeros_like(scaled))

    return kernel


def _apply(x2d, seed, rate):
    n, d = x2d.shape
    tn = _row_tile(n)
    # keep iff bits > threshold: P(keep) = 1 - rate over uint32 range
    threshold = min(int(rate * 4294967296.0), 4294967295)
    if _interpret():
        # non-TPU fallback: same semantics (threshold on uint32 bits,
        # deterministic in seed), jax.random instead of the in-kernel PRNG
        # (pltpu.prng_seed has no CPU interpret lowering).
        key = jax.random.fold_in(jax.random.PRNGKey(0), seed.astype(jnp.uint32))
        bits = jax.random.bits(key, (n, d), jnp.uint32)
        keep = bits > jnp.uint32(threshold)
        scaled = (x2d.astype(jnp.float32) / (1.0 - rate)).astype(x2d.dtype)
        return jnp.where(keep, scaled, jnp.zeros_like(scaled))
    kernel = _make_kernel(threshold, 1.0 / (1.0 - rate))
    return pl.pallas_call(
        kernel,
        grid=(n // tn,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tn, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tn, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, d), x2d.dtype),
        interpret=_interpret(),
    )(jnp.reshape(seed.astype(jnp.int32), (1, 1)), x2d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_dropout(x, seed, rate: float):
    """Inverted dropout with in-kernel PRNG. x: any shape with last dim D;
    seed: int32 scalar (derive per-site from the flax rng); rate in [0, 1)."""
    if rate <= 0.0:
        return x
    shape = x.shape
    out = _apply(x.reshape(-1, shape[-1]), seed, rate)
    return out.reshape(shape)


def _fd_fwd(x, seed, rate):
    return fused_dropout(x, seed, rate), seed


def _fd_bwd(rate, seed, g):
    # identical seed -> identical mask; dropout is linear in x
    return fused_dropout(g, seed, rate), None


fused_dropout.defvjp(_fd_fwd, _fd_bwd)
