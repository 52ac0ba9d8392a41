"""Per-kernel device-time profile of the flagship train step.

Produces the KERNELS.md accounting in one command: runs the bench.py config
(4L/256d bf16 tied-softmax over the Beauty-sized catalog) under
``jax.profiler``, walks the xplane.pb with utils/xplane (no xprof converter
in this image), and prints per-kernel device ms/step plus the analytic
roofline. The impl/optimizer knobs let each round-2 lever (fused gather,
flash attention, fused dropout, bf16 Adam moments) be measured as a delta
against the same baseline command.

Usage (real chip):
  python benchmarks/profile_step.py --steps 50
  python benchmarks/profile_step.py --steps 50 --embed_impl pallas --mu_dtype bfloat16
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_default_prng_impl", "rbg")
import jax.numpy as jnp
import numpy as np

from bert4clickpath_tpu.utils.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()  # tunnel compile RPCs can take minutes when congested

from bert4clickpath_tpu import FeatureConfig, HeadConfig, ModelConfig, TrainConfig
from bert4clickpath_tpu.data.generator import ClickStreamGenerator
from bert4clickpath_tpu.data.pipeline import ClozeDataset
from bert4clickpath_tpu.models.model import ClickstreamModel
from bert4clickpath_tpu.parallel.spmd import padded_vocab_rows
from bert4clickpath_tpu.training import schedules
from bert4clickpath_tpu.training.train_state import (
    TrainState,
    make_optimizer,
    make_train_step,
)
from bert4clickpath_tpu.utils import profiling

N_ITEMS = 54_542  # Amazon Beauty catalog (BASELINE.md)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--warmup", type=int, default=10)
    p.add_argument("--d_model", type=int, default=256)
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--attn_impl", default="xla", choices=["xla", "xla_4d", "pallas"])
    p.add_argument("--dropout_impl", default="xla", choices=["xla", "pallas"])
    p.add_argument("--embed_impl", default="xla", choices=["xla", "pallas"])
    p.add_argument("--mu_dtype", default="float32", choices=["float32", "bfloat16"])
    p.add_argument("--qkv_fused", action="store_true")
    p.add_argument("--tied_bias", action="store_true",
                   help="smoke/measure the bias variants of the CE kernels")
    p.add_argument("--ce_row_tile", type=int, default=0, help="fused-CE Tn override")
    p.add_argument("--ce_vocab_tile", type=int, default=0, help="fused-CE Tv override")
    p.add_argument("--logdir", default="/tmp/profile_step")
    p.add_argument("--top", type=int, default=30)
    args = p.parse_args(argv)
    if args.ce_row_tile:
        os.environ["B4CP_CE_ROW_TILE"] = str(args.ce_row_tile)
    if args.ce_vocab_tile:
        os.environ["B4CP_CE_VOCAB_TILE"] = str(args.ce_vocab_tile)

    gen = ClickStreamGenerator(n_items=N_ITEMS, session_cohesiveness=200, seed=0)
    vocab = gen.item_vocab()
    cfg = ModelConfig(
        features={
            "items": FeatureConfig(padded_vocab_rows(vocab.model_vocab_size, 1), args.d_model)
        },
        num_layers=args.layers,
        num_heads=4,
        ffn_dim=4 * args.d_model,
        dropout_rate=args.dropout,
        max_len=53,
        head=HeadConfig("tied_softmax", output_size=vocab.label_vocab_size,
                        tied_bias=args.tied_bias),
        dtype="bfloat16" if jax.default_backend() == "tpu" else "float32",
        qkv_fused=args.qkv_fused,
    )
    model = ClickstreamModel(
        cfg,
        attn_impl=args.attn_impl,
        dropout_impl=args.dropout_impl,
        embed_impl=args.embed_impl,
    )

    items, _ = gen.generate_sessions(args.batch * 4)
    ds = ClozeDataset(items, vocab, max_items=50)
    it = ds.train_batches(args.batch, seed=0)
    batches = []
    for _ in range(4):
        b = next(it)
        batches.append(
            {
                "features": {k: jnp.asarray(v) for k, v in b.features.items()},
                "head_positions": jnp.asarray(b.head_positions),
                "labels": jnp.asarray(b.labels),
            }
        )

    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        batches[0]["features"],
        batches[0]["head_positions"],
    )
    tx = make_optimizer(TrainConfig(batch_size=args.batch), mu_dtype=jnp.dtype(args.mu_dtype))
    state = TrainState.create(params, tx)
    step = make_train_step(
        model, tx, schedules.constant(1e-3), fused_ce_num_valid=vocab.label_vocab_size
    )
    rng = jax.random.PRNGKey(1)

    for i in range(max(1, args.warmup)):  # >=1: compile outside the trace
        state, loss = step(state, batches[i % len(batches)], rng)
    float(np.asarray(loss))  # drain the dispatch queue (tunnel backend)

    t0 = time.perf_counter()
    with profiling.trace(args.logdir):
        for i in range(args.steps):
            state, loss = step(state, batches[i % len(batches)], rng)
        float(np.asarray(loss))
    wall = (time.perf_counter() - t0) / args.steps

    # one parse of the (tens-of-MB) trace: full-plane totals for the sum,
    # top-N of the same dict for the table
    from bert4clickpath_tpu.utils.xplane import latest_xplane_pb, plane_kernel_totals

    with open(latest_xplane_pb(args.logdir), "rb") as f:
        totals = plane_kernel_totals(f.read())
    device_total = sum(totals.values()) / 1e9 / args.steps
    rows = [
        (name, ps / 1e9 / args.steps)
        for name, ps in sorted(totals.items(), key=lambda kv: -kv[1])[: args.top]
    ]
    print(
        f"\nconfig: attn={args.attn_impl} dropout_impl={args.dropout_impl} "
        f"embed={args.embed_impl} mu={args.mu_dtype} qkv_fused={args.qkv_fused} "
        f"ce_tiles=({args.ce_row_tile},{args.ce_vocab_tile}) B={args.batch}"
    )
    print(f"wall: {wall * 1e3:.2f} ms/step   device plane total: {device_total:.2f} ms/step")
    print(f"{'device ms/step':>14s}  kernel")
    for name, ms in rows:
        print(f"{ms:14.3f}  {name[:100]}")

    cost = profiling.step_cost(cfg, args.batch, vocab.label_vocab_size)
    if device_total > 0:
        sol = profiling.speed_of_light(cost, device_total / 1e3)
        print("\nroofline vs device-plane time:", sol)
    else:
        # no TPU plane in the trace (CPU run) — report against wall clock
        sol = profiling.speed_of_light(cost, wall)
        print("\nroofline vs WALL time (no TPU plane in trace):", sol)


if __name__ == "__main__":
    main()
