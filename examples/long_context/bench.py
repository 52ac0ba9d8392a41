"""Long-context bench: where the Pallas flash-attention kernel earns its keep.

At the Beauty flagship shape (L=53) attention is <2% of step FLOPs and the
blockwise kernels are neutral-to-negative (KERNELS.md) — they exist for the
long-session degradation path. This bench exercises that path: sessions of
hundreds-to-thousands of events, where XLA's dense attention materializes the
(B, H, L, L) score tensor in HBM every layer (forward AND backward) while the
flash kernel streams it blockwise through VMEM with an online softmax.

Reference anchor: the reference caps sessions at 50 events
(examples/BERT4Rec/data_prep/main.py:58) and computes dense O(L^2) attention
(transformer.py:83-95); long sessions are new capability, not a port.

Usage (real numbers need the TPU chip; CPU works for a smoke run):
  python examples/long_context/bench.py --seq_len 512 --batch 32
  python examples/long_context/bench.py --seq_len 1024 --batch 16 --impls pallas
Prints one ms/step line per (attn_impl, dropout_impl) combination.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_default_prng_impl", "rbg")
import jax.numpy as jnp
from bert4clickpath_tpu.utils.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()  # tunnel compile RPCs can take minutes when congested

import numpy as np

from bert4clickpath_tpu import FeatureConfig, HeadConfig, ModelConfig, TrainConfig
from bert4clickpath_tpu.models.model import ClickstreamModel
from bert4clickpath_tpu.parallel.spmd import padded_vocab_rows
from bert4clickpath_tpu.training import schedules
from bert4clickpath_tpu.training.train_state import (
    TrainState,
    make_optimizer,
    make_train_step,
)

from examples.large_catalog.stress import synthetic_batch


def run_one(cfg, batch_np, attn_impl, dropout_impl, steps, num_valid):
    model = ClickstreamModel(cfg, attn_impl=attn_impl, dropout_impl=dropout_impl)
    batch = {
        "features": {k: jnp.asarray(v) for k, v in batch_np["features"].items()},
        "head_positions": jnp.asarray(batch_np["head_positions"]),
        "labels": jnp.asarray(batch_np["labels"]),
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        batch["features"],
        batch["head_positions"],
    )
    tcfg = TrainConfig(batch_size=batch["labels"].shape[0])
    tx = make_optimizer(tcfg)
    state = TrainState.create(params, tx)
    step = make_train_step(
        model, tx, schedules.constant(1e-3), fused_ce_num_valid=num_valid
    )
    rng = jax.random.PRNGKey(1)
    state, loss = step(state, batch, rng)  # compile
    float(np.asarray(loss))
    t0 = time.perf_counter()
    for _ in range(steps):
        state, loss = step(state, batch, rng)
    lv = float(np.asarray(loss))  # value fetch forces completion (tunnel backend)
    dt = (time.perf_counter() - t0) / steps
    return dt, lv


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--seq_len", type=int, default=512, help="L incl. [CLS]/[SEP]s")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--items", type=int, default=20_000)
    p.add_argument("--d_model", type=int, default=256)
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--heads", type=int, default=4)
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument(
        "--impls", default="xla,pallas",
        help="comma list of attention impls to time",
    )
    p.add_argument(
        "--dropout_impls", default="xla",
        help="comma list of dropout impls to time (cross product with --impls)",
    )
    args = p.parse_args(argv)

    max_items = args.seq_len - 3  # [CLS] [SEP] ... [SEP]
    rows = padded_vocab_rows(args.items + 11, 1)
    cfg = ModelConfig(
        features={"items": FeatureConfig(rows, args.d_model)},
        num_layers=args.layers,
        num_heads=args.heads,
        ffn_dim=4 * args.d_model,
        dropout_rate=args.dropout,
        max_len=args.seq_len,
        positional="learned",
        head=HeadConfig("tied_softmax", output_size=args.items),
        dtype="bfloat16" if jax.default_backend() == "tpu" else "float32",
    )
    scores_mb = (
        args.batch * args.heads * args.seq_len * args.seq_len * 2 / 1e6
    )
    print(
        f"L={args.seq_len} B={args.batch} H={args.heads}: dense (B,H,L,L) "
        f"scores = {scores_mb:.0f} MB bf16 per materialization "
        f"(x{args.layers} layers, fwd+bwd) — flash streams them through VMEM"
    )

    rng = np.random.default_rng(0)
    batch_np = synthetic_batch(rng, args.batch, max_items, 10, args.items)

    results = {}
    for attn in args.impls.split(","):
        for drop in args.dropout_impls.split(","):
            dt, lv = run_one(cfg, batch_np, attn, drop, args.steps, args.items)
            results[(attn, drop)] = dt
            print(
                f"attn={attn:7s} dropout={drop:7s}: {dt * 1e3:8.2f} ms/step "
                f"{args.batch / dt:10,.0f} examples/s (loss {lv:.3f})"
            )
    if ("xla", "xla") in results and ("pallas", "xla") in results:
        speedup = results[("xla", "xla")] / results[("pallas", "xla")]
        print(f"flash-attention speedup at L={args.seq_len}: {speedup:.2f}x")


if __name__ == "__main__":
    main()
