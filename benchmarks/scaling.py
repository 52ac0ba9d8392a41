"""Scaling benchmark: examples/s across mesh shapes (1 chip / 1 host / N hosts).

Runs the SPMD train step over every requested mesh shape and reports
examples/s plus scaling efficiency vs the smallest shape — the BASELINE.md
"≥80% examples/s scaling" measurement hook. On a pod slice this measures
real ICI/DCN scaling; on one chip or a virtual CPU mesh it validates the
mechanics only.

  python benchmarks/scaling.py --meshes 1x1,2x1,4x1,4x2 --items 54542
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from bert4clickpath_tpu import FeatureConfig, HeadConfig, MeshConfig, ModelConfig, TrainConfig
from bert4clickpath_tpu.data.generator import ClickStreamGenerator
from bert4clickpath_tpu.data.pipeline import ClozeDataset
from bert4clickpath_tpu.parallel import spmd
from bert4clickpath_tpu.parallel.mesh import make_mesh
from bert4clickpath_tpu.training import schedules
from bert4clickpath_tpu.training.train_state import TrainState, make_optimizer


def run_mesh(data_axis, model_axis, args, gen, vocab):
    mesh = make_mesh(
        MeshConfig(data=data_axis, model=model_axis),
        devices=jax.devices()[: data_axis * model_axis],
    )
    rows = spmd.padded_vocab_rows(vocab.model_vocab_size, model_axis)
    cfg = ModelConfig(
        features={"items": FeatureConfig(rows, args.d_model)},
        num_layers=args.layers,
        num_heads=4,
        ffn_dim=4 * args.d_model,
        max_len=args.max_items + 3,
        head=HeadConfig("tied_softmax", output_size=vocab.label_vocab_size),
        dtype="bfloat16" if jax.default_backend() == "tpu" else "float32",
    )
    from bert4clickpath_tpu.models.model import ClickstreamModel

    model = ClickstreamModel(cfg)
    per_device_batch = args.per_device_batch
    batch = per_device_batch * data_axis
    items, _ = gen.generate_sessions(batch * 2)
    ds = ClozeDataset(items, vocab, max_items=args.max_items)
    b = next(ds.train_batches(batch, seed=0))
    device_batch = {
        "features": {k: jnp.asarray(v) for k, v in b.features.items()},
        "head_positions": jnp.asarray(b.head_positions),
        "labels": jnp.asarray(b.labels),
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        device_batch["features"],
        device_batch["head_positions"],
    )["params"]
    tcfg = TrainConfig()
    tx = make_optimizer(tcfg)
    state = spmd.shard_state(TrainState.create(params, tx), mesh, cfg)
    step = spmd.make_spmd_train_step(
        cfg, mesh, tx, schedules.constant(1e-3), vocab.label_vocab_size
    )
    sb = spmd.shard_batch(device_batch, mesh, cfg)
    rng = jax.random.PRNGKey(1)
    for _ in range(max(1, args.warmup)):  # >=1: 'loss' must exist for the sync
        state, loss = step(state, sb, rng)
    float(np.asarray(loss))
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, loss = step(state, sb, rng)
    float(np.asarray(loss))
    dt = (time.perf_counter() - t0) / args.steps
    return {
        "mesh": f"{data_axis}x{model_axis}",
        "devices": data_axis * model_axis,
        "global_batch": batch,
        "ms_per_step": round(dt * 1e3, 3),
        "examples_per_s": round(batch / dt, 1),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--meshes", default="", help="e.g. 1x1,2x1,4x2 (default: all devices DP)")
    p.add_argument("--items", type=int, default=54_542)
    p.add_argument("--d_model", type=int, default=256)
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--per_device_batch", type=int, default=256)
    p.add_argument("--max_items", type=int, default=50)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--warmup", type=int, default=5)
    args = p.parse_args()

    gen = ClickStreamGenerator(n_items=args.items, session_cohesiveness=200, seed=0)
    vocab = gen.item_vocab()
    if args.meshes:
        shapes = [tuple(map(int, m.split("x"))) for m in args.meshes.split(",")]
    else:
        shapes = [(len(jax.devices()), 1)]
    results = [run_mesh(d, m, args, gen, vocab) for d, m in shapes]
    base = results[0]
    for r in results:
        ideal = base["examples_per_s"] * r["devices"] / base["devices"]
        r["scaling_efficiency"] = round(r["examples_per_s"] / ideal, 3)
        print(json.dumps(r))


if __name__ == "__main__":
    main()
