"""Benchmark: training throughput (examples/s/chip) on the flagship config.

Config: BERT4Rec-Beauty scale — 4-layer/256-dim bf16 encoder, tied-softmax
head over a 54,542-item catalog (the measured Amazon Beauty vocabulary,
BASELINE.md), batch 256, max_len 50+3 — i.e. BASELINE.json configs[1] at the
real catalog size. Metric: end-to-end jitted train-step examples/s on one
chip (data + masking generated host-side ahead of time; the step includes
forward, full-catalog CE, backward, Adam).

The reference publishes no numbers (BASELINE.md), so ``vs_baseline``
compares against this repo's first recorded self-measurement
(``BASELINE_EXAMPLES_PER_S``) — the round-1 XLA path on one v5e chip.

Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import time

import jax

# Hardware RNG for dropout: threefry costs ~2.4 ms/step (21%) at this config.
jax.config.update("jax_default_prng_impl", "rbg")
import jax.numpy as jnp

from bert4clickpath_tpu import (
    ClickstreamModel,
    FeatureConfig,
    HeadConfig,
    ModelConfig,
    TrainConfig,
)
from bert4clickpath_tpu.data.generator import ClickStreamGenerator
from bert4clickpath_tpu.data.pipeline import ClozeDataset
from bert4clickpath_tpu.training import schedules
from bert4clickpath_tpu.training.train_state import (
    TrainState,
    make_optimizer,
    make_train_step,
)

# Round-1 first recorded measurement on 1x TPU v5e (this file, XLA path,
# steady-state with the dispatch queue drained — see BASELINE.md).
BASELINE_EXAMPLES_PER_S = 23000.0

N_ITEMS = 54_542  # Amazon Beauty catalog (BASELINE.md)
BATCH = 256
WARMUP = 10
STEPS = 100


def main():
    from bert4clickpath_tpu.parallel.spmd import padded_vocab_rows

    gen = ClickStreamGenerator(n_items=N_ITEMS, session_cohesiveness=200, seed=0)
    vocab = gen.item_vocab()
    cfg = ModelConfig(
        # rows padded to the fused-CE kernel's vocab tile
        features={"items": FeatureConfig(padded_vocab_rows(vocab.model_vocab_size, 1), 256)},
        num_layers=4,
        num_heads=4,
        ffn_dim=1024,
        dropout_rate=0.1,
        max_len=53,
        head=HeadConfig("tied_softmax", output_size=vocab.label_vocab_size),
        dtype="bfloat16",
    )
    model = ClickstreamModel(cfg)

    from bert4clickpath_tpu.data.cloze import stack_batches

    items, _ = gen.generate_sessions(BATCH * 4)
    ds = ClozeDataset(items, vocab, max_items=50)
    it = ds.train_batches(BATCH, seed=0)
    host = [next(it) for _ in range(8)]

    def to_dev(b):
        return {
            "features": {k: jnp.asarray(v) for k, v in b.features.items()},
            "head_positions": jnp.asarray(b.head_positions),
            "labels": jnp.asarray(b.labels),
        }

    batches = [to_dev(b) for b in host]
    # the driver's default training mode: one lax.scan dispatch per STEPS
    # steps, batches resident on device (cycled copies of the 8 host batches)
    stacked = to_dev(stack_batches([host[i % len(host)] for i in range(STEPS)]))

    tcfg = TrainConfig(batch_size=BATCH)
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        batches[0]["features"],
        batches[0]["head_positions"],
    )
    # bf16 Adam first moment: halves the table-moment HBM traffic; measured
    # ~0.09 ms/step off the optimizer chain at this config (KERNELS.md) with
    # no quality effect at these scales.
    tx = make_optimizer(tcfg, mu_dtype=jnp.bfloat16)
    state = TrainState.create(params, tx)
    from bert4clickpath_tpu.training.train_state import make_scan_train_step

    step = make_train_step(
        model,
        tx,
        schedules.constant(1e-3),
        fused_ce_num_valid=vocab.label_vocab_size,
    )
    scan_step = make_scan_train_step(
        model, tx, schedules.constant(1e-3),
        fused_ce_num_valid=vocab.label_vocab_size,
    )
    rng = jax.random.PRNGKey(1)

    import numpy as np

    for i in range(WARMUP):
        state, loss = step(state, batches[i % len(batches)], rng)
    float(np.asarray(loss))  # value fetch forces real completion

    # Two timed windows, report the second. Each window is ONE scan dispatch
    # of STEPS steps (the driver's default training mode) ending in a scalar
    # *fetch* — on the remote-tunnel backend only a value fetch guarantees
    # the queued executions actually finished.
    for _ in range(2):
        t0 = time.perf_counter()
        state, losses = scan_step(state, stacked, rng)
        float(np.asarray(losses[-1]))
        dt = time.perf_counter() - t0

    examples_per_s = BATCH * STEPS / dt
    print(
        json.dumps(
            {
                "metric": "train_examples_per_s_per_chip_beauty_4L256d",
                "value": round(examples_per_s, 1),
                "unit": "examples/s",
                "vs_baseline": round(examples_per_s / BASELINE_EXAMPLES_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
