"""Streaming masked metrics as psum-able accumulator pytrees.

Replaces the reference's Keras metric objects (ClozeMaskedRecall /
ClozeMaskedNDCG, source/utils.py:137-259; binary metrics, metrics.py:5-106)
with pure functions: each ``*_stats`` returns a dict of scalar **sums** plus a
count; accumulate with :func:`merge`, reduce across the mesh with
``jax.lax.psum`` (or host-side :func:`merge` over per-step dicts), and read
rates with :func:`finalize`. This is the streaming-metric pattern that
composes with jit/pjit, unlike stateful metric objects.
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

import jax
import jax.numpy as jnp

from bert4clickpath_tpu.constants import LABEL_PAD


def _mask(labels: jnp.ndarray) -> jnp.ndarray:
    return (labels != LABEL_PAD).astype(jnp.float32)


def ranking_stats(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    ks: Sequence[int] = (5, 10),
) -> dict[str, jnp.ndarray]:
    """Recall@k and NDCG@k sums for single-ground-truth ranking.

    logits: (B, P, V); labels: (B, P) int with LABEL_PAD fill.

    Cloze assumption from the reference (utils.py:140-143): each masked
    position has exactly one true item, so IDCG = 1/log2(2) = 1 and
    NDCG reduces to 1/log2(rank+2) if the true item ranks within k
    (utils.py:225-233,250).
    """
    mask = _mask(labels)
    kmax = min(max(ks), logits.shape[-1])  # clamp for tiny test vocabularies
    _, topk = jax.lax.top_k(logits, kmax)  # (B, P, kmax)
    hit = (topk == labels[..., None]).astype(jnp.float32)  # one-hot over rank
    # discount[r] = 1/log2(r+2), reference utils.py:211
    discounts = 1.0 / (jnp.log(jnp.arange(2, kmax + 2, dtype=jnp.float32)) / jnp.log(2.0))
    stats: dict[str, jnp.ndarray] = {"n": jnp.sum(mask)}
    for k in ks:
        kk = min(k, kmax)
        stats[f"recall@{k}_sum"] = jnp.sum(jnp.sum(hit[..., :kk], axis=-1) * mask)
        stats[f"ndcg@{k}_sum"] = jnp.sum(
            jnp.sum(hit[..., :kk] * discounts[:kk], axis=-1) * mask
        )
    return stats


def masked_accuracy_stats(logits: jnp.ndarray, labels: jnp.ndarray) -> dict:
    """Top-1 accuracy sum over non-pad positions."""
    mask = _mask(labels)
    pred = jnp.argmax(logits, axis=-1)
    correct = (pred == labels).astype(jnp.float32) * mask
    return {"n": jnp.sum(mask), "accuracy_sum": jnp.sum(correct)}


def binary_stats(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    threshold: float = 0.5,
) -> dict[str, jnp.ndarray]:
    """Streaming counts for binary tasks over (B, P) logits / {0,1,-1} labels.

    Covers the reference's PositiveRate (metrics.py:5-26), PredictedPositives
    (metrics.py:29-51, threshold 0.5), and F1Score (metrics.py:54-86) in one
    pass. Predictions threshold the *sigmoid* of the logit.
    """
    mask = _mask(labels)
    labels_f = jnp.where(mask > 0, labels.astype(jnp.float32), 0.0)
    pred = (jax.nn.sigmoid(logits.astype(jnp.float32)) >= threshold).astype(
        jnp.float32
    ) * mask
    tp = jnp.sum(pred * labels_f)
    return {
        "n": jnp.sum(mask),
        "positives_sum": jnp.sum(labels_f),
        "pred_positives_sum": jnp.sum(pred),
        "tp_sum": tp,
    }


def masked_metric(fn, name: str):
    """Turn any per-position metric fn into a pad-masked streaming stat.

    The functional analogue of the reference's generic ``MaskedMetric``
    Keras wrapper (metrics.py:89-106), which forwarded ``labels != LABEL_PAD``
    as the inner metric's sample_weight. Here ``fn(logits, labels) -> (B, P)``
    per-position values; padded positions are zeroed and the masked sum is
    emitted as ``{name}_sum`` alongside ``n``, so the result accumulates with
    :func:`merge` / :func:`psum_stats` and reads out via :func:`finalize`
    exactly like the built-in stats.

        top3 = masked_metric(
            lambda lg, lb: (jnp.argsort(-lg, -1)[..., :3] == lb[..., None]).any(-1),
            "top3_acc",
        )
        stats = top3(logits, labels)   # {"n": ..., "top3_acc_sum": ...}
    """

    def stats_fn(logits: jnp.ndarray, labels: jnp.ndarray) -> dict:
        mask = _mask(labels)
        vals = jnp.asarray(fn(logits, labels), jnp.float32)
        if vals.shape != labels.shape:
            raise ValueError(
                f"metric fn for {name!r} returned shape {vals.shape}; "
                f"expected per-position values of shape {labels.shape}"
            )
        return {"n": jnp.sum(mask), f"{name}_sum": jnp.sum(vals * mask)}

    return stats_fn


def merge(*stats: Mapping[str, jnp.ndarray]) -> dict:
    """Elementwise-add accumulators (host or device side)."""
    out = dict(stats[0])
    for s in stats[1:]:
        for k, v in s.items():
            out[k] = out[k] + v if k in out else v
    return out


def psum_stats(stats: Mapping[str, jnp.ndarray], axis_name: str) -> dict:
    return {k: jax.lax.psum(v, axis_name) for k, v in stats.items()}


def finalize(stats: Mapping[str, jnp.ndarray]) -> dict[str, float]:
    """Turn sums into rates: every ``*_sum`` key divided by ``n``."""
    n = float(stats["n"])
    out: dict[str, float] = {"n": n}
    denom = max(n, 1.0)
    for k, v in stats.items():
        if k.endswith("_sum"):
            out[k[: -len("_sum")]] = float(v) / denom
    # Derived binary metrics (reference F1: metrics.py:80-81)
    if "tp_sum" in stats:
        tp = float(stats["tp_sum"])
        denom_f1 = float(stats["positives_sum"]) + float(stats["pred_positives_sum"])
        out["f1"] = 2.0 * tp / denom_f1 if denom_f1 > 0 else 0.0
    return out
