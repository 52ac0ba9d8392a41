"""Masked-loss tests vs hand-computed values.

Oracle values mirror the reference MaskedLoss semantics (losses.py:31-98):
mean of per-item losses over non-pad positions, with the pos_weight
normalization of losses.py:94-96; plus the all-pad (empty batch) guard."""

import jax.numpy as jnp
import numpy as np
import pytest

from bert4clickpath_tpu.ops.losses import (
    masked_binary_cross_entropy,
    masked_mean,
    masked_softmax_cross_entropy,
)


def _softmax_nll(logits, label):
    logits = np.asarray(logits, np.float64)
    z = np.log(np.sum(np.exp(logits)))
    return z - logits[label]


def test_masked_mean_ignores_pads():
    losses = jnp.array([[1.0, 2.0], [3.0, 4.0]])
    labels = jnp.array([[5, -1], [7, 8]])
    got = masked_mean(losses, labels)
    assert np.isclose(got, (1.0 + 3.0 + 4.0) / 3.0)


def test_masked_mean_empty_batch_guard():
    # All-pad labels must give 0, not NaN (reference losses.py:83-91).
    losses = jnp.ones((2, 3))
    labels = jnp.full((2, 3), -1)
    assert float(masked_mean(losses, labels)) == 0.0


def test_softmax_ce_matches_hand_value():
    logits = np.array(
        [[[2.0, 0.5, -1.0], [0.1, 0.2, 0.3]], [[1.0, 1.0, 1.0], [0.0, 0.0, 9.0]]],
        np.float32,
    )
    labels = np.array([[0, -1], [2, 2]])
    want = (
        _softmax_nll(logits[0, 0], 0)
        + _softmax_nll(logits[1, 0], 2)
        + _softmax_nll(logits[1, 1], 2)
    ) / 3.0
    got = float(masked_softmax_cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    assert np.isclose(got, want, rtol=1e-5)


def test_softmax_ce_all_pad_is_zero():
    logits = jnp.zeros((2, 3, 5))
    labels = jnp.full((2, 3), -1)
    assert float(masked_softmax_cross_entropy(logits, labels)) == 0.0


def _bce(logit, z):
    # stable bce-with-logits reference
    x = float(logit)
    return max(x, 0.0) - x * z + np.log1p(np.exp(-abs(x)))


def test_binary_ce_hand_value():
    logits = np.array([[0.3, -1.2, 2.0]], np.float32)
    labels = np.array([[1, 0, -1]])
    want = (_bce(0.3, 1) + _bce(-1.2, 0)) / 2.0
    got = float(masked_binary_cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    assert np.isclose(got, want, rtol=1e-5)


def test_binary_ce_pos_weight_normalization():
    # pos_weight w: positives weighted w, negatives 1, result divided by
    # (w+1)/2 (reference losses.py:71-73,94-96).
    logits = np.array([[0.3, -1.2]], np.float32)
    labels = np.array([[1, 0]])
    w = 3.0
    raw = (w * _bce(0.3, 1) + _bce(-1.2, 0)) / 2.0
    want = raw / ((w + 1) / 2)
    got = float(
        masked_binary_cross_entropy(
            jnp.asarray(logits), jnp.asarray(labels), pos_weight=w
        )
    )
    assert np.isclose(got, want, rtol=1e-5)


@pytest.mark.parametrize("pad_label", [0, 4])
def test_pad_positions_never_leak(pad_label):
    # Whatever garbage sits in logits at padded positions must not affect
    # the loss (the reference shifted pads to class 0 first, losses.py:57-58).
    logits = np.zeros((1, 2, 5), np.float32)
    labels = np.array([[pad_label, -1]])
    base = float(masked_softmax_cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    logits2 = logits.copy()
    logits2[0, 1] = 1e3  # perturb only the padded position
    got = float(masked_softmax_cross_entropy(jnp.asarray(logits2), jnp.asarray(labels)))
    assert np.isclose(base, got)
