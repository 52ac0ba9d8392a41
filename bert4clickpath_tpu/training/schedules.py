"""Learning-rate schedules.

Ports the reference's two custom schedules (training_utils.py:15-59) as pure
``step -> lr`` functions; the Vaswani rsqrt schedule has the reference's
double-``scale`` bug (training_utils.py:34-36) fixed — scale applies once.
Plateau-driven decay is handled by the trainer via the ``lr_scale`` state
field, not inside the schedule.
"""

from __future__ import annotations

import jax.numpy as jnp


def constant(lr: float):
    def schedule(step):
        return jnp.full((), lr, jnp.float32)

    return schedule


def rsqrt_warmup(d_model: int, warmup_steps: int = 4000, scale: float = 1.0):
    """lr = scale * rsqrt(d_model) * min(rsqrt(step), step * warmup^-1.5)."""

    def schedule(step):
        step = jnp.maximum(jnp.asarray(step, jnp.float32), 1.0)
        arg1 = 1.0 / jnp.sqrt(step)
        arg2 = step * (warmup_steps ** -1.5)
        return scale * (1.0 / jnp.sqrt(jnp.float32(d_model))) * jnp.minimum(arg1, arg2)

    return schedule


def warmup_constant(lr: float, warmup_steps: int = 1000):
    """Linear warmup to ``lr``, then constant.

    The reference's parity config trains at a flat 1e-3 for its whole run
    (source/main.py:87) and ranking quality keeps improving late under it;
    rsqrt decay starves larger configs of late-stage LR on this task. The
    short warmup is the only concession deeper/wider encoders need."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = jnp.minimum(step / jnp.maximum(float(warmup_steps), 1.0), 1.0)
        return jnp.full((), lr, jnp.float32) * warm

    return schedule


def exponential_decay_to_floor(
    initial_lr: float, floor_lr: float, decay_steps: int, decay_rate: float
):
    """Decay toward a floor LR (reference CustomExponentialDecayLR,
    training_utils.py:39-59)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        return (initial_lr - floor_lr) * jnp.power(
            decay_rate, step / decay_steps
        ) + floor_lr

    return schedule


def from_config(cfg, d_model: int):
    """Build a schedule from a TrainConfig."""
    if cfg.lr_schedule == "constant":
        return constant(cfg.learning_rate)
    if cfg.lr_schedule == "rsqrt_warmup":
        return rsqrt_warmup(d_model, cfg.warmup_steps, scale=1.0)
    if cfg.lr_schedule == "warmup_constant":
        return warmup_constant(cfg.learning_rate, cfg.warmup_steps)
    if cfg.lr_schedule == "exp_decay":
        return exponential_decay_to_floor(
            cfg.learning_rate, cfg.learning_rate * 0.01, cfg.steps_per_epoch, 0.9
        )
    raise ValueError(f"unknown lr_schedule {cfg.lr_schedule!r}")
