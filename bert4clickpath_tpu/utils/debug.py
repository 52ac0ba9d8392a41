"""Debug guards: NaN/Inf checking around jitted steps.

The reference hand-guarded one NaN source (empty sub-batches under
MirroredStrategy, losses.py:83-91); this build makes losses guard-free by
construction and instead offers *opt-in* whole-step checking via
``jax.experimental.checkify`` — the SURVEY §5 "race detection / sanitizers"
slot. Use during debugging only; checks add host syncs.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def checked(fn: Callable, *, jit: bool = True) -> Callable:
    """Wrap a function with float-error checkify (NaN/Inf/div/OOB).

    Returns a callable with the same signature that RAISES on the first
    NaN/Inf produced anywhere inside (including kernels' jnp paths).
    """
    cf = checkify.checkify(fn, errors=checkify.float_checks)
    if jit:
        cf = jax.jit(cf)

    def wrapped(*args, **kwargs):
        err, out = cf(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapped


def assert_all_finite(tree, name: str = "tree") -> None:
    """Host-side finite check over a pytree (params, grads, batch)."""
    import numpy as np

    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            raise FloatingPointError(
                f"non-finite values in {name}{jax.tree_util.keystr(path)}"
            )


def finite_guard_step(train_step: Callable) -> Callable:
    """Wrap a train step: after each step, verify the loss is finite and
    raise with the step index if not (cheap — one scalar fetch)."""

    def wrapped(state, batch, rng):
        state, loss = train_step(state, batch, rng)
        lv = float(jax.device_get(loss))
        if not jnp.isfinite(lv):
            raise FloatingPointError(
                f"non-finite loss {lv} at step {int(jax.device_get(state.step))}"
            )
        return state, loss

    return wrapped
