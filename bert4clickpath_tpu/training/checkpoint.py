"""Orbax checkpointing + transfer learning + self-contained export.

Covers the reference's three persistence mechanisms (SURVEY.md §5):
1. periodic best-checkpoint save (Keras ModelCheckpoint, source/main.py:137-142)
   -> :func:`save_checkpoint` with step-named subdirs + ``latest``/``best``;
2. best-model serving export (BestModelSaverCallback, training_utils.py:62-74)
   -> :func:`export_serving` bundles params + ModelConfig JSON + vocab
   artifacts, preserving the reference's "self-contained SavedModel" property
   without string ops in the graph;
3. warm-start / fine-tune (create_model(ckpt_dir), source/main.py:100-120)
   -> :func:`restore_params` (full) and :func:`restore_encoder` (encoder +
   embeddings only, new head — the transfer-learning path promised in the
   reference README.md:26-27).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from bert4clickpath_tpu.config import ModelConfig


_CHECKPOINTER: Optional[ocp.StandardCheckpointer] = None


def _ckptr() -> ocp.StandardCheckpointer:
    global _CHECKPOINTER
    if _CHECKPOINTER is None:
        _CHECKPOINTER = ocp.StandardCheckpointer()
    return _CHECKPOINTER


def save_checkpoint(
    directory: str, state: Any, step: int, block: bool = True,
    keep: Optional[int] = None,
) -> str:
    """Save a full TrainState under ``directory/step_<N>``.

    Orbax commits asynchronously; ``block=False`` overlaps the write with the
    next training epoch (the orbax async-checkpoint pattern), ``block=True``
    waits for the atomic rename.

    keep: retain at most this many checkpoints in ``directory`` INCLUDING
    the one being saved (None/0 = keep everything — the reference's
    timestamped ``ModelCheckpoint`` accumulation, source/main.py:137-142,
    which ran to ~10 GB per Beauty run). Pruning happens after the
    previous async save's commit (the wait below), so only committed
    ``step_*`` dirs are ever deleted.
    """
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"step_{step:08d}")
    c = _ckptr()
    c.wait_until_finished()  # at most one async save in flight
    if keep:
        prune_checkpoints(directory, max(keep - 1, 0))
    c.save(path, state, force=True)
    if block:
        c.wait_until_finished()
    return path


def prune_checkpoints(directory: str, keep: int) -> list[str]:
    """Delete the oldest committed ``step_*`` checkpoints, keeping the
    newest ``keep``. Orbax writes to a tmp-suffixed dir and renames on
    commit, so the ``step_<N>`` fullmatch only ever selects committed
    checkpoints. Returns the removed paths."""
    import shutil

    directory = os.path.abspath(directory)
    if not os.path.isdir(directory):
        return []
    steps = sorted(
        (int(m.group(1)), name)
        for name in os.listdir(directory)
        if (m := re.fullmatch(r"step_(\d+)", name))
    )
    removed = []
    for _, name in steps[: max(len(steps) - keep, 0)]:
        p = os.path.join(directory, name)
        shutil.rmtree(p, ignore_errors=True)
        removed.append(p)
    return removed


def wait_until_finished() -> None:
    _ckptr().wait_until_finished()


def latest_checkpoint(directory: str) -> Optional[str]:
    directory = os.path.abspath(directory)
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        m = re.fullmatch(r"step_(\d+)", name)
        if m:
            steps.append((int(m.group(1)), name))
    if not steps:
        return None
    return os.path.join(directory, max(steps)[1])


def restore_state(path: str, abstract_state: Any) -> Any:
    """Restore a TrainState saved by :func:`save_checkpoint`.

    ``abstract_state`` is a matching pytree (e.g. a freshly created state or
    ``jax.eval_shape`` output) providing structure/shapes/shardings.
    """
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, abstract_state)
    return _ckptr().restore(path, abstract)


def save_params(path: str, params: Any) -> None:
    c = _ckptr()
    c.save(os.path.abspath(path), params, force=True)
    c.wait_until_finished()


def restore_params(path: str, abstract_params: Any) -> Any:
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, abstract_params)
    return _ckptr().restore(os.path.abspath(path), abstract)


def restore_encoder(path: str, init_params: Any) -> Any:
    """Transfer learning: load encoder + embedding subtrees from ``path``,
    keep everything else (the new head) freshly initialized.

    Matches the reference contract that the pretrained encoder + embeddings
    can be reused under a different head (source/main.py:100-120; named
    embedding layer, constants.py:35-39).
    """
    restored = restore_params(path, init_params_like_subset(init_params))
    out = jax.tree.map(lambda x: x, init_params)  # copy
    for key, sub in restored["params"].items():
        out["params"][key] = sub
    return out


def init_params_like_subset(init_params: Any) -> Any:
    """The encoder/embedding subset of a param tree (what transfer restores)."""
    subset = {"params": {}}
    for key, sub in init_params["params"].items():
        if key == "encoder" or key.startswith("embed_") or key == "positions":
            subset["params"][key] = sub
    return subset


# -- self-contained serving export ---------------------------------------


def export_serving(
    directory: str,
    params: Any,
    model_config: ModelConfig,
    vocabs: dict[str, Any],
) -> str:
    """Bundle everything needed to serve from strings: params + config +
    vocab artifacts. The TPU-native equivalent of the reference's SavedModel
    with baked-in lookup tables (clickstream_transformer.py:354-375)."""
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    with open(os.path.join(directory, "model_config.json"), "w") as f:
        f.write(model_config.to_json())
    for name, vocab in vocabs.items():
        vocab.save_artifact(directory, name)
    save_params(os.path.join(directory, "params"), params)
    with open(os.path.join(directory, "MANIFEST.json"), "w") as f:
        json.dump({"vocabs": sorted(vocabs), "format": 1}, f)
    return directory
