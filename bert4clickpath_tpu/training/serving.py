"""String-in serving shim over an exported bundle.

The reference's headline serving property — "strings in, scores out, vocab
travels with the model" (SavedModel export, clickstream_transformer.py:354-375
+ training_utils.py:68-74) — preserved TPU-natively: the exported bundle
(:func:`bert4clickpath_tpu.training.checkpoint.export_serving`) carries
params + ModelConfig + vocab artifacts, and this shim does the tiny host-side
string->id step before a jitted forward.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from bert4clickpath_tpu.config import ModelConfig
from bert4clickpath_tpu.data.cloze import ITEM_OFFSET, token_length
from bert4clickpath_tpu.constants import CLS_ID, MASK_ID, PAD_ID, SEP_ID
from bert4clickpath_tpu.models.model import ClickstreamModel
from bert4clickpath_tpu.training import checkpoint as ckpt_lib
from bert4clickpath_tpu.vocab import Vocabulary


class ServingModel:
    """Load an exported bundle and score item sequences from raw strings."""

    def __init__(self, export_dir: str):
        export_dir = os.path.abspath(export_dir)
        with open(os.path.join(export_dir, "model_config.json")) as f:
            self.config = ModelConfig.from_json(f.read())
        with open(os.path.join(export_dir, "MANIFEST.json")) as f:
            manifest = json.load(f)
        self.vocabs = {
            name: Vocabulary.load_artifact(export_dir, name)
            for name in manifest["vocabs"]
        }
        self.model = ClickstreamModel(self.config)
        # Build abstract params by tracing init, then restore real values.
        feature = next(iter(self.config.features))
        dummy_feats = {
            n: jnp.zeros((1, self.config.max_len), jnp.int32)
            for n in self.config.features
        }
        dummy_pos = jnp.zeros((1, self.config.head_width), jnp.int32)
        abstract = jax.eval_shape(
            lambda: self.model.init(jax.random.PRNGKey(0), dummy_feats, dummy_pos)
        )
        self.params = ckpt_lib.restore_params(
            os.path.join(export_dir, "params"), abstract
        )
        self._item_feature = feature
        self._apply = jax.jit(
            lambda p, feats, pos: self.model.apply(p, feats, pos, deterministic=True)
        )

    def recommend(
        self,
        sessions: Sequence[Sequence[str]],
        k: int = 10,
        instance_ids: Optional[Sequence[str]] = None,
    ) -> list:
        """Next-item recommendation: append a [MASK] slot after each session
        and rank the full catalog for it. Returns per-session top-k
        (item, score) with scores as softmax log-probabilities.

        instance_ids: optional opaque request ids passed through with each
        result (the reference's serving contract,
        clickstream_transformer.py:346-350) — output becomes
        ``[{"instance_id": ..., "items": [(item, score), ...]}, ...]``.
        """
        if instance_ids is not None and len(instance_ids) != len(sessions):
            raise ValueError(
                f"{len(instance_ids)} instance_ids for {len(sessions)} sessions"
            )
        cfg = self.config
        vocab = self.vocabs[self._item_feature]
        max_items = cfg.max_len - 3  # [CLS][SEP] ... [SEP]
        b = len(sessions)
        tokens = np.full((b, token_length(max_items)), PAD_ID, np.int32)
        tokens[:, 0] = CLS_ID
        tokens[:, 1] = SEP_ID
        tokens[:, -1] = SEP_ID
        positions = np.zeros((b, cfg.head_width), np.int32)
        for i, session in enumerate(sessions):
            ids = vocab.encode_model(list(session))[-(max_items - 1):]
            n = len(ids)
            tokens[i, ITEM_OFFSET : ITEM_OFFSET + n] = ids
            tokens[i, ITEM_OFFSET + n] = MASK_ID
            positions[i, 0] = ITEM_OFFSET + n
        logits = self._apply(
            self.params, {self._item_feature: jnp.asarray(tokens)}, jnp.asarray(positions)
        )
        logprobs = jax.nn.log_softmax(logits[:, 0].astype(jnp.float32), axis=-1)
        scores, idx = jax.lax.top_k(logprobs, k)
        scores, idx = np.asarray(scores), np.asarray(idx)
        results = [
            [(vocab.decode_label(int(idx[i, j])), float(scores[i, j])) for j in range(k)]
            for i in range(b)
        ]
        if instance_ids is not None:
            return [
                {"instance_id": iid, "items": items}
                for iid, items in zip(instance_ids, results)
            ]
        return results
