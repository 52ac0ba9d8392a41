"""Amazon Beauty loader.

Replaces the reference's pandas -> TFRecord ETL
(examples/BERT4Rec/data_prep/main.py + data_utils.py) with a direct
packed-array loader: beauty.txt ("user item" pairs in interaction order,
FeiSun/BERT4Rec format, read_bert4rec_text_data at data_prep/main.py:45-49)
-> per-user int32 sequences + a first-appearance item vocabulary.

Parity contract (data_prep/main.py:57-83): each user truncated to their
*first* ``max_seq_len`` interactions; vocabulary is ``pd.unique`` over the
truncated interactions, i.e. first-appearance order; min-interaction
filtering (>=5) is already applied inside beauty.txt.
"""

from __future__ import annotations

import numpy as np

from bert4clickpath_tpu.vocab import Vocabulary


def load_beauty(
    path: str,
    max_seq_len: int = 50,
    min_feedback: int = 0,
) -> tuple[list[np.ndarray], Vocabulary]:
    """Returns (per-user label-space id sequences, item vocabulary).

    Sequences are int32 arrays of label-space ids (0..V-1) in interaction
    order; shift by NUM_RESERVED_TOKENS for model space
    (Vocabulary.label_to_model).
    """
    user_items: dict[str, list[str]] = {}
    with open(path, "r") as f:
        for line in f:
            parts = line.split()
            if len(parts) != 2:
                continue
            user, item = parts
            lst = user_items.setdefault(user, [])
            if len(lst) < max_seq_len:  # first-N truncation, data_prep/main.py:69-70
                lst.append(item)
    if min_feedback:
        user_items = {u: s for u, s in user_items.items() if len(s) >= min_feedback}
    # First-appearance vocab over truncated interactions (data_prep/main.py:74)
    vocab = Vocabulary.from_corpus(
        item for items in user_items.values() for item in items
    )
    sequences = [vocab.encode_labels(items) for items in user_items.values()]
    return sequences, vocab
