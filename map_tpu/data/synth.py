"""Synthetic CTR dataset generator in the exact on-disk artifact format.

Generates a dataset with the same structural invariants as the reference
preprocessing output (`data_preprocess/proc_avazu.py:197-288`): 10 reserved
ids, a `<rsv>` field heading the field map, field-blocked contiguous id space
with a per-field `<oov>`, Zipfian per-field feature popularity, and a label
generated from a planted logistic model over random feature weights so that
models can actually learn (AUC well above 0.5 on held-out data).

Used by tests and by the end-to-end smoke configs; real Avazu/Criteo runs use
`map_tpu.data.preprocess`.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from map_tpu.data import artifacts


def generate(
    data_dir: str,
    name: str = "synth",
    num_rows: int = 20000,
    num_fields: int = 12,
    vocab_per_field: int = 50,
    seed: int = 0,
    zipf_a: float = 1.3,
    splits=(0.8, 0.1, 0.1),
) -> str:
    os.makedirs(data_dir, exist_ok=True)
    rng = np.random.default_rng(seed)

    field_names: List[str] = [f"f{i}" for i in range(num_fields)]
    field_map = {artifacts.RSV_FIELD: 0}
    feat_map = {tok: i for i, tok in enumerate(artifacts.RESERVED_TOKENS)}

    # Field-blocked contiguous id space with per-field <oov>
    # (proc_avazu.py:248-251 invariant).
    next_id = artifacts.NUM_RESERVED
    field_lo = np.zeros(num_fields, dtype=np.int64)
    field_hi = np.zeros(num_fields, dtype=np.int64)
    for fi, fname in enumerate(field_names):
        field_map[fname] = fi + 1
        field_lo[fi] = next_id
        for v in range(vocab_per_field):
            feat_map[f"{fname}::{v}"] = next_id
            next_id += 1
        feat_map[f"{fname}::<oov>"] = next_id
        next_id += 1
        field_hi[fi] = next_id
    vocab_size = next_id

    # Zipfian popularity per field.
    ranks = np.arange(1, vocab_per_field + 1, dtype=np.float64)
    probs = ranks ** (-zipf_a)
    probs /= probs.sum()
    local = np.stack(
        [rng.choice(vocab_per_field, size=num_rows, p=probs) for _ in range(num_fields)],
        axis=1,
    )
    feat_ids = (field_lo[None, :] + local).astype(np.int32)

    # Planted logistic model: per-feature weights + pairwise field interaction.
    w = rng.normal(0.0, 1.0, size=vocab_size)
    logits = w[feat_ids].sum(axis=1)
    if num_fields >= 2:
        logits += 0.5 * w[feat_ids[:, 0]] * w[feat_ids[:, 1]]
    logits = (logits - logits.mean()) / (logits.std() + 1e-8)
    labels = (rng.random(num_rows) < 1.0 / (1.0 + np.exp(-1.5 * logits))).astype(np.int64)

    perm = rng.permutation(num_rows)
    n_train = int(splits[0] * num_rows)
    n_valid = int(splits[1] * num_rows)
    split_dict = {
        "train": perm[:n_train],
        "valid": perm[n_train:n_train + n_valid],
        "test": perm[n_train + n_valid:],
    }

    artifacts.write_meta(data_dir, name, field_names, feat_map, field_map)
    artifacts.write_ctr_h5(data_dir, name, feat_ids, labels)
    artifacts.write_split(data_dir, split_dict)
    return data_dir
