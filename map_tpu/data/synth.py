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


# Avazu-like per-field vocabulary mix (the real 5-core Avazu has 24 derived
# fields spanning a few ids to ~10^5-10^6 ids; `proc_avazu.py:88-193` prints
# the histogram). Sizes here are scaled so the CPU-run torch reference stays
# tractable while keeping the heavy-tail shape.
AVAZU_LIKE_VOCABS = [8, 8, 25, 300, 24, 5000, 500, 2000, 30000, 50000,
                     10000, 400, 6, 5, 2000, 8, 400, 30, 200, 60, 40, 60,
                     30, 40]


def generate_realistic(
    data_dir: str,
    name: str = "synthazu",
    num_rows: int = 1_000_000,
    vocab_sizes=None,
    seed: int = 7,
    zipf_a: float = 1.2,
    num_latent: int = 8,
    num_clusters: int = 16,
    positive_rate: float = 0.17,
    splits=(0.8, 0.1, 0.1),
) -> str:
    """Reference-format synthetic CTR data with CROSS-FIELD dependence.

    Each row draws a latent z ~ N(0, I_L); every field's value is sampled by
    (a) choosing one of `num_clusters` blocks via a softmax on U_f @ z and
    (b) a Zipf rank inside the block — so fields are mutually predictive
    (MFP/RFD pretraining has transferable signal, unlike `generate`'s
    independent fields). The label is a logistic read-out of z plus
    per-feature weights, interceptor-shifted to `positive_rate` (Avazu's
    empirical CTR is ~0.17). Artifacts are byte-compatible with the torch
    reference's loader (`code/dataset.py:20-37`), enabling same-data
    AUC-parity runs of both frameworks.
    """
    os.makedirs(data_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    if vocab_sizes is None:
        vocab_sizes = AVAZU_LIKE_VOCABS
    num_fields = len(vocab_sizes)

    field_names = [f"f{i}" for i in range(num_fields)]
    field_map = {artifacts.RSV_FIELD: 0}
    feat_map = {tok: i for i, tok in enumerate(artifacts.RESERVED_TOKENS)}
    next_id = artifacts.NUM_RESERVED
    field_lo = np.zeros(num_fields, dtype=np.int64)
    for fi, fname in enumerate(field_names):
        field_map[fname] = fi + 1
        field_lo[fi] = next_id
        # ids are named but never enumerated one-by-one into feat_map for
        # huge fields; the loader only needs len(feat_map) == vocab. Keep the
        # map exact but compact by direct dict construction.
        feat_map.update({f"{fname}::{v}": next_id + v
                         for v in range(vocab_sizes[fi])})
        next_id += vocab_sizes[fi]
        feat_map[f"{fname}::<oov>"] = next_id
        next_id += 1
    vocab_size = next_id

    z = rng.normal(0.0, 1.0, size=(num_rows, num_latent))
    # int64 like the reference preprocessing output (proc_avazu.py:272-288
    # writes numpy default ints); the reference's dynamic_mask scatter
    # (`code/trainer.py:231`) requires feat_ids.dtype == torch.int64.
    feat_ids = np.empty((num_rows, num_fields), dtype=np.int64)
    w = rng.normal(0.0, 0.35, size=vocab_size)
    logits = np.zeros(num_rows)
    for fi in range(num_fields):
        vs = int(vocab_sizes[fi])
        c = min(num_clusters, vs)
        u = rng.normal(0.0, 1.0, size=(num_latent, c))
        cl_logits = z @ u + rng.gumbel(size=(num_rows, c))
        cluster = np.argmax(cl_logits, axis=1)
        block = max(1, vs // c)
        ranks = np.arange(1, block + 1, dtype=np.float64)
        p = ranks ** (-zipf_a)
        p /= p.sum()
        within = rng.choice(block, size=num_rows, p=p)
        local = np.minimum(cluster * block + within, vs - 1)
        feat_ids[:, fi] = field_lo[fi] + local
        logits += w[feat_ids[:, fi]]
    v_out = rng.normal(0.0, 1.0, size=num_latent)
    logits += z @ v_out
    logits = (logits - logits.mean()) / (logits.std() + 1e-8)
    # intercept search for the requested positive rate
    lo_b, hi_b = -8.0, 8.0
    for _ in range(50):
        b = 0.5 * (lo_b + hi_b)
        rate = (1.0 / (1.0 + np.exp(-(1.2 * logits + b)))).mean()
        lo_b, hi_b = (b, hi_b) if rate < positive_rate else (lo_b, b)
    labels = (rng.random(num_rows)
              < 1.0 / (1.0 + np.exp(-(1.2 * logits + b)))).astype(np.int64)

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
