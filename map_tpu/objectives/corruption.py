"""On-device corruption engine for MFP / RFD pretraining.

Jitted, static-shape replacement of the reference's host-side
`Trainer.dynamic_mask` (`code/trainer.py:217-266`). `mask_num` is a Python
constant (`int(num_fields * mask_ratio)`, trainer.py:220), so all shapes are
static and everything runs inside the train step on `jax.random` streams:

- index sampling 'normal' = per-row random subset without replacement
  (reference: per-row randperm, trainer.py:222) implemented as top-k over
  per-row uniforms — a jittable exchangeable m-subset;
- 'randint' = with replacement (trainer.py:224);
- MFP: labels = gathered original ids, inputs scattered to the literal
  `<mask>` id 3 (trainer.py:229-232);
- RFD generators (trainer.py:233-260):
  * Unigram:        same-field value from a random training row. The random
                    rows arrive as a prefetched `noise_rows` side-channel from
                    the input pipeline (see map_tpu.data.loader) because the
                    train matrix is host-resident.
  * Uniform:        per-field randint in [idx_low[f], idx_high[f]) — relies on
                    the field-blocked contiguous id space invariant.
  * Whole-Uniform:  any id in [10, input_size) (10 = reserved ids).
  * Whole-Unigram:  random row AND random field.
  RFD labels = (orig != replaced) as float over ALL fields (positives only
  where the replacement actually changed the value).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def mask_num_of(num_fields: int, mask_ratio: float) -> int:
    return int(num_fields * mask_ratio)  # trainer.py:220


def sample_masked_index(key: jax.Array, batch_size: int, num_fields: int,
                        mask_num: int, sampling_method: str) -> jnp.ndarray:
    if sampling_method == "normal":
        u = jax.random.uniform(key, (batch_size, num_fields))
        _, idx = jax.lax.top_k(u, mask_num)  # random m-subset w/o replacement
        return idx
    elif sampling_method == "randint":
        return jax.random.randint(key, (batch_size, mask_num), 0, num_fields)
    raise NotImplementedError(sampling_method)


def _scatter_rows(input_ids: jnp.ndarray, masked_index: jnp.ndarray,
                  values: jnp.ndarray) -> jnp.ndarray:
    rows = jnp.arange(input_ids.shape[0])[:, None]
    return input_ids.at[rows, masked_index].set(values, mode="drop")


def mfp_corrupt(key: jax.Array, input_ids: jnp.ndarray, mask_num: int,
                sampling_method: str, mask_id: int = 3,
                input_size: Optional[int] = None
                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (corrupted_ids, labels (B,M) original ids, masked_index (B,M)).

    The mask write is a one-hot reduce + where (pure VPU work), not a
    row scatter: per-row dynamic scatters are per-row priced on TPU and the
    (B, M) scatter cost ~0.3 ms of the measured 0.58 ms corrupt total at the
    canonical config (benchmarks/bench_pf_parts.py). Duplicate positions
    (randint mode) write the same mask_id, so the max-reduce is exact."""
    b, f = input_ids.shape
    masked_index = sample_masked_index(key, b, f, mask_num, sampling_method)
    onehot = jax.nn.one_hot(masked_index, f, dtype=jnp.float32)  # (B, M, F)
    # labels via the one-hot id dot (the per-row-priced take_along_axis
    # measured 0.29 ms at the canonical (B, M) stream — round-5 profile,
    # fusion.56); exact while ids < 2^24 with HIGHEST matmul precision.
    # Unknown or Criteo-beyond-2^24 vocabularies keep the integer gather.
    if input_size is not None and int(input_size) < 2 ** 24:
        labels = jnp.einsum(
            "bf,bmf->bm", input_ids.astype(jnp.float32), onehot,
            precision=jax.lax.Precision.HIGHEST).astype(input_ids.dtype)
    else:
        labels = jnp.take_along_axis(input_ids, masked_index, axis=1)
    is_masked = jnp.max(onehot, axis=1) > 0                      # (B, F)
    corrupted = jnp.where(is_masked,
                          jnp.asarray(mask_id, input_ids.dtype), input_ids)
    return corrupted, labels, masked_index


def rfd_corrupt(
    key: jax.Array,
    input_ids: jnp.ndarray,
    mask_num: int,
    sampling_method: str,
    rfd_replace: str,
    input_size: int,
    idx_low: Optional[jnp.ndarray] = None,
    idx_high: Optional[jnp.ndarray] = None,
    noise_rows: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (corrupted_ids (B,F), labels (B,F) float 'was replaced')."""
    b, f = input_ids.shape
    k_idx, k_rep = jax.random.split(key)
    masked_index = sample_masked_index(k_idx, b, f, mask_num, sampling_method)
    flat_pos = masked_index.reshape(-1)  # (B*M,)

    # The one-hot id dots below are exact only while ids fit an f32 mantissa
    # (< 2^24) AND the matmul actually runs in f32: TPU default matmul
    # precision may execute f32 dot_general via bf16 passes, rounding ids
    # >= 256 — so every id einsum pins Precision.HIGHEST. Above 2^24
    # (full-Criteo-scale vocabularies) fall back to the integer gather/
    # scatter path, which is exact at any width.
    ids_fit_f32 = int(input_size) < 2 ** 24

    if rfd_replace == "Unigram":
        assert noise_rows is not None and noise_rows.shape[0] == b * mask_num
        # value of the SAME field from a random training row
        # (trainer.py:234-240) — one-hot dot instead of a per-row-priced
        # take_along_axis; exact while ids < 2^24 (f32 integers)
        if ids_fit_f32:
            oh = jax.nn.one_hot(flat_pos, f, dtype=jnp.float32)
            replace_feat = jnp.einsum(
                "nf,nf->n", noise_rows.astype(jnp.float32), oh,
                precision=jax.lax.Precision.HIGHEST,
            ).astype(input_ids.dtype).reshape(b, mask_num)
        else:
            replace_feat = jnp.take_along_axis(
                noise_rows, flat_pos[:, None], axis=1)[:, 0].reshape(
                    b, mask_num).astype(input_ids.dtype)
    elif rfd_replace == "Uniform":
        # per-field uniform over the field's id block (trainer.py:241-246)
        assert idx_low is not None and idx_high is not None
        lo = jnp.take(idx_low, flat_pos)
        hi = jnp.take(idx_high, flat_pos)
        u = jax.random.uniform(k_rep, (b * mask_num,))
        replace_feat = (lo + jnp.floor(u * (hi - lo)).astype(input_ids.dtype)
                        ).reshape(b, mask_num)
    elif rfd_replace == "Whole-Uniform":
        # any non-reserved id (trainer.py:247-252)
        replace_feat = jax.random.randint(k_rep, (b, mask_num), 10, input_size,
                                          dtype=input_ids.dtype)
    elif rfd_replace == "Whole-Unigram":
        # random row AND random field (trainer.py:253-260)
        assert noise_rows is not None and noise_rows.shape[0] == b * mask_num
        rand_field = jax.random.randint(k_rep, (b * mask_num,), 0, f)
        if ids_fit_f32:
            oh = jax.nn.one_hot(rand_field, f, dtype=jnp.float32)
            replace_feat = jnp.einsum(
                "nf,nf->n", noise_rows.astype(jnp.float32), oh,
                precision=jax.lax.Precision.HIGHEST,
            ).astype(input_ids.dtype).reshape(b, mask_num)
        else:
            replace_feat = jnp.take_along_axis(
                noise_rows, rand_field[:, None], axis=1)[:, 0].reshape(
                    b, mask_num).astype(input_ids.dtype)
    else:
        raise NotImplementedError(rfd_replace)

    # Scatter-free value placement (per-row scatters are per-row priced):
    # one-hot of the masked positions, keeping only each field's LAST masked
    # occurrence so duplicate positions (randint mode) resolve to an exact
    # deterministic last-wins — the reference's scatter_ leaves collision
    # order unspecified, so this is within its contract and self-consistent.
    if ids_fit_f32:
        onehot = jax.nn.one_hot(masked_index, f, dtype=jnp.float32)  # (B,M,F)
        occ_after = jnp.cumsum(onehot[:, ::-1, :], axis=1)[:, ::-1, :]
        is_last = onehot * (occ_after == 1.0)
        hit = jnp.max(onehot, axis=1) > 0                            # (B, F)
        vals = jnp.einsum("bm,bmf->bf",
                          replace_feat.astype(jnp.float32), is_last,
                          precision=jax.lax.Precision.HIGHEST)
        corrupted = jnp.where(hit, vals.astype(input_ids.dtype), input_ids)
    else:
        # Integer scatter: .at[].set applies updates in order, so the last
        # masked occurrence wins — the same last-wins contract as above.
        corrupted = _scatter_rows(input_ids, masked_index,
                                  replace_feat.astype(input_ids.dtype))
    labels = (input_ids != corrupted).astype(jnp.float32)
    return corrupted, labels
