"""NCE / sampled-softmax / full-CE losses and the sampled output decoder.

The MFP loss engine. Semantics parity with the reference NCE subsystem
(`code/nce/nce_loss.py`, `code/nce/index_linear.py`):

- noise distribution: renormalized unigram with 1e-10 backoff
  (`nce_loss.py:59-63`), lnZ "auto" norm_term = log(V) (`nce_loss.py:69-72`);
- candidate scoring: output embedding table (V, proj) + per-class bias, bias
  initialized to the unigram log-prior + norm_term (`index_linear.py:41-48`);
  logits = <input, emb[idx]> + bias[idx] over [target || noises]
  (`index_linear.py:86-106`), then both model and noise logits are shifted by
  -norm_term (`nce_loss.py:158-173`);
- 'nce' mode: BCE-with-logits on `logit_model - logit_noise - log k` with the
  positive label at slot 0, summed over the 1+k candidates
  (`nce_loss.py:201-230`);
- 'sampled' mode: TF-style sampled softmax, CE on `logits - q_logits` with
  class-0 target (`nce_loss.py:232-244`);
- 'full' mode: exact CE over the whole vocabulary. (The reference's full mode
  is broken — `noise_samples` is referenced outside the sampled branch,
  `nce_loss.py:137-138`; we implement it correctly, SURVEY.md §5.)

Noise sampling is per-position ('per_word', `nce_loss.py:74,146-156`) and runs
on device inside the jitted step via `map_tpu.objectives.alias`.
"""

from __future__ import annotations

import math
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from map_tpu.nn.init import uniform_scale_init


def bce_with_logits(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Elementwise BCEWithLogits: max(x,0) - x*y + log(1+exp(-|x|))."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


class IndexLinearDecoder(nn.Module):
    """Output-side embedding decoder over sampled candidate indices.

    Parity: reference `code/nce/index_linear.py:29-106`. The candidate gather
    gradient routes through the Pallas tiled scatter-add.
    """

    input_size: int
    proj_size: int
    config: Any  # Config bag carrying `logprob_noise` (np array) and `norm_term`

    def setup(self):
        stdv = 1.0 / math.sqrt(self.proj_size)
        cfg = self.config
        # lane-packed storage (map_tpu.ops.packed_table): emb (V/pe, pe*E),
        # bias (V/128, 128). Bit-identical math per element; the compact
        # backward scatters write 128-lane rows (~6x faster on TPU).
        self.packed = bool(getattr(cfg, "packed_tables", False))
        flat_init = uniform_scale_init(stdv)

        def bias_flat(shape, dtype=jnp.float32):
            # unigram prior + lnZ (index_linear.py:41-48)
            return jnp.asarray(cfg.logprob_noise + cfg.norm_term, dtype=dtype)

        if self.packed:
            from map_tpu.ops.packed_table import (
                pack_factor, pack_table, packed_shape)

            pe = pack_factor(self.proj_size)

            def emb_init(key, shape, dtype=jnp.float32):
                return pack_table(
                    flat_init(key, (shape[0] * pe, self.proj_size), dtype),
                    self.proj_size)

            def bias_init(key, shape, dtype=jnp.float32):
                return pack_table(bias_flat((self.input_size,), dtype)[:, None],
                                  1)

            self.emb = self.param(
                "emb", emb_init, packed_shape(self.input_size, self.proj_size))
            self.bias = self.param(
                "bias", bias_init, packed_shape(self.input_size, 1))
        else:
            self.emb = self.param("emb", flat_init,
                                  (self.input_size, self.proj_size))
            self.bias = self.param(
                "bias", lambda key, shape, dtype=jnp.float32:
                bias_flat(shape, dtype), (self.input_size,))

    def _lookup_rows(self, ids):
        """(...,) ids -> ((..., E) rows, (...,) bias), storage-agnostic."""
        from map_tpu.ops.embedding import embedding_lookup

        if self.packed:
            from map_tpu.ops.packed_table import packed_lookup

            return (packed_lookup(self.emb, ids, self.proj_size),
                    packed_lookup(self.bias, ids, 1)[..., 0])
        return (embedding_lookup(self.emb, ids),
                embedding_lookup(self.bias[:, None], ids)[..., 0])

    def _noise_rows(self, ids, n_targets: int):
        """Shared-noise row lookup. Under the sparse-stream optimizer
        handoff (config.sparse_table_update, ops/sparse_adamw) the emb
        cotangent of the TARGET path is an encoding, so this path's
        cotangent must ride the encoding's disjoint noise region — a plain
        lookup's dense cotangent summed into it would corrupt it. The
        engagement decision (pf_plan) is shared with the target path so the
        two always agree."""
        nce_grad = getattr(self.config, "nce_grad", "dedup")
        if self.packed and nce_grad in ("dedup", "dedup_pallas", "dedup_bwd"):
            from map_tpu.ops import sparse_adamw as sa
            from map_tpu.parallel.context import table_mesh

            if sa.enabled() and table_mesh() is None:
                from map_tpu.ops.packed_table import pack_factor

                plan = sa.pf_plan(self.emb.shape[0], self.emb.shape[1],
                                  pack_factor(self.proj_size), n_targets,
                                  int(ids.size))
                if plan is not None:
                    from map_tpu.ops import dedup_scatter

                    return dedup_scatter.noise_rows_packed(
                        self.emb, self.bias, ids, self.proj_size,
                        self.input_size, plan)
        return self._lookup_rows(ids)

    def _flat_emb(self):
        if self.packed:
            from map_tpu.ops.packed_table import unpack_table

            return unpack_table(self.emb, self.input_size, self.proj_size)
        return self.emb

    def _flat_bias(self):
        if self.packed:
            from map_tpu.ops.packed_table import unpack_table

            return unpack_table(self.bias, self.input_size, 1)[:, 0]
        return self.bias

    def __call__(self, inputs: jnp.ndarray, indices: jnp.ndarray) -> jnp.ndarray:
        """inputs (B, M, E), indices (B, M, C) -> logits (B, M, C).

        NOTE: the candidate count here is B*M*(1+k) ~ 7.6x the input-table
        lookup, and XLA's scatter backward serializes row updates. The default
        gradient path (config.nce_grad='dedup', map_tpu.ops.dedup_scatter)
        folds duplicate candidate ids before the scatter — one fused
        sort/cumsum pass for both tables. --pt_shared_noise (the reference's
        per_word=False variant) remains the fastest configuration.
        """
        from map_tpu.parallel.context import table_mesh

        nce_grad = getattr(self.config, "nce_grad", "dedup")
        # The packed dedup path handles row-sharded tables natively (the
        # physical-row gather/scatter route through the shard_map exchange,
        # ops/dedup_scatter._dgp_fwd/_dgp_bwd); the unpacked legacy path does
        # not, so it falls back to the plain lookup under a table mesh.
        dedup_ok = self.packed or table_mesh() is None
        if nce_grad in ("dedup", "dedup_pallas", "dedup_bwd") and dedup_ok:
            from map_tpu.ops import dedup_scatter

            # static arg (keys the jit cache, round-2 advisor): under
            # 'dedup_pallas' the compact scatter runs through the Pallas
            # sorted-unique one-hot-matmul kernel (12.5 vs 20.5 ms at MFP
            # scale, bit-exact) on the unpacked storage path
            use_pallas_scatter = nce_grad == "dedup_pallas"
            if self.packed:
                # score-fused: the einsum lives inside the custom VJP so the
                # backward builds the sorted gradient stream directly (no
                # big-source 32-wide permute — dedup_scatter._dsp_bwd)
                return dedup_scatter.decoder_score_packed(
                    self.emb, self.bias, inputs, indices, self.proj_size,
                    self.input_size)
            rows, b = dedup_scatter.decoder_gather(
                self.emb, self.bias, indices, use_pallas_scatter)
        else:
            rows, b = self._lookup_rows(indices)
        return jnp.einsum("bme,bmce->bmc", inputs, rows) + b

    def _target_scores(self, inputs: jnp.ndarray,
                       target_idx: jnp.ndarray) -> jnp.ndarray:
        """(B, M, E) x (B, M) -> (B, M) target scores <h, emb[t]> + bias[t].

        Routes the backward through the sorted dedup fold
        (dedup_scatter.decoder_score_packed) when available: the flat
        B*M-row scatter the plain lookup's VJP emits serializes on the
        Zipf-duplicated target ids (3.85 ms raw vs 1.86 ms sorted for the
        canonical 28.7k-row stream — benchmarks/bench_dec_bwd.py)."""
        nce_grad = getattr(self.config, "nce_grad", "dedup")
        if self.packed and nce_grad == "dedup_bwd":
            # plain-lookup forward, dedup-folded backward (two sorts total,
            # both in the backward — ops/dedup_scatter.decoder_score_target)
            from map_tpu.ops import dedup_scatter

            return dedup_scatter.decoder_score_target(
                self.emb, self.bias, inputs, target_idx,
                self.proj_size, self.input_size)
        if self.packed and nce_grad in ("dedup", "dedup_pallas"):
            from map_tpu.ops import dedup_scatter

            return dedup_scatter.decoder_score_packed(
                self.emb, self.bias, inputs, target_idx[..., None],
                self.proj_size, self.input_size)[..., 0]
        t_rows, t_bias = self._lookup_rows(target_idx)
        return jnp.einsum("bme,bme->bm", inputs, t_rows) + t_bias

    def shared_noise_logits(self, inputs: jnp.ndarray, target_idx: jnp.ndarray,
                            noise_idx: jnp.ndarray) -> jnp.ndarray:
        """Batched variant: ONE noise set shared across the batch
        (reference per_word=False path, index_linear.py:108-143).

        inputs (B, M, E), target_idx (B, M), noise_idx (k,) ->
        logits (B, M, 1+k). The noise side becomes a dense (B*M, E) @ (E, k)
        matmul and the backward scatter shrinks from B*M*(1+k) rows to B*M
        target rows + k noise rows — the fast configuration on TPU.
        """
        target_score = self._target_scores(inputs, target_idx)
        n_targets = int(inputs.shape[0] * inputs.shape[1])
        n_rows, n_bias = self._noise_rows(noise_idx, n_targets)  # (k, E) tiny
        noise_score = jnp.einsum("bme,ke->bmk", inputs, n_rows) + n_bias
        return jnp.concatenate([target_score[..., None], noise_score], axis=-1)

    def per_field_shared_noise_logits(self, inputs: jnp.ndarray,
                                      target_idx: jnp.ndarray,
                                      fields: jnp.ndarray,
                                      noise_f: jnp.ndarray) -> jnp.ndarray:
        """Field-conditional noise at shared-noise speed (TPU-native mode,
        no reference counterpart): ONE k-noise set per FIELD per step.

        inputs (B, M, E), target_idx (B, M), fields (B, M) = masked field of
        each position, noise_f (F, k) global ids -> logits (B, M, 1+k).

        The noise side is a dense (B*M, E) @ (E, F*k) matmul over ALL fields'
        noise sets (F*k rows is tiny — 600 at the canonical config), then each
        position keeps its own field's block via a one-hot contraction — no
        per-row-priced candidate gathers, so this runs at per_word=False speed
        while sampling negatives from the masked field's own id block (the
        north-star upgrade over the reference's global unigram,
        SURVEY.md §2.4)."""
        target_score = self._target_scores(inputs, target_idx)
        f, k = noise_f.shape
        n_targets = int(inputs.shape[0] * inputs.shape[1])
        n_flat, nb_flat = self._noise_rows(noise_f.reshape(-1),
                                           n_targets)  # tiny
        n_rows = n_flat.reshape(f, k, -1)                 # (F, k, E)
        n_bias = nb_flat.reshape(f, k)                    # (F, k)
        all_scores = jnp.einsum("bme,fke->bmfk", inputs, n_rows) + n_bias
        onehot = jax.nn.one_hot(fields, f, dtype=all_scores.dtype)  # (B,M,F)
        noise_score = jnp.einsum("bmfk,bmf->bmk", all_scores, onehot)
        return jnp.concatenate([target_score[..., None], noise_score], axis=-1)

    def full_scores(self, inputs: jnp.ndarray) -> jnp.ndarray:
        """Exact scores over the whole vocabulary (index_linear.py:145-151)."""
        return (jnp.einsum("bme,ve->bmv", inputs, self._flat_emb())
                + self._flat_bias())


def nce_loss(model_logits: jnp.ndarray, noise_logprobs: jnp.ndarray,
             norm_term: float, noise_ratio: int) -> jnp.ndarray:
    """'nce' mode. model_logits/noise_logprobs: (B, M, 1+k); slot 0 = target.

    Returns per-position loss (B, M) = sum over candidates of BCE terms
    (nce_loss.py:215-230). model_logits are raw decoder scores; the -norm_term
    shift (nce_loss.py:171-172) is applied here.
    """
    logit_model = model_logits - norm_term
    logit_true = logit_model - noise_logprobs - math.log(noise_ratio)
    labels = jnp.zeros_like(logit_true).at[:, :, 0].set(1.0)
    return bce_with_logits(logit_true, labels).sum(axis=2)


def sampled_softmax_loss(model_logits: jnp.ndarray, noise_logprobs: jnp.ndarray,
                         norm_term: float) -> jnp.ndarray:
    """'sampled' mode: CE on q-corrected logits, target class 0 (nce_loss.py:232-244)."""
    logits = (model_logits - norm_term) - noise_logprobs
    return -jax.nn.log_softmax(logits, axis=-1)[:, :, 0]


def full_ce_loss(full_scores: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """'full' mode: exact CE over V. full_scores (B, M, V), target (B, M)."""
    logp = jax.nn.log_softmax(full_scores, axis=-1)
    return -jnp.take_along_axis(logp, target[..., None], axis=-1)[..., 0]


def mfp_accuracy_count(candidate_logits: jnp.ndarray,
                       position_weight: jnp.ndarray) -> jnp.ndarray:
    """Count of positions where the target outranks all noises.

    Parity: `(logits.argmax(dim=2) == 0).sum()` (models.py:77), restricted to
    real (non-padding) examples via position_weight (B,).
    """
    hit = (jnp.argmax(candidate_logits, axis=2) == 0).astype(jnp.float32)
    return jnp.sum(hit * position_weight[:, None])
