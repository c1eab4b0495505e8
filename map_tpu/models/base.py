"""BaseModel protocol: backbone -> final_vec -> objective head.

Parity with the reference `code/models.py:21-126`:
- every model exposes a backbone producing `final_vec` (the per-model
  `final_dim` table is in SURVEY.md §2.2);
- pretrain heads (`create_pretraining_predictor`, models.py:114-126):
  MFP: Linear(final_dim, num_fields*proj_size) -> gather masked fields ->
  IndexLinear NCE decoder; RFD: MLP(final_dim -> F*proj -> relu -> F) + BCE;
- supervised: per-model fc head -> BCEWithLogits.

The corresponding loss/accuracy computation lives in
`map_tpu.train.train_step` (losses are computed outside the module so the
noise sampling RNG stays in the train step).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from map_tpu.nn.layers import TorchDense
from map_tpu.objectives.nce import IndexLinearDecoder


class CTRModel(nn.Module):
    """Base class. Subclasses implement setup(), backbone(), supervised_logits()."""

    config: Any

    # ---- pretrain heads (reference models.py:114-126) ----
    def create_pretraining_predictor(self):
        """Call from subclass setup() when config.pretrain. Assigns head modules."""
        c = self.config
        if c.pt_type == "MFP":
            self.feat_encoder = TorchDense(c.num_fields * c.proj_size,
                                           name="feat_encoder")
            self.mfp_decoder = IndexLinearDecoder(c.input_size, c.proj_size, c,
                                                  name="mfp_decoder")
        elif c.pt_type == "RFD":
            self.pred_rfd_hidden = TorchDense(c.num_fields * c.proj_size,
                                              name="pred_rfd_hidden")
            self.pred_rfd_out = TorchDense(c.num_fields, name="pred_rfd_out")
        else:
            raise NotImplementedError(c.pt_type)

    @staticmethod
    def _select_masked(enc, masked_index):
        """(B, F, P) x (B, M) -> (B, M, P): masked-field selection as a
        one-hot einsum. take_along_axis costs a per-row-priced gather forward
        and a scatter backward; the one-hot contraction is dense MXU/VPU work
        and bit-exact (0/1 weights, one nonzero term per output)."""
        onehot = jax.nn.one_hot(masked_index, enc.shape[1], dtype=enc.dtype)
        # Precision pinned: at TPU default matmul precision an f32 enc would
        # silently truncate to bf16 passes; HIGHEST is exact for both bf16
        # and f32 enc (0/1 weights) at negligible cost for these shapes.
        return jnp.einsum("bfp,bmf->bmp", enc, onehot,
                          precision=jax.lax.Precision.HIGHEST)

    def mfp_candidate_logits(self, final_vec: jnp.ndarray,
                             masked_index: jnp.ndarray,
                             candidates: jnp.ndarray) -> jnp.ndarray:
        """MFP branch of get_outputs (models.py:73-78).

        final_vec (B, final_dim); masked_index (B, M); candidates (B, M, 1+k)
        = [target || noise] indices -> raw decoder logits (B, M, 1+k).
        """
        c = self.config
        b = final_vec.shape[0]
        enc = self.feat_encoder(final_vec).reshape(b, c.num_fields, c.proj_size)
        selected = self._select_masked(enc, masked_index)
        return self.mfp_decoder(selected, candidates)

    def mfp_shared_noise_logits(self, input_ids: jnp.ndarray,
                                masked_index: jnp.ndarray,
                                target_idx: jnp.ndarray,
                                noise_idx: jnp.ndarray,
                                train: bool = False) -> jnp.ndarray:
        """Batched per_word=False scoring (reference index_linear.py:108-143):
        one noise set shared across the batch. Returns (B, M, 1+k)."""
        c = self.config
        final_vec = self.backbone(input_ids, train)
        b = final_vec.shape[0]
        enc = self.feat_encoder(final_vec).reshape(b, c.num_fields, c.proj_size)
        selected = self._select_masked(enc, masked_index)
        return self.mfp_decoder.shared_noise_logits(selected, target_idx, noise_idx)

    def mfp_per_field_shared_logits(self, input_ids: jnp.ndarray,
                                    masked_index: jnp.ndarray,
                                    target_idx: jnp.ndarray,
                                    noise_f: jnp.ndarray,
                                    train: bool = False) -> jnp.ndarray:
        """Field-conditional shared-noise scoring (TPU-native mode): one
        k-noise set per FIELD per step; the masked position index IS the
        field index, so it doubles as the field selector. Returns (B, M, 1+k).
        """
        c = self.config
        final_vec = self.backbone(input_ids, train)
        b = final_vec.shape[0]
        enc = self.feat_encoder(final_vec).reshape(b, c.num_fields, c.proj_size)
        selected = self._select_masked(enc, masked_index)
        return self.mfp_decoder.per_field_shared_noise_logits(
            selected, target_idx, masked_index, noise_f)

    def mfp_full_scores(self, input_ids: jnp.ndarray, masked_index: jnp.ndarray,
                        train: bool = False) -> jnp.ndarray:
        """Exact scores over the full vocabulary for 'full' CE mode
        (nce_loss.py:133-135 / index_linear.py:145-151 — broken in the
        reference via the undefined `noise_samples`, SURVEY.md §5; functional
        here). Returns (B, M, V)."""
        c = self.config
        final_vec = self.backbone(input_ids, train)
        b = final_vec.shape[0]
        enc = self.feat_encoder(final_vec).reshape(b, c.num_fields, c.proj_size)
        selected = self._select_masked(enc, masked_index)
        return self.mfp_decoder.full_scores(selected)

    def rfd_field_logits(self, final_vec: jnp.ndarray) -> jnp.ndarray:
        """RFD branch (models.py:79-85, head built at models.py:118-123)."""
        h = jax.nn.relu(self.pred_rfd_hidden(final_vec))
        return self.pred_rfd_out(h)  # (B, F)

    # ---- entry points ----
    def backbone(self, input_ids: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        raise NotImplementedError

    def supervised_logits(self, input_ids: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        raise NotImplementedError

    def __call__(self, input_ids: jnp.ndarray, train: bool = False,
                 masked_index: Optional[jnp.ndarray] = None,
                 candidates: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        c = self.config
        if getattr(c, "pretrain", False):
            final_vec = self.backbone(input_ids, train)
            if c.pt_type == "MFP":
                return self.mfp_candidate_logits(final_vec, masked_index, candidates)
            return self.rfd_field_logits(final_vec)
        return self.supervised_logits(input_ids, train)

    def validate_model_config(self) -> None:
        c = self.config
        if c.model_name.lower() in ("trans",):
            assert c.embed_size == c.hidden_size, \
                "model trans requires embed_size == hidden_size (models.py:53-56)"
