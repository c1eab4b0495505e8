"""Model zoo: LR, FM, DNN, DeepFM, xDeepFM, DCNv2, FGCNN, FiGNN, AutoInt,
Transformer.

Architecture parity with the reference `code/models.py:129-568` (SURVEY.md
§2.2 lists the per-model final_dim contracts). Every pretrain-capable model
wires `create_pretraining_predictor` on the final_dim documented there.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from map_tpu.data.artifacts import NUM_RESERVED
from map_tpu.models.base import CTRModel
from map_tpu.nn.layers import (
    AttentionalPrediction,
    CIN,
    CrossNetV2,
    Embeddings,
    FGCNNBlock,
    FiGNNBlock,
    InnerProductLayer,
    MLPBlock,
    MultiHeadSelfAttention,
    TorchDense,
    TransformerEncoderLayer,
)


def _dtype(config: Any):
    from map_tpu.nn.layers import resolve_dtype

    return resolve_dtype(getattr(config, "compute_dtype", None))


def _field_bounds(config: Any):
    """Static per-field (lo, hi) id ranges for the field-blocked hybrid
    lookup (ops/hybrid_gather.py). None unless the dataset's id ranges are
    known and `field_blocked_lookup` is enabled (run.py turns it off for
    RFD whole-vocab generators, whose corrupted ids leave their blocks)."""
    if not getattr(config, "field_blocked_lookup", True):
        return None
    lo = getattr(config, "idx_low", None)
    hi = getattr(config, "idx_high", None)
    if lo is None or hi is None:
        return None
    if len(lo) != config.num_fields or len(hi) != config.num_fields:
        return None
    return tuple((int(a), int(b)) for a, b in zip(lo, hi))


def _embeddings(config: Any, name: str = "embed") -> Embeddings:
    return Embeddings(
        input_size=config.input_size,
        embed_size=config.embed_size,
        num_fields=config.num_fields,
        embed_norm=getattr(config, "embed_norm", False),
        layer_norm_eps=getattr(config, "layer_norm_eps", 1e-12),
        dropout_rate=getattr(config, "embed_dropout_rate", 0.0),
        dtype=_dtype(config),
        packed=bool(getattr(config, "packed_tables", False)),
        field_bounds=_field_bounds(config),
        hybrid_mode=getattr(config, "hybrid_mode", "") or "",
        nresv=int(getattr(config, "reserved_ids", NUM_RESERVED) or NUM_RESERVED),
        name=name,
    )


def _mlp(config: Any, name: str = "dnn") -> MLPBlock:
    return MLPBlock(
        hidden_size=config.hidden_size,
        num_hidden_layers=config.num_hidden_layers,
        hidden_act=config.hidden_act,
        hidden_dropout_rate=config.hidden_dropout_rate,
        dtype=_dtype(config),
        name=name,
    )


class LRLayer(nn.Module):
    """1-dim embedding + global bias, summed over fields (models.py:129-143)."""

    input_size: int

    @nn.compact
    def __call__(self, input_ids):
        w = self.param("weight", nn.initializers.normal(1.0), (self.input_size, 1))
        bias = self.param("bias", nn.initializers.zeros, (1,))
        return jnp.take(w, input_ids, axis=0).sum(axis=1) + bias  # (B, 1)


class LR(CTRModel):
    def setup(self):
        self.lr_layer = LRLayer(self.config.input_size, name="lr_layer")
        if getattr(self.config, "pretrain", False):
            raise NotImplementedError("LR is not pretrain-capable (reference parity)")

    def supervised_logits(self, input_ids, train=False):
        return self.lr_layer(input_ids)


class FM(CTRModel):
    """LR + InnerProduct sum (models.py:146-161)."""

    def setup(self):
        self.lr_layer = LRLayer(self.config.input_size, name="lr_layer")
        self.embed = _embeddings(self.config)
        self.ip_layer = InnerProductLayer(num_fields=self.config.num_fields,
                                          name="ip_layer")
        if getattr(self.config, "pretrain", False):
            raise NotImplementedError("FM is not pretrain-capable (reference parity)")

    def supervised_logits(self, input_ids, train=False):
        feat_embed = self.embed(input_ids, train)
        return self.ip_layer(feat_embed) + self.lr_layer(input_ids)


class DNN(CTRModel):
    """embed -> flatten -> MLP (models.py:164-193). final_dim = hidden_size."""

    def setup(self):
        c = self.config
        self.embed = _embeddings(c)
        self.dnn = _mlp(c)
        if c.pretrain:
            self.create_pretraining_predictor()
        else:
            self.fc_out = TorchDense(1, name="fc_out")

    def backbone(self, input_ids, train=False):
        feat_embed = self.embed(input_ids, train)
        return self.dnn(feat_embed.reshape(feat_embed.shape[0], -1), train)

    def supervised_logits(self, input_ids, train=False):
        return self.fc_out(self.backbone(input_ids, train))


class DeepFM(CTRModel):
    """embed->MLP || LR+FM (models.py:196-232). final_dim = hidden_size + 1."""

    def setup(self):
        c = self.config
        self.embed = _embeddings(c)
        self.lr_layer = LRLayer(c.input_size, name="lr_layer")
        self.dnn = _mlp(c)
        self.ip_layer = InnerProductLayer(num_fields=c.num_fields, name="ip_layer")
        if c.pretrain:
            self.create_pretraining_predictor()
        else:
            self.dnn_fc_out = TorchDense(1, name="dnn_fc_out")

    def backbone(self, input_ids, train=False):
        feat_embed = self.embed(input_ids, train)
        dnn_vec = self.dnn(feat_embed.reshape(feat_embed.shape[0], -1), train)
        lr_fm = self.lr_layer(input_ids) + self.ip_layer(feat_embed)
        return jnp.concatenate([dnn_vec, lr_fm], axis=1)  # (B, hidden+1)

    def supervised_logits(self, input_ids, train=False):
        feat_embed = self.embed(input_ids, train)
        dnn_vec = self.dnn(feat_embed.reshape(feat_embed.shape[0], -1), train)
        logits = self.dnn_fc_out(dnn_vec)
        logits += self.lr_layer(input_ids)
        logits += self.ip_layer(feat_embed)
        return logits


class XDeepFM(CTRModel):
    """CIN + optional MLP (+ optional LR) (models.py:235-279)."""

    def setup(self):
        c = self.config
        self.embed = _embeddings(c)
        self.cin_units = tuple(int(u) for u in c.cin_layer_units.split(","))
        self.cin = CIN(c.num_fields, self.cin_units, name="cin")
        self.dnn = _mlp(c) if c.num_hidden_layers > 0 else None
        if c.pretrain:
            self.create_pretraining_predictor()
        else:
            self.lr_layer = LRLayer(c.input_size, name="lr_layer") if c.use_lr else None
            self.fc = TorchDense(1, name="fc")

    def backbone(self, input_ids, train=False):
        feat_embed = self.embed(input_ids, train)
        final_vec = self.cin(feat_embed)
        if self.dnn is not None:
            dnn_vec = self.dnn(feat_embed.reshape(feat_embed.shape[0], -1), train)
            final_vec = jnp.concatenate([final_vec, dnn_vec], axis=1)
        return final_vec

    def supervised_logits(self, input_ids, train=False):
        logits = self.fc(self.backbone(input_ids, train))
        if self.lr_layer is not None:
            logits += self.lr_layer(input_ids)
        return logits


class DCNV2(CTRModel):
    """CrossNetV2 || MLP -> concat -> fc (models.py:282-322). The benchmark
    model. final_dim = F*E + hidden_size."""

    def setup(self):
        c = self.config
        self.embed = _embeddings(c)
        self.cross_net = CrossNetV2(num_cross_layers=c.num_cross_layers,
                                    use_pallas=getattr(c, "use_pallas", False),
                                    dtype=_dtype(c),
                                    name="cross_net")
        self.parallel_dnn = _mlp(c, name="parallel_dnn") if c.num_hidden_layers > 0 else None
        if c.pretrain:
            self.create_pretraining_predictor()
        else:
            self.fc_out = TorchDense(1, name="fc_out")

    def backbone(self, input_ids, train=False):
        c = self.config
        feat_embed = self.embed(input_ids, train).reshape(input_ids.shape[0], -1)
        cross_output = self.cross_net(feat_embed)
        if self.parallel_dnn is not None:
            dnn_output = self.parallel_dnn(feat_embed, train)
            return jnp.concatenate([cross_output, dnn_output], axis=-1)
        return cross_output

    def supervised_logits(self, input_ids, train=False):
        return self.fc_out(self.backbone(input_ids, train))


class FGCNN(CTRModel):
    """Conv feature generation + inner products + MLP (models.py:325-407)."""

    def setup(self):
        c = self.config
        self.share_embedding = c.share_embedding
        self.embed = _embeddings(c)
        if not self.share_embedding:
            self.fg_embed = _embeddings(c, name="fg_embed")
        channels = [int(x) for x in c.channels.split(",")]
        kernel_heights = [int(x) for x in c.kernel_heights.split(",")]
        pooling_sizes = [int(x) for x in c.pooling_sizes.split(",")]
        recombined = [int(x) for x in c.recombined_channels.split(",")]
        self.fgcnn_layer = FGCNNBlock(
            num_fields=c.num_fields, embedding_dim=c.embed_size,
            channels=channels, kernel_heights=kernel_heights,
            pooling_sizes=pooling_sizes, recombined_channels=recombined,
            activation=c.conv_act, batch_norm=True, name="fgcnn_layer")
        final_dim, total_features = self.compute_input_dim(
            c.embed_size, c.num_fields, channels, pooling_sizes, recombined)
        self.total_features = total_features
        self.ip_layer = InnerProductLayer(num_fields=total_features,
                                          output="inner_product", name="ip_layer")
        if c.pretrain:
            self.create_pretraining_predictor()
        else:
            self.dnn = _mlp(c) if c.num_hidden_layers > 0 else None
            self.fc_out = TorchDense(1, name="fc_out")

    @staticmethod
    def compute_input_dim(embedding_dim, num_fields, channels, pooling_sizes,
                          recombined_channels):
        # models.py:369-382
        total_features = num_fields
        input_height = num_fields
        for i in range(len(channels)):
            input_height = int(math.ceil(input_height / pooling_sizes[i]))
            total_features += input_height * recombined_channels[i]
        final_dim = int(total_features * (total_features - 1) / 2) \
            + total_features * embedding_dim
        return final_dim, total_features

    def backbone(self, input_ids, train=False):
        feat_embed = self.embed(input_ids, train)
        feat_embed2 = feat_embed if self.share_embedding else self.fg_embed(input_ids, train)
        conv_in = feat_embed2[..., None]  # NHWC: (B, F, E, 1)
        new_feat_embed = self.fgcnn_layer(conv_in, train)
        combined = jnp.concatenate([feat_embed, new_feat_embed], axis=1)
        ip_vec = self.ip_layer(combined)
        return jnp.concatenate([combined.reshape(combined.shape[0], -1), ip_vec], axis=1)

    def supervised_logits(self, input_ids, train=False):
        dense_input = self.backbone(input_ids, train)
        if self.dnn is not None:
            return self.fc_out(self.dnn(dense_input, train))
        return self.fc_out(dense_input)


class FiGNN(CTRModel):
    """Field-graph attention + GRU message passing (models.py:410-437)."""

    def setup(self):
        c = self.config
        self.embed = _embeddings(c)
        self.fignn = FiGNNBlock(num_fields=c.num_fields, embed_size=c.embed_size,
                                gnn_layers=c.num_hidden_layers,
                                use_residual=c.res_conn,
                                reuse_graph_layer=c.reuse_graph_layer, name="fignn")
        if c.pretrain:
            self.create_pretraining_predictor()
        else:
            self.fc = AttentionalPrediction(num_fields=c.num_fields,
                                            embed_size=c.embed_size, name="fc")

    def backbone(self, input_ids, train=False):
        h = self.fignn(self.embed(input_ids, train))
        return h.reshape(h.shape[0], -1)

    def supervised_logits(self, input_ids, train=False):
        h = self.fignn(self.embed(input_ids, train))
        return self.fc(h)


class AutoInt(CTRModel):
    """Stacked multi-head self-attention with optional LR/DNN towers
    (models.py:440-488). final_dim = F * attn_size * heads."""

    def setup(self):
        c = self.config
        self.embed = _embeddings(c)
        self.attn_layers = [
            MultiHeadSelfAttention(
                input_dim=(c.embed_size if i == 0 else c.num_attn_heads * c.attn_size),
                attention_dim=c.attn_size,
                num_heads=c.num_attn_heads,
                dropout_rate=c.attn_probs_dropout_rate,
                use_residual=c.res_conn,
                use_scale=c.attn_scale,
                layer_norm=False,
                align_to="output",
                name=f"attn_{i}",
            )
            for i in range(c.num_attn_layers)
        ]
        if c.pretrain:
            self.create_pretraining_predictor()
        else:
            self.attn_out = TorchDense(1, name="attn_out")
            self.lr_layer = LRLayer(c.input_size, name="lr_layer") if c.use_lr else None
            if c.num_dnn_layers:
                self.dnn = MLPBlock(hidden_size=c.dnn_size,
                                    num_hidden_layers=c.num_dnn_layers,
                                    hidden_act=c.dnn_act,
                                    hidden_dropout_rate=c.dnn_drop, name="dnn")
                self.dnn_out = TorchDense(1, name="dnn_out")
            else:
                self.dnn = None

    def _attention(self, feat_embed, train):
        h = feat_embed
        for layer in self.attn_layers:
            h = layer(h, train)
        return h.reshape(h.shape[0], -1)

    def backbone(self, input_ids, train=False):
        return self._attention(self.embed(input_ids, train), train)

    def supervised_logits(self, input_ids, train=False):
        feat_embed = self.embed(input_ids, train)
        logits = self.attn_out(self._attention(feat_embed, train))
        if self.lr_layer is not None:
            logits += self.lr_layer(input_ids)
        if self.dnn is not None:
            flat = feat_embed.reshape(feat_embed.shape[0], -1)
            logits += self.dnn_out(self.dnn(flat, train))
        return logits


class Transformer(CTRModel):
    """Transformer encoder over field tokens (models.py:491-568).

    Output reductions: fc / mean,fc / sum,fc / attn,fc. Requires
    embed_size == hidden_size (models.py:53-56)."""

    def setup(self):
        c = self.config
        self.embed = _embeddings(c)
        self.encoder_layers = [
            TransformerEncoderLayer(
                d_model=c.hidden_size, nhead=c.num_attn_heads,
                dim_feedforward=c.intermediate_size,
                dropout_rate=c.hidden_dropout_rate, activation=c.hidden_act,
                layer_norm_eps=c.layer_norm_eps, norm_first=c.norm_first,
                name=f"layer_{i}")
            for i in range(c.num_hidden_layers)
        ]
        if c.pretrain:
            self.create_pretraining_predictor()
        else:
            red = c.output_reduction
            if red == "fc":
                self.trans_out = TorchDense(1, name="trans_out")
            elif red in ("mean,fc", "sum,fc"):
                self.trans_out = TorchDense(1, name="trans_out")
            elif red == "attn,fc":
                self.attn_hidden = TorchDense(c.embed_size, name="attn_hidden")
                self.attn_score = TorchDense(1, name="attn_score")
                self.trans_out = TorchDense(1, name="trans_out")
            else:
                raise NotImplementedError(red)
            self.lr_layer = LRLayer(c.input_size, name="lr_layer") if c.use_lr else None
            if c.num_dnn_layers > 0:
                self.mlp = MLPBlock(hidden_size=c.dnn_size,
                                    num_hidden_layers=c.num_dnn_layers,
                                    hidden_act=c.dnn_act,
                                    hidden_dropout_rate=c.dnn_drop, name="mlp")
                self.mlp_out = TorchDense(1, name="mlp_out")
            else:
                self.mlp = None

    def _encode(self, feat_embed, train):
        h = feat_embed
        for layer in self.encoder_layers:
            h = layer(h, train)
        return h

    def backbone(self, input_ids, train=False):
        h = self._encode(self.embed(input_ids, train), train)
        return h.reshape(h.shape[0], -1)

    def supervised_logits(self, input_ids, train=False):
        c = self.config
        feat_embed = self.embed(input_ids, train)
        enc = self._encode(feat_embed, train)
        red = c.output_reduction
        if red == "fc":
            logits = self.trans_out(enc.reshape(enc.shape[0], -1))
        elif red == "mean,fc":
            logits = self.trans_out(jnp.sum(enc, axis=1) / c.num_fields)
        elif red == "sum,fc":
            logits = self.trans_out(jnp.sum(enc, axis=1))
        elif red == "attn,fc":
            score = self.attn_score(jax.nn.relu(self.attn_hidden(enc)))
            score = jax.nn.softmax(score, axis=1)
            logits = self.trans_out(jnp.sum(enc * score, axis=1))
        else:
            raise NotImplementedError(red)
        if self.lr_layer is not None:
            logits += self.lr_layer(input_ids)
        if self.mlp is not None:
            flat = feat_embed.reshape(feat_embed.shape[0], -1)
            logits += self.mlp_out(self.mlp(flat, train))
        return logits
