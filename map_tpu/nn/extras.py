"""Exploratory/auxiliary layers completing the reference inventory.

These mirror layers present in the reference's `code/layers.py` that no
registered model consumes (SURVEY.md §2.3 notes them as leftovers); they are
provided for API completeness so model experiments built against the reference
find their building blocks here:

- ScaledDotProductAttention       (layers.py:724-743)
- InterHAt_AttentionalAggregation (layers.py:746-763)
- InterHAt_MultiHeadSelfAttention (layers.py:766-825)
- InterHAt_FeedForwardNetwork     (layers.py:828-845)
- Attention with 5-D keys         (layers.py:429-492)
- ProductLayer                    (layers.py:495-578)
- MultiChannelOutputHead          (layers.py:614-693; the dead `not`-on-tensor
                                   branch at :686 is fixed, SURVEY.md §5)
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from map_tpu.nn.activations import get_act
from map_tpu.nn.init import xavier_normal_init
from map_tpu.nn.layers import SelfAttention, TorchDense


def scaled_dot_product_attention(q, k, v, scale: Optional[float] = None,
                                 mask=None):
    """(B, N, E) x (B, M, E) -> context (B, N, E), probs (B, N, M)."""
    scores = jnp.einsum("bne,bme->bnm", q, k)
    if scale:
        scores = scores / scale
    if mask is not None:
        scores = jnp.where(mask, -jnp.inf, scores)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bnm,bme->bne", probs, v), probs


class InterHAtAttentionalAggregation(nn.Module):
    """agg attention: softmax(MLP(X)) weighted field sum (layers.py:746-763)."""

    embedding_dim: int
    hidden_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x):
        hidden = self.hidden_dim or 4 * self.embedding_dim
        h = jax.nn.relu(TorchDense(hidden, name="agg_0")(x))
        attn = jax.nn.softmax(TorchDense(1, use_bias=False, name="agg_1")(h), axis=1)
        return jnp.sum(attn * x, axis=1)


class InterHAtMultiHeadSelfAttention(nn.Module):
    """InterHAt MHA: relu'd output projection + residual + optional LN
    (layers.py:766-825)."""

    input_dim: int
    attention_dim: Optional[int] = None
    num_heads: int = 1
    dropout_rate: float = 0.0
    use_residual: bool = True
    use_scale: bool = False
    layer_norm: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        attn_dim = self.attention_dim or self.input_dim // self.num_heads
        out_dim = self.num_heads * attn_dim
        q = TorchDense(out_dim, use_bias=False, name="W_q")(x)
        k = TorchDense(out_dim, use_bias=False, name="W_k")(x)
        v = TorchDense(out_dim, use_bias=False, name="W_v")(x)

        def split(t):
            b, n, _ = t.shape
            return t.reshape(b, n, self.num_heads, attn_dim).transpose(0, 2, 1, 3)

        scores = jnp.einsum("bhne,bhme->bhnm", split(q), split(k))
        if self.use_scale:
            scores = scores / math.sqrt(attn_dim)
        probs = jax.nn.softmax(scores, axis=-1)
        if self.dropout_rate > 0:
            probs = nn.Dropout(self.dropout_rate, deterministic=not train)(probs)
        ctx = jnp.einsum("bhnm,bhme->bhne", probs, split(v))
        b, h, n, e = ctx.shape
        out = ctx.transpose(0, 2, 1, 3).reshape(b, n, h * e)
        if self.input_dim != out_dim:
            out = TorchDense(self.input_dim, use_bias=False, name="W_res")(out)
        out = jax.nn.relu(out)
        if self.dropout_rate > 0:
            out = nn.Dropout(self.dropout_rate, deterministic=not train)(out)
        if self.use_residual:
            out = out + x
        if self.layer_norm:
            out = nn.LayerNorm(name="ln")(out)
        return out


class InterHAtFeedForward(nn.Module):
    """position-wise FFN with residual + LN (layers.py:828-845)."""

    input_dim: int
    hidden_dim: Optional[int] = None
    use_residual: bool = True
    layer_norm: bool = True

    @nn.compact
    def __call__(self, x):
        hidden = self.hidden_dim or 4 * self.input_dim
        h = jax.nn.relu(TorchDense(hidden, name="ffn_0")(x))
        h = TorchDense(self.input_dim, name="ffn_1")(h)
        if self.use_residual:
            h = h + x
        if self.layer_norm:
            h = nn.LayerNorm(name="ln")(h)
        return h


class PairwiseKeyAttention(nn.Module):
    """BERT-style attention where keys/values are pairwise (B, N, N, E)
    (the reference's `Attention`, layers.py:429-492)."""

    hidden_size: int
    num_attn_heads: int
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, query_states, key_states, train: bool = False):
        head = self.hidden_size // self.num_attn_heads
        all_head = self.num_attn_heads * head
        q = TorchDense(all_head, name="query")(query_states)       # (B, N, A)
        k = TorchDense(all_head, name="key")(key_states)           # (B, N, N, A)
        v = TorchDense(all_head, name="value")(key_states)

        b, n, _ = q.shape
        qh = q.reshape(b, n, self.num_attn_heads, head).transpose(0, 2, 1, 3)
        kh = k.reshape(b, n, n, self.num_attn_heads, head).transpose(0, 3, 1, 2, 4)
        vh = v.reshape(b, n, n, self.num_attn_heads, head).transpose(0, 3, 1, 2, 4)
        # scores: (B, H, N, N) = <q_n, k_{n,m}>
        scores = jnp.einsum("bhne,bhnme->bhnm", qh, kh) / math.sqrt(head)
        probs = jax.nn.softmax(scores, axis=-1)
        probs = nn.Dropout(self.dropout_rate, deterministic=not train)(probs)
        ctx = jnp.einsum("bhnm,bhnme->bhne", probs, vh)
        return ctx.transpose(0, 2, 1, 3).reshape(b, n, all_head)


class ProductLayer(nn.Module):
    """Per-field kernel products with sum/mean/attn aggregation
    (layers.py:495-578). Input (B, N, c_in, E) -> (B, N, c_out, E)."""

    num_fields: int
    hidden_size: int
    c_in: int = 1
    c_out: int = 1
    agg_type: str = "mean"
    res_conn: bool = False
    use_layer_norm: bool = False
    norm_first: bool = False
    num_attn_heads: int = 1
    attn_dropout: float = 0.0

    @nn.compact
    def __call__(self, feat_embeds, train: bool = False):
        n, e = self.num_fields, self.hidden_size
        kernel = self.param(
            "kernel",
            lambda key, shape: xavier_normal_init(key, shape) * math.sqrt(n),
            (self.c_out, self.c_in, n, e, e))
        bias = self.param("bias", nn.initializers.zeros, (n, self.c_out))
        ln = nn.LayerNorm(name="ln") if self.use_layer_norm else None

        q = feat_embeds
        if ln is not None and self.norm_first:
            q = ln(q)

        # pk[b,n,o,i,e'] = sum_e feat[b,n,i,e] kernel[o,i,n,e,e']
        pk = jnp.einsum("bnie,oinef->bnoif", feat_embeds, kernel)

        if self.agg_type == "attn":
            attn = SelfAttention(hidden_size=e, num_attn_heads=self.num_attn_heads,
                                 dropout_rate=self.attn_dropout, name="self_attn")
            b = q.shape[0]
            qa = q.transpose(0, 2, 1, 3).reshape(-1, n, e)  # (B*c_in, N, E)
            qa = attn(qa, train)
            qa = qa.reshape(b, self.c_in, n, e).transpose(0, 2, 1, 3)  # (B,N,c_in,E)
            pkq = jnp.einsum("bnoif,bnif->bnof", pk, qa)
        else:
            if self.agg_type == "sum":
                qr = q.sum(axis=1, keepdims=True)
            else:
                qr = q.mean(axis=1, keepdims=True)
            pkq = jnp.einsum("bnoif,brif->bnof", pk, qr[:, :, :, :])

        pkq = pkq + bias[None, :, :, None]
        if self.res_conn and (self.c_in == self.c_out or self.c_in == 1):
            pkq = pkq + feat_embeds
        if ln is not None and not self.norm_first:
            pkq = ln(pkq)
        return pkq


class MultiChannelOutputHead(nn.Module):
    """Reduction head over (B, N, C, E) with per-axis sum/max/avg/fc
    (layers.py:614-693; the dead `not` branch at :686 not replicated)."""

    num_fields: int
    num_channels: int
    embed_size: int
    output_reduction: str = "sum,max,sum"
    output_dim: int = 1

    @nn.compact
    def __call__(self, h):
        parts = self.output_reduction.split(",")
        if parts == ["fc"]:
            return TorchDense(self.output_dim, name="fc_out")(
                h.reshape(h.shape[0], -1))
        if parts == ["mean", "fc"]:
            hm = jnp.sum(h, axis=1) / self.num_fields
            return TorchDense(self.output_dim, name="fc_out")(
                hm.reshape(hm.shape[0], -1))

        def reduce(kind, x, axis):
            if kind == "sum":
                return x.sum(axis=axis)
            if kind == "max":
                return x.max(axis=axis)
            if kind == "avg":
                return x.mean(axis=axis)
            return x  # 'fc' keeps the axis for the final dense

        # order: innermost (E, axis 3) first, then channels (axis 2), then
        # fields (axis 1); 'fc' axes survive into the final dense
        # (layers.py:661-687). Reducing trailing axes first keeps the leading
        # axis numbers stable.
        x = reduce(parts[2], h, 3)
        x = reduce(parts[1], x, 2)
        x = reduce(parts[0], x, 1)
        x = x.reshape(x.shape[0], -1)
        if x.shape[-1] > 1:
            x = TorchDense(self.output_dim, name="fc_out")(x)
        return x
