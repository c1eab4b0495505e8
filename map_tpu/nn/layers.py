"""Feature-interaction layer library (flax.linen).

TPU-first re-implementations of every layer in the reference's
`code/layers.py` (see SURVEY.md §2.3). All interactions are expressed as
batched einsums / dense matmuls so XLA tiles them onto the MXU; elementwise
epilogues (activations, gating, residuals) are left to XLA fusion. The
embedding lookup and the DCNv2 cross network additionally have Pallas kernel
paths in `map_tpu.ops`.

Deviations from the reference (intentional, documented):
- Multi-head attention uses a proper transpose-based head split. The reference
  uses `view(B*heads, -1, dim)` (`code/layers.py:886-888`) which scrambles the
  field axis into heads when heads > 1; for heads == 1 (the default) the two
  are identical.
- `MultiChannelOutputHead`'s dead `not`-on-tensor branch (`code/layers.py:686`)
  is not replicated (SURVEY.md §5 known defects).
"""

from __future__ import annotations

import math
from itertools import combinations
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from map_tpu.nn.activations import get_act
from map_tpu.nn.init import (
    conv_kernel_init,
    embedding_init,
    linear_bias_init_for,
    linear_kernel_init,
    uniform_scale_init,
    xavier_normal_init,
    xavier_uniform_init,
)


def resolve_dtype(name):
    """'float32' | 'bfloat16' | None -> jnp dtype (None = promote as-is)."""
    if name is None or not isinstance(name, str):
        return name
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[name]


class TorchDense(nn.Module):
    """nn.Dense with torch-nn.Linear-parity init (U(±1/sqrt(fan_in))).

    `dtype` is the computation dtype (params stay float32; activations and the
    matmul run in `dtype` — set bfloat16 via config.compute_dtype to halve
    activation HBM traffic on TPU)."""

    features: int
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=linear_kernel_init,
            bias_init=linear_bias_init_for(fan_in),
            name="dense",
        )(x)


class Embeddings(nn.Module):
    """Single global embedding table over the field-blocked id space.

    Parity: reference `code/layers.py:83-102` — one nn.Embedding(input_size,
    embed_size), init normal(std=sqrt(2/(num_fields+embed_size))), optional
    LayerNorm, dropout. The lookup routes through `map_tpu.ops.embedding`
    which provides XLA take / Pallas gather / model-axis-sharded paths.
    """

    input_size: int
    embed_size: int
    num_fields: int
    embed_norm: bool = False
    layer_norm_eps: float = 1e-12
    dropout_rate: float = 0.0
    dtype: Any = None
    packed: bool = False  # lane-packed (V/p, p*E) storage, map_tpu.ops.packed_table
    # static per-field (lo, hi) id ranges: enables the field-blocked hybrid
    # lookup (map_tpu.ops.hybrid_gather) for (B, F) id inputs when packed
    field_bounds: Any = None
    # hybrid backward-mode override (config.hybrid_mode; "" = env/default)
    hybrid_mode: str = ""
    # reserved-id count (ids 0..nresv-1: <pad>/<cls>/<sep>/<mask>/unused —
    # dataset invariant, reference data_preprocess/proc_avazu.py:214-220)
    nresv: int = 10

    @nn.compact
    def __call__(self, input_ids, train: bool = False):
        init = embedding_init(self.num_fields, self.embed_size)
        if self.packed:
            from map_tpu.ops.packed_table import (
                pack_factor, pack_table, packed_lookup, packed_shape)

            p = pack_factor(self.embed_size)
            pshape = packed_shape(self.input_size, self.embed_size)

            def packed_init(key, shape, dtype=jnp.float32):
                # same element stream as the flat init, relocated
                return pack_table(
                    init(key, (shape[0] * p, self.embed_size)).astype(dtype),
                    self.embed_size)

            table = self.param("embedding", packed_init, pshape)
            emb = packed_lookup(table, input_ids, self.embed_size,
                                field_bounds=self.field_bounds,
                                hybrid_mode=self.hybrid_mode or None,
                                nresv=self.nresv)
        else:
            table = self.param(
                "embedding", init, (self.input_size, self.embed_size))
            from map_tpu.ops.embedding import embedding_lookup

            emb = embedding_lookup(table, input_ids)
        if self.dtype is not None:
            emb = emb.astype(self.dtype)
        if self.embed_norm:
            emb = nn.LayerNorm(epsilon=self.layer_norm_eps, name="layer_norm")(emb)
        if self.dropout_rate > 0.0:
            emb = nn.Dropout(self.dropout_rate, deterministic=not train)(emb)
        return emb


class MLPBlock(nn.Module):
    """[Dense -> act -> dropout] x L. Parity: reference `code/layers.py:173-188`."""

    hidden_size: int
    num_hidden_layers: int
    hidden_act: str = "relu"
    hidden_dropout_rate: float = 0.5
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = get_act(self.hidden_act)
        for i in range(self.num_hidden_layers):
            x = TorchDense(self.hidden_size, dtype=self.dtype, name=f"layer_{i}")(x)
            x = act(x)
            if self.hidden_dropout_rate > 0.0:
                x = nn.Dropout(self.hidden_dropout_rate, deterministic=not train)(x)
        return x


class CrossNetV2(nn.Module):
    """DCNv2 full-rank cross network: X_{i+1} = X_i + X_0 * (W_i X_i + b_i).

    Parity: reference `code/layers.py:191-201`. The fused Pallas path
    (`map_tpu.ops.cross`) keeps X_0/X_i tiles resident in VMEM across the
    matmul + Hadamard + residual epilogue.
    """

    num_cross_layers: int
    use_pallas: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x0):
        d = x0.shape[-1]
        kernels = []
        biases = []
        for i in range(self.num_cross_layers):
            kernels.append(self.param(f"kernel_{i}", linear_kernel_init, (d, d)))
            biases.append(self.param(f"bias_{i}", linear_bias_init_for(d), (d,)))
        from map_tpu.ops.cross import cross_net_apply

        if self.dtype is not None:
            x0 = x0.astype(self.dtype)
            kernels = [k.astype(self.dtype) for k in kernels]
            biases = [b.astype(self.dtype) for b in biases]
        return cross_net_apply(x0, kernels, biases, use_pallas=self.use_pallas)


class InnerProductLayer(nn.Module):
    """product_sum / bi_interaction / inner_product over field embeddings.

    Parity: reference `code/layers.py:105-137` (sum-square trick; bmm +
    upper-triangle mask).
    """

    num_fields: Optional[int] = None
    output: str = "product_sum"

    @nn.compact
    def __call__(self, feat_embed):
        if self.output in ("product_sum", "bi_interaction"):
            sum_of_square = jnp.sum(feat_embed, axis=1) ** 2
            square_of_sum = jnp.sum(feat_embed ** 2, axis=1)
            bi = 0.5 * (sum_of_square - square_of_sum)
            if self.output == "bi_interaction":
                return bi
            return jnp.sum(bi, axis=-1, keepdims=True)
        elif self.output == "inner_product":
            assert self.num_fields is not None
            ip = jnp.einsum("bfe,bge->bfg", feat_embed, feat_embed)
            iu, ju = np.triu_indices(self.num_fields, k=1)
            return ip[:, iu, ju]
        else:
            raise NotImplementedError(self.output)


class OuterProductLayer(nn.Module):
    """Pairwise outer products with mat/vec/num kernels (`code/layers.py:140-170`)."""

    num_fields: int
    embed_size: int
    kernel_type: str = "mat"

    @nn.compact
    def __call__(self, feat_embed):
        num_ix = self.num_fields * (self.num_fields - 1) // 2
        iu, ju = np.triu_indices(self.num_fields, k=1)
        p = feat_embed[:, iu]  # (B, P, E)
        q = feat_embed[:, ju]
        if self.kernel_type == "mat":
            kernel = self.param("kernel", xavier_uniform_init,
                                (self.embed_size, num_ix, self.embed_size))
            # (B,1,P,E) * (E,P,E) summed over last -> (B,E,P) -> (B,P,E)
            kp = jnp.einsum("bpe,epf->bpf", p, jnp.transpose(kernel, (1, 0, 2)))
            return jnp.sum(kp * q, axis=-1)
        else:
            shape = (num_ix, self.embed_size) if self.kernel_type == "vec" else (num_ix, 1)
            kernel = self.param("kernel", xavier_uniform_init, shape)
            return jnp.sum(p * q * kernel[None], axis=-1)


class CIN(nn.Module):
    """xDeepFM compressed interaction network.

    Parity: reference `code/layers.py:696-721` — outer product `bhd,bmd->bhmd`,
    1x1 Conv1d (= dense contraction over the h*m axis), sum-pool over the
    embedding axis. Expressed as einsums for the MXU.
    """

    num_fields: int
    cin_layer_units: Sequence[int]

    @nn.compact
    def __call__(self, x0):
        b = x0.shape[0]
        e = x0.shape[-1]
        pooled: List[jnp.ndarray] = []
        xi = x0
        for i, unit in enumerate(self.cin_layer_units):
            in_ch = self.num_fields * (self.cin_layer_units[i - 1] if i > 0 else self.num_fields)
            had = jnp.einsum("bhd,bmd->bhmd", x0, xi).reshape(b, in_ch, e)
            kernel = self.param(f"kernel_{i}", linear_kernel_init, (in_ch, unit))
            bias = self.param(f"bias_{i}", linear_bias_init_for(in_ch), (unit,))
            xi = jnp.einsum("bie,io->boe", had, kernel) + bias[None, :, None]
            pooled.append(jnp.sum(xi, axis=-1))
        return jnp.concatenate(pooled, axis=-1)


class FGCNNBlock(nn.Module):
    """Conv/pool/recombine feature generation (`code/layers.py:204-251`).

    Layout is NHWC (batch, fields, embed, channels) — the TPU-native conv
    layout — vs the reference's NCHW. Each stage: Conv(kh x 1) -> BatchNorm ->
    act -> MaxPool(pool x 1, padded like torch), then a dense "recombine" to
    new field embeddings.
    """

    num_fields: int
    embedding_dim: int
    channels: Sequence[int]
    kernel_heights: Sequence[int]
    pooling_sizes: Sequence[int]
    recombined_channels: Sequence[int]
    activation: str = "tanh"
    batch_norm: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, num_fields, embed, 1)
        act = get_act(self.activation)
        new_features: List[jnp.ndarray] = []
        h = self.num_fields
        out = x
        for i, out_ch in enumerate(self.channels):
            kh = self.kernel_heights[i]
            pool = self.pooling_sizes[i]
            out = nn.Conv(out_ch, kernel_size=(kh, 1),
                          padding=((int((kh - 1) / 2),) * 2, (0, 0)),
                          kernel_init=conv_kernel_init, name=f"conv_{i}")(out)
            if self.batch_norm:
                out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                   epsilon=1e-5, name=f"bn_{i}")(out)
            out = act(out)
            pad = h % pool
            out = nn.max_pool(out, window_shape=(pool, 1), strides=(pool, 1),
                              padding=((pad, pad), (0, 0)))
            h = int(math.ceil(h / pool))
            flat = out.reshape(out.shape[0], -1)
            rec = TorchDense(h * self.embedding_dim * self.recombined_channels[i],
                             name=f"recombine_{i}")(flat)
            rec = act(rec)
            new_features.append(rec.reshape(x.shape[0], -1, self.embedding_dim))
        return jnp.concatenate(new_features, axis=1)


class SqueezeExtractionLayer(nn.Module):
    """SENET squeeze-excite over fields (`code/layers.py:254-268`)."""

    num_fields: int
    reduction_ratio: int = 3

    @nn.compact
    def __call__(self, feature_emb):
        reduced = max(1, self.num_fields // self.reduction_ratio)
        z = jnp.mean(feature_emb, axis=-1)
        a = TorchDense(reduced, use_bias=False, name="excite_0")(z)
        a = jax.nn.relu(a)
        a = TorchDense(self.num_fields, use_bias=False, name="excite_1")(a)
        a = jax.nn.relu(a)
        return feature_emb * a[..., None]


class BilinearInteractionLayer(nn.Module):
    """field_all / field_each / field_interaction bilinear products
    (`code/layers.py:271-297`)."""

    num_fields: int
    embed_size: int
    bilinear_type: str = "field_interaction"

    @nn.compact
    def __call__(self, feature_emb):
        f, e = self.num_fields, self.embed_size
        pairs = list(combinations(range(f), 2))
        iu = np.array([i for i, _ in pairs])
        ju = np.array([j for _, j in pairs])
        if self.bilinear_type == "field_all":
            w = self.param("bilinear", linear_kernel_init, (e, e))
            vi = jnp.einsum("bfe,eg->bfg", feature_emb, w)
            return vi[:, iu] * feature_emb[:, ju]
        elif self.bilinear_type == "field_each":
            w = self.param("bilinear", linear_kernel_init, (f, e, e))
            vi = jnp.einsum("bfe,feg->bfg", feature_emb, w)
            return vi[:, iu] * feature_emb[:, ju]
        elif self.bilinear_type == "field_interaction":
            w = self.param("bilinear", linear_kernel_init, (len(pairs), e, e))
            vi = jnp.einsum("bpe,peg->bpg", feature_emb[:, iu], w)
            return vi * feature_emb[:, ju]
        else:
            raise NotImplementedError(self.bilinear_type)


class GraphLayer(nn.Module):
    """FiGNN per-field message passing (`code/layers.py:300-313`)."""

    num_fields: int
    embed_size: int

    @nn.compact
    def __call__(self, g, h):
        w_in = self.param("W_in", xavier_normal_init,
                          (self.num_fields, self.embed_size, self.embed_size))
        w_out = self.param("W_out", xavier_normal_init,
                           (self.num_fields, self.embed_size, self.embed_size))
        bias_p = self.param("bias_p", nn.initializers.zeros, (self.embed_size,))
        h_out = jnp.einsum("fij,bfj->bfi", w_out, h)
        aggr = jnp.einsum("bfg,bge->bfe", g, h_out)
        return jnp.einsum("fij,bfj->bfi", w_in, aggr) + bias_p


class FiGNNBlock(nn.Module):
    """Field-graph attention + GRU message passing (`code/layers.py:316-365`)."""

    num_fields: int
    embed_size: int
    gnn_layers: int
    use_residual: bool = False
    reuse_graph_layer: bool = False

    def setup(self):
        if self.reuse_graph_layer:
            self.gnn = GraphLayer(self.num_fields, self.embed_size, name="gnn")
        else:
            self.gnn_list = [GraphLayer(self.num_fields, self.embed_size, name=f"gnn_{i}")
                             for i in range(self.gnn_layers)]
        scale = 1.0 / math.sqrt(self.embed_size)
        self.gru = nn.GRUCell(features=self.embed_size,
                              kernel_init=uniform_scale_init(scale),
                              recurrent_kernel_init=uniform_scale_init(scale),
                              name="gru")
        self.w_attn = TorchDense(1, use_bias=False, name="W_attn")

    def build_graph_with_attention(self, feat_embed):
        f = self.num_fields
        src = jnp.repeat(feat_embed, f, axis=1)             # (B, F*F, E) src-major
        dst = jnp.tile(feat_embed, (1, f, 1))               # (B, F*F, E)
        alpha = self.w_attn(jnp.concatenate([src, dst], axis=-1))
        alpha = nn.leaky_relu(alpha, negative_slope=0.01)
        alpha = alpha.reshape(-1, f, f)
        mask = jnp.eye(f, dtype=bool)
        alpha = jnp.where(mask[None], -jnp.inf, alpha)
        return jax.nn.softmax(alpha, axis=-1)  # no self-loops

    def __call__(self, feat_embed):
        g = self.build_graph_with_attention(feat_embed)
        h = feat_embed
        b, f, e = feat_embed.shape
        for i in range(self.gnn_layers):
            gnn = self.gnn if self.reuse_graph_layer else self.gnn_list[i]
            a = gnn(g, h)
            h2, _ = self.gru(h.reshape(-1, e), a.reshape(-1, e))
            h = h2.reshape(b, f, e)
            if self.use_residual:
                h = h + feat_embed
        return h


class AttentionalPrediction(nn.Module):
    """FiGNN head: per-field score x learned gate (`code/layers.py:368-379`)."""

    num_fields: int
    embed_size: int

    @nn.compact
    def __call__(self, h):
        score = TorchDense(1, use_bias=False, name="linear1")(h)[..., 0]  # (B, F)
        weight = jax.nn.sigmoid(
            TorchDense(self.num_fields, use_bias=False, name="linear2")(
                h.reshape(h.shape[0], -1)))
        return jnp.sum(weight * score, axis=1, keepdims=True)


class SelfAttention(nn.Module):
    """BERT-style QKV self-attention (`code/layers.py:382-426`)."""

    hidden_size: int
    num_attn_heads: int
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, hidden_states, train: bool = False):
        head_size = self.hidden_size // self.num_attn_heads
        all_head = self.num_attn_heads * head_size
        q = TorchDense(all_head, name="query")(hidden_states)
        k = TorchDense(all_head, name="key")(hidden_states)
        v = TorchDense(all_head, name="value")(hidden_states)

        def split(x):
            b, n, _ = x.shape
            return x.reshape(b, n, self.num_attn_heads, head_size).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        scores = jnp.einsum("bhqe,bhke->bhqk", q, k) / math.sqrt(head_size)
        probs = jax.nn.softmax(scores, axis=-1)
        probs = nn.Dropout(self.dropout_rate, deterministic=not train)(probs)
        ctx = jnp.einsum("bhqk,bhke->bhqe", probs, v)
        b, h, n, e = ctx.shape
        return ctx.transpose(0, 2, 1, 3).reshape(b, n, h * e)


class MultiHeadSelfAttention(nn.Module):
    """AutoInt attention with align_to residual projection.

    Parity: reference `code/layers.py:848-914` — W_q/k/v without bias, optional
    scale, dropout on probs, align_to='output' projects the residual to the
    output width, post-residual relu (`code/layers.py:907`). Proper head split
    (see module docstring).
    """

    input_dim: int
    attention_dim: int
    num_heads: int = 1
    dropout_rate: float = 0.0
    use_residual: bool = True
    use_scale: bool = False
    layer_norm: bool = False
    align_to: str = "output"

    @nn.compact
    def __call__(self, x, train: bool = False):
        output_dim = self.num_heads * self.attention_dim
        q = TorchDense(output_dim, use_bias=False, name="W_q")(x)
        k = TorchDense(output_dim, use_bias=False, name="W_k")(x)
        v = TorchDense(output_dim, use_bias=False, name="W_v")(x)

        def split(t):
            b, n, _ = t.shape
            return t.reshape(b, n, self.num_heads, self.attention_dim).transpose(0, 2, 1, 3)

        qh, kh, vh = split(q), split(k), split(v)
        scores = jnp.einsum("bhqe,bhke->bhqk", qh, kh)
        if self.use_scale:
            scores = scores / math.sqrt(self.attention_dim)
        probs = jax.nn.softmax(scores, axis=-1)
        if self.dropout_rate > 0:
            probs = nn.Dropout(self.dropout_rate, deterministic=not train)(probs)
        ctx = jnp.einsum("bhqk,bhke->bhqe", probs, vh)
        b, h, n, e = ctx.shape
        out = ctx.transpose(0, 2, 1, 3).reshape(b, n, h * e)

        residual = x
        if self.input_dim != output_dim:
            if self.align_to == "output":  # AutoInt style
                residual = TorchDense(output_dim, use_bias=False, name="W_res")(residual)
            elif self.align_to == "input":  # Transformer style
                out = TorchDense(self.input_dim, use_bias=False, name="W_res")(out)
        if self.use_residual:
            out = out + residual
        if self.layer_norm:
            out = nn.LayerNorm(name="ln")(out)
        return jax.nn.relu(out)


class TransformerEncoderLayer(nn.Module):
    """torch.nn.TransformerEncoderLayer parity (batch_first, post/pre-norm).

    Used by the `trans` model (`code/models.py:502-512`): MHA with in/out
    projection biases, FFN dim_feedforward, dropout, layer_norm_eps,
    norm_first.
    """

    d_model: int
    nhead: int
    dim_feedforward: int
    dropout_rate: float = 0.0
    activation: str = "relu"
    layer_norm_eps: float = 1e-12
    norm_first: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = get_act(self.activation)

        def attn_block(h):
            head = self.d_model // self.nhead
            q = TorchDense(self.d_model, name="q_proj")(h)
            k = TorchDense(self.d_model, name="k_proj")(h)
            v = TorchDense(self.d_model, name="v_proj")(h)

            def split(t):
                b, n, _ = t.shape
                return t.reshape(b, n, self.nhead, head).transpose(0, 2, 1, 3)

            qh, kh, vh = split(q), split(k), split(v)
            scores = jnp.einsum("bhqe,bhke->bhqk", qh, kh) / math.sqrt(head)
            probs = jax.nn.softmax(scores, axis=-1)
            probs = nn.Dropout(self.dropout_rate, deterministic=not train)(probs)
            ctx = jnp.einsum("bhqk,bhke->bhqe", probs, vh)
            b, nh, n, e = ctx.shape
            ctx = ctx.transpose(0, 2, 1, 3).reshape(b, n, nh * e)
            ctx = TorchDense(self.d_model, name="out_proj")(ctx)
            return nn.Dropout(self.dropout_rate, deterministic=not train)(ctx)

        def ff_block(h):
            h = TorchDense(self.dim_feedforward, name="linear1")(h)
            h = act(h)
            h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
            h = TorchDense(self.d_model, name="linear2")(h)
            return nn.Dropout(self.dropout_rate, deterministic=not train)(h)

        ln1 = nn.LayerNorm(epsilon=self.layer_norm_eps, name="norm1")
        ln2 = nn.LayerNorm(epsilon=self.layer_norm_eps, name="norm2")
        if self.norm_first:
            x = x + attn_block(ln1(x))
            x = x + ff_block(ln2(x))
        else:
            x = ln1(x + attn_block(x))
            x = ln2(x + ff_block(x))
        return x


class IntermediateLayer(nn.Module):
    """Transformer FFN with pre/post-LN (`code/layers.py:581-611`)."""

    hidden_size: int
    intermediate_size: int
    hidden_act: str = "relu"
    dropout_rate: float = 0.0
    res_conn: bool = False
    use_layer_norm: bool = False
    norm_first: bool = False
    layer_norm_eps: float = 1e-12

    @nn.compact
    def __call__(self, h, train: bool = False):
        inp = h
        ln = nn.LayerNorm(epsilon=self.layer_norm_eps, name="ln") if self.use_layer_norm else None
        if ln is not None and self.norm_first:
            h = ln(h)
        h = TorchDense(self.intermediate_size, name="dense1")(h)
        h = get_act(self.hidden_act)(h)
        h = TorchDense(self.hidden_size, name="dense2")(h)
        h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        if self.res_conn:
            h = h + inp
        if ln is not None and not self.norm_first:
            h = ln(h)
        return h
