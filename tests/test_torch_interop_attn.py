"""Torch interop for the attention-family models (autoint, trans, fignn,
fgcnn): converted reference-named state_dicts must reproduce the torch
forward. The torch oracles mirror the reference module naming and math
(`code/models.py:410-568`, `code/layers.py:204-251,300-379,848-914`).

These double as numerical parity tests of our attention / GRU / conv stacks
against torch itself.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from map_tpu import models  # noqa: E402
from map_tpu.interop.torch_import import (  # noqa: E402
    apply_stats_rules,
    convert_state_dict,
    export_state_dict,
)

from conftest import base_model_config  # noqa: E402


def _np_sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def _jax_model(cfg):
    model = models.from_config(cfg)
    ids = jnp.zeros((3, cfg.num_fields), jnp.int32)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, ids,
                           train=False)
    return model, variables


def _check(model, new_params, torch_fwd, v, f, batch_stats=None, tol=3e-5):
    rng = np.random.default_rng(0)
    ids_np = rng.integers(0, v, (32, f))
    variables = {"params": new_params}
    if batch_stats is not None:
        variables["batch_stats"] = batch_stats
    ours = model.apply(variables, jnp.asarray(ids_np, jnp.int32)).reshape(-1)
    with torch.no_grad():
        theirs = torch_fwd(torch.from_numpy(ids_np)).reshape(-1).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=tol, atol=tol)


# ---------------------------------------------------------------------------
# AutoInt
# ---------------------------------------------------------------------------


class TorchMHSA(nn.Module):
    """`code/layers.py:848-914` (align_to=output, layer_norm off)."""

    def __init__(self, input_dim, attn_dim, heads, use_residual, use_scale):
        super().__init__()
        self.attention_dim, self.num_heads = attn_dim, heads
        self.output_dim = heads * attn_dim
        self.use_residual, self.scale = use_residual, (
            attn_dim ** 0.5 if use_scale else None)
        self.W_q = nn.Linear(input_dim, self.output_dim, bias=False)
        self.W_k = nn.Linear(input_dim, self.output_dim, bias=False)
        self.W_v = nn.Linear(input_dim, self.output_dim, bias=False)
        self.W_res = (nn.Linear(input_dim, self.output_dim, bias=False)
                      if input_dim != self.output_dim else None)

    def forward(self, x):
        # NOTE: proper (channel-axis) head split. The reference's
        # `view(b*heads, -1, attn_dim)` (`code/layers.py:887-889`) slices the
        # FIELD axis into "heads" instead — a layout quirk our TPU build
        # deliberately fixes (map_tpu/nn/layers.py MultiHeadSelfAttention
        # docstring); with num_heads=1 the two are identical.
        residual = x
        b, n, _ = x.shape
        h, a = self.num_heads, self.attention_dim

        def split(t):
            return t.view(b, n, h, a).transpose(1, 2)  # (B, H, N, A)

        q, k, v = split(self.W_q(x)), split(self.W_k(x)), split(self.W_v(x))
        scores = torch.matmul(q, k.transpose(-1, -2))
        if self.scale:
            scores = scores / self.scale
        out = torch.matmul(F.softmax(scores, dim=-1), v)
        out = out.transpose(1, 2).reshape(b, n, self.output_dim)
        if self.W_res is not None:
            residual = self.W_res(residual)
        if self.use_residual:
            out = out + residual
        return out.relu()


class TorchAutoInt(nn.Module):
    def __init__(self, v, f, e, heads, attn_size, n_layers, use_lr,
                 dnn_size, n_dnn):
        super().__init__()
        from test_torch_interop import TorchEmbeddings, TorchMLP

        self.embed = TorchEmbeddings(v, e)
        dims = [e] + [heads * attn_size] * n_layers
        self.self_attention = nn.Sequential(
            *[TorchMHSA(dims[i], attn_size, heads, use_residual=False,
                        use_scale=False) for i in range(n_layers)])
        final = f * heads * attn_size
        self.attn_out = nn.Linear(final, 1)
        if use_lr:
            class TorchLR(nn.Module):
                def __init__(self):
                    super().__init__()
                    self.embed_w = nn.Embedding(v, 1)
                    self.bias = nn.Parameter(torch.zeros(1))

                def forward(self, ids):
                    return self.embed_w(ids).sum(dim=1) + self.bias

            self.lr_layer = TorchLR()
        else:
            self.lr_layer = None
        self.dnn = TorchMLP(f * e, dnn_size, n_dnn) if n_dnn else None
        self.dnn_out = nn.Linear(dnn_size, 1) if n_dnn else None

    def forward(self, ids):
        x = self.embed(ids)
        a = torch.flatten(self.self_attention(x), 1)
        logits = self.attn_out(a)
        if self.lr_layer is not None:
            logits = logits + self.lr_layer(ids)
        if self.dnn is not None:
            logits = logits + self.dnn_out(self.dnn(torch.flatten(x, 1)))
        return logits.squeeze(-1)


def test_autoint_forward_matches_torch():
    v, f, e, heads, attn_size, n_layers = 200, 8, 16, 2, 8, 2
    tm = TorchAutoInt(v, f, e, heads, attn_size, n_layers, use_lr=True,
                      dnn_size=16, n_dnn=1).eval()
    cfg = base_model_config(model_name="autoint", input_size=v, num_fields=f,
                            embed_size=e, num_attn_heads=heads, attn_size=attn_size,
                            num_attn_layers=n_layers, use_lr=True,
                            dnn_size=16, num_dnn_layers=1, dnn_drop=0.0,
                            res_conn=False, attn_scale=False)
    model, variables = _jax_model(cfg)
    new_params, loaded, skipped = convert_state_dict(
        _np_sd(tm), "autoint", cfg, variables["params"])
    assert loaded == len(_np_sd(tm)), f"skipped: {skipped}"
    _check(model, new_params, tm, v, f)


# ---------------------------------------------------------------------------
# Transformer (torch nn.TransformerEncoder is the oracle)
# ---------------------------------------------------------------------------


class TorchTrans(nn.Module):
    def __init__(self, v, f, e, heads, ffn, n_layers):
        super().__init__()
        from test_torch_interop import TorchEmbeddings

        self.embed = TorchEmbeddings(v, e)
        layer = nn.TransformerEncoderLayer(
            d_model=e, nhead=heads, dim_feedforward=ffn, dropout=0.0,
            activation="relu", layer_norm_eps=1e-12, batch_first=True,
            norm_first=False)
        self.encoder = nn.TransformerEncoder(layer, n_layers)
        self.field_reduction_attn = nn.Sequential(
            nn.Linear(e, e), nn.ReLU(), nn.Linear(e, 1), nn.Softmax(dim=1))
        self.trans_out = nn.Linear(e, 1)

    def forward(self, ids):
        x = self.encoder(self.embed(ids))
        score = self.field_reduction_attn(x)
        feat = torch.sum(x * score, dim=1)
        return self.trans_out(feat).squeeze(-1)


def test_transformer_forward_matches_torch():
    v, f, e, heads, ffn, n_layers = 200, 8, 16, 2, 32, 2
    tm = TorchTrans(v, f, e, heads, ffn, n_layers).eval()
    cfg = base_model_config(model_name="trans", input_size=v, num_fields=f,
                            embed_size=e, hidden_size=e, num_attn_heads=heads,
                            intermediate_size=ffn, num_hidden_layers=n_layers,
                            hidden_act="relu", norm_first=False,
                            output_reduction="attn,fc", use_lr=False,
                            num_dnn_layers=0, attn_probs_dropout_rate=0.0,
                            hidden_dropout_rate=0.0)
    model, variables = _jax_model(cfg)
    sd = _np_sd(tm)
    new_params, loaded, skipped = convert_state_dict(
        sd, "trans", cfg, variables["params"])
    assert loaded == sum(1 for leaf in jax.tree.leaves(new_params)), \
        f"skipped: {skipped}"
    _check(model, new_params, tm, v, f, tol=1e-4)


# ---------------------------------------------------------------------------
# FiGNN
# ---------------------------------------------------------------------------


class TorchGraphLayer(nn.Module):
    def __init__(self, f, e):
        super().__init__()
        self.W_in = nn.Parameter(torch.randn(f, e, e))
        self.W_out = nn.Parameter(torch.randn(f, e, e))
        self.bias_p = nn.Parameter(torch.zeros(e))

    def forward(self, g, h):
        h_out = torch.matmul(self.W_out, h.unsqueeze(-1)).squeeze(-1)
        aggr = torch.bmm(g, h_out)
        return torch.matmul(self.W_in, aggr.unsqueeze(-1)).squeeze(-1) + self.bias_p


class TorchFiGNN(nn.Module):
    def __init__(self, v, f, e, n_layers, res_conn=False):
        super().__init__()
        from itertools import product

        from test_torch_interop import TorchEmbeddings

        self.embed = TorchEmbeddings(v, e)
        self.f, self.e, self.n, self.res = f, e, n_layers, res_conn

        class Block(nn.Module):
            def __init__(self):
                super().__init__()
                self.gnn = nn.ModuleList(TorchGraphLayer(f, e)
                                         for _ in range(n_layers))
                self.gru = nn.GRUCell(e, e)
                self.W_attn = nn.Linear(2 * e, 1, bias=False)

        self.fignn = Block()
        self.src, self.dst = zip(*list(product(range(f), repeat=2)))

        class Fc(nn.Module):
            def __init__(self):
                super().__init__()
                self.linear1 = nn.Linear(e, 1, bias=False)
                self.linear2 = nn.Sequential(
                    nn.Linear(f * e, f, bias=False), nn.Sigmoid())

        self.fc = Fc()

    def forward(self, ids):
        x = self.embed(ids)
        src, dst = x[:, list(self.src)], x[:, list(self.dst)]
        alpha = F.leaky_relu(self.fignn.W_attn(
            torch.cat([src, dst], dim=-1)), negative_slope=0.01)
        alpha = alpha.view(-1, self.f, self.f)
        alpha = alpha.masked_fill(torch.eye(self.f).bool(), float("-inf"))
        g = F.softmax(alpha, dim=-1)
        h = x
        for i in range(self.n):
            a = self.fignn.gnn[i](g, h)
            h = self.fignn.gru(a.view(-1, self.e),
                               h.reshape(-1, self.e)).view(-1, self.f, self.e)
            if self.res:
                h = h + x
        score = self.fc.linear1(h).squeeze(-1)
        weight = self.fc.linear2(torch.flatten(h, 1))
        return (weight * score).sum(dim=1)


def test_fignn_forward_matches_torch():
    v, f, e, n_layers = 200, 8, 16, 2
    tm = TorchFiGNN(v, f, e, n_layers).eval()
    cfg = base_model_config(model_name="fignn", input_size=v, num_fields=f,
                            embed_size=e, num_hidden_layers=n_layers,
                            res_conn=False, reuse_graph_layer=False)
    model, variables = _jax_model(cfg)
    sd = _np_sd(tm)
    new_params, loaded, skipped = convert_state_dict(
        sd, "fignn", cfg, variables["params"])
    assert loaded == sum(1 for leaf in jax.tree.leaves(new_params)), \
        f"skipped: {skipped}"
    _check(model, new_params, tm, v, f, tol=1e-4)


# ---------------------------------------------------------------------------
# FGCNN
# ---------------------------------------------------------------------------


class TorchFGCNNBlock(nn.Module):
    """`code/layers.py:204-251` with batch_norm=True, Tanh."""

    def __init__(self, f, e, channels, kernel_heights, pooling_sizes,
                 recombined):
        super().__init__()
        import math

        conv_list, recombine_list = [], []
        chans = [1] + channels
        h = f
        self.e = e
        for i in range(1, len(chans)):
            kh, ps, rc = kernel_heights[i - 1], pooling_sizes[i - 1], recombined[i - 1]
            conv_list.append(nn.Sequential(
                nn.Conv2d(chans[i - 1], chans[i], kernel_size=(kh, 1),
                          padding=((kh - 1) // 2, 0)),
                nn.BatchNorm2d(chans[i]),
                nn.Tanh(),
                nn.MaxPool2d((ps, 1), padding=(h % ps, 0))))
            h = int(math.ceil(h / ps))
            recombine_list.append(nn.Sequential(
                nn.Linear(h * e * chans[i], h * e * rc), nn.Tanh()))
        self.conv_layers = nn.ModuleList(conv_list)
        self.recombine_layers = nn.ModuleList(recombine_list)

    def forward(self, x):  # x (B, 1, F, E)
        out, feats = x, []
        for conv, rec in zip(self.conv_layers, self.recombine_layers):
            out = conv(out)
            feats.append(rec(torch.flatten(out, 1)).reshape(x.shape[0], -1, self.e))
        return torch.cat(feats, dim=1)


class TorchFGCNN(nn.Module):
    def __init__(self, v, f, e, channels, kernel_heights, pooling_sizes,
                 recombined, hidden, n_mlp):
        super().__init__()
        from test_torch_interop import TorchEmbeddings, TorchMLP

        self.embed = TorchEmbeddings(v, e)
        self.fg_embed = TorchEmbeddings(v, e)
        self.fgcnn_layer = TorchFGCNNBlock(f, e, channels, kernel_heights,
                                           pooling_sizes, recombined)
        import math

        h, total_new = f, 0
        for ps, rc in zip(pooling_sizes, recombined):
            h = int(math.ceil(h / ps))
            total_new += h * rc
        total = f + total_new
        final = int(total * (total - 1) / 2) + total * e
        self.dnn = TorchMLP(final, hidden, n_mlp)
        self.fc_out = nn.Linear(hidden, 1)
        self.total = total

    def forward(self, ids):
        x = self.embed(ids)
        fg = self.fg_embed(ids)
        new_feats = self.fgcnn_layer(fg.unsqueeze(1))
        combined = torch.cat([x, new_feats], dim=1)      # (B, T, E)
        # inner products, upper triangle (layers.py:132-135)
        b, t, e = combined.shape
        prods = torch.bmm(combined, combined.transpose(1, 2))
        iu = torch.triu_indices(t, t, offset=1)
        ip = prods[:, iu[0], iu[1]]
        final = torch.cat([torch.flatten(combined, 1), ip], dim=1)
        return self.fc_out(self.dnn(final)).squeeze(-1)


def test_fgcnn_forward_matches_torch():
    v, f, e = 200, 8, 16
    channels, khs, pss, rcs = [3, 4], [3, 3], [2, 2], [2, 2]
    tm = TorchFGCNN(v, f, e, channels, khs, pss, rcs, hidden=32, n_mlp=1)
    # randomize running stats so eval-mode BN actually tests the conversion
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    tm = tm.eval()
    cfg = base_model_config(model_name="fgcnn", input_size=v, num_fields=f,
                            embed_size=e, share_embedding=False,
                            channels="3,4", kernel_heights="3,3",
                            pooling_sizes="2,2", recombined_channels="2,2",
                            conv_act="tanh", hidden_size=32,
                            num_hidden_layers=1, hidden_dropout_rate=0.0)
    model, variables = _jax_model(cfg)
    sd = _np_sd(tm)
    new_params, loaded, skipped = convert_state_dict(
        sd, "fgcnn", cfg, variables["params"])
    new_bs, n_bs = apply_stats_rules(sd, "fgcnn", cfg,
                                     variables["batch_stats"], skipped)
    assert loaded == sum(1 for leaf in jax.tree.leaves(new_params)), \
        f"skipped: {skipped}"
    assert n_bs == sum(1 for leaf in jax.tree.leaves(new_bs))
    _check(model, new_params, tm, v, f, batch_stats=new_bs, tol=2e-4)


@pytest.mark.parametrize("name,over", [
    ("autoint", dict(use_lr=True, num_dnn_layers=1)),
    ("trans", dict(embed_size=16, hidden_size=16, output_reduction="attn,fc",
                   use_lr=True, num_dnn_layers=1)),
    ("fignn", dict(reuse_graph_layer=True)),
    ("fgcnn", dict(share_embedding=True)),
])
def test_export_import_round_trip_attn_family(name, over):
    cfg = base_model_config(model_name=name, **over)
    model, variables = _jax_model(cfg)
    sd = export_state_dict(variables["params"], name, cfg)
    assert sd
    _, variables2 = _jax_model(cfg)
    new_params, loaded, _ = convert_state_dict(sd, name, cfg,
                                               variables2["params"])
    flat_b = {jax.tree_util.keystr(p): v for p, v in
              jax.tree_util.tree_leaves_with_path(new_params)}
    for p, v in jax.tree_util.tree_leaves_with_path(variables["params"]):
        np.testing.assert_allclose(np.asarray(v), flat_b[jax.tree_util.keystr(p)],
                                   rtol=1e-6, atol=1e-6,
                                   err_msg=jax.tree_util.keystr(p))
