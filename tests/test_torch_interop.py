"""Torch checkpoint interop: reference-named state_dicts convert to map_tpu
params and reproduce the torch forward bit-for-bit (float32 tolerance).

The torch oracles here are independent implementations that mirror the
reference's MODULE NAMING and math (`code/models.py:282-322` DCNv2,
`code/models.py:164-193` DNN, heads at `code/models.py:114-126`,
`code/nce/index_linear.py:86-106`) — they define the state_dict contract the
converter must satisfy.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from map_tpu import models  # noqa: E402
from map_tpu.interop.torch_import import (  # noqa: E402
    convert_state_dict,
    export_state_dict,
    load_torch_checkpoint,
    save_torch_checkpoint,
)

from conftest import base_model_config  # noqa: E402


class TorchMLP(nn.Module):
    def __init__(self, input_dim, hidden, n_layers):
        super().__init__()
        layers = []
        for _ in range(n_layers):
            layers += [nn.Linear(input_dim, hidden), nn.ReLU(), nn.Dropout(0.0)]
            input_dim = hidden
        self.dnn = nn.Sequential(*layers)

    def forward(self, x):
        return self.dnn(x)


class TorchEmbeddings(nn.Module):
    def __init__(self, v, e):
        super().__init__()
        self.embedding = nn.Embedding(v, e)

    def forward(self, ids):
        return self.embedding(ids)


class TorchCrossNet(nn.Module):
    def __init__(self, dim, n):
        super().__init__()
        self.cross_layers = nn.ModuleList(nn.Linear(dim, dim) for _ in range(n))

    def forward(self, x0):
        xi = x0
        for layer in self.cross_layers:
            xi = xi + x0 * layer(xi)
        return xi


class TorchDCNv2(nn.Module):
    """Reference-named DCNv2 (embed / cross_net / parallel_dnn / fc_out)."""

    def __init__(self, v, f, e, hidden, n_mlp, n_cross, pretrain=False,
                 proj=8):
        super().__init__()
        self.embed = TorchEmbeddings(v, e)
        dim = f * e
        self.cross_net = TorchCrossNet(dim, n_cross)
        self.parallel_dnn = TorchMLP(dim, hidden, n_mlp)
        if pretrain:
            self.feat_encoder = nn.Linear(dim + hidden, f * proj)

            class Crit(nn.Module):
                def __init__(self):
                    super().__init__()
                    self.emb = nn.Embedding(v, proj)
                    self.bias = nn.Embedding(v, 1)

            self.mfp_criterion = Crit()
        else:
            self.fc_out = nn.Linear(dim + hidden, 1)

    def backbone(self, ids):
        x = self.embed(ids).flatten(1)
        return torch.cat([self.cross_net(x), self.parallel_dnn(x)], dim=-1)

    def forward(self, ids):
        return self.fc_out(self.backbone(ids)).squeeze(-1)

    def mfp_candidate_logits(self, ids, masked_index, candidates):
        f, proj = masked_index.shape[1], self.mfp_criterion.emb.embedding_dim
        b = ids.shape[0]
        enc = self.feat_encoder(self.backbone(ids)).view(b, -1, proj)
        sel = torch.gather(enc, 1,
                           masked_index.unsqueeze(-1).repeat(1, 1, proj))
        rows = self.mfp_criterion.emb(candidates)          # (B, M, C, proj)
        bias = self.mfp_criterion.bias(candidates)[..., 0]  # (B, M, C)
        return torch.einsum("bme,bmce->bmc", sel, rows) + bias


def _np_sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def _jax_model(cfg, pretrain=False):
    model = models.from_config(cfg)
    ids = jnp.zeros((3, cfg.num_fields), jnp.int32)
    kwargs = {}
    if pretrain:
        kwargs = {"masked_index": jnp.zeros((3, 2), jnp.int32),
                  "candidates": jnp.zeros((3, 2, 4), jnp.int32)}
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, ids,
                           train=False, **kwargs)
    return model, variables


def test_dcnv2_supervised_forward_matches_torch():
    v, f, e, hidden, n_mlp, n_cross = 300, 8, 16, 32, 2, 2
    tm = TorchDCNv2(v, f, e, hidden, n_mlp, n_cross).eval()
    cfg = base_model_config(model_name="dcnv2", input_size=v, num_fields=f,
                            embed_size=e, hidden_size=hidden,
                            num_hidden_layers=n_mlp, num_cross_layers=n_cross)
    model, variables = _jax_model(cfg)
    new_params, loaded, skipped = convert_state_dict(
        _np_sd(tm), "dcnv2", cfg, variables["params"])
    assert loaded == len(_np_sd(tm)), f"skipped: {skipped}"

    rng = np.random.default_rng(0)
    ids_np = rng.integers(0, v, (64, f))
    ours = model.apply({"params": new_params},
                       jnp.asarray(ids_np, jnp.int32)).reshape(-1)
    with torch.no_grad():
        theirs = tm(torch.from_numpy(ids_np)).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=2e-5, atol=2e-5)


def test_dcnv2_mfp_head_matches_torch():
    v, f, e, hidden, n_mlp, n_cross, proj = 300, 8, 16, 32, 2, 2, 8
    tm = TorchDCNv2(v, f, e, hidden, n_mlp, n_cross, pretrain=True,
                    proj=proj).eval()
    cfg = base_model_config(model_name="dcnv2", input_size=v, num_fields=f,
                            embed_size=e, hidden_size=hidden,
                            num_hidden_layers=n_mlp, num_cross_layers=n_cross,
                            pretrain=True, pt_type="MFP", proj_size=proj,
                            nce_grad="xla")
    cfg.feat_count = np.ones(v, np.float32)
    cfg.logprob_noise = np.full(v, -np.log(v), np.float32)
    cfg.norm_term = float(np.log(v))
    model, variables = _jax_model(cfg, pretrain=True)
    new_params, loaded, skipped = convert_state_dict(
        _np_sd(tm), "dcnv2", cfg, variables["params"])
    assert loaded == len(_np_sd(tm)), f"skipped: {skipped}"

    rng = np.random.default_rng(1)
    b, m, c = 16, 2, 4
    ids_np = rng.integers(0, v, (b, f))
    mi_np = np.stack([rng.choice(f, m, replace=False) for _ in range(b)])
    cand_np = rng.integers(0, v, (b, m, c))
    ours = model.apply({"params": new_params}, jnp.asarray(ids_np, jnp.int32),
                       masked_index=jnp.asarray(mi_np, jnp.int32),
                       candidates=jnp.asarray(cand_np, jnp.int32))
    with torch.no_grad():
        theirs = tm.mfp_candidate_logits(torch.from_numpy(ids_np),
                                         torch.from_numpy(mi_np),
                                         torch.from_numpy(cand_np)).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=2e-5, atol=2e-5)


def test_pretrain_checkpoint_partial_import_drops_heads():
    """Reference workflow: import a PRETRAIN torch checkpoint into a
    SUPERVISED model — heads skip silently, backbone loads (models.py:97-107)."""
    v, f = 300, 8
    tm = TorchDCNv2(v, f, 16, 32, 2, 2, pretrain=True).eval()
    cfg = base_model_config(model_name="dcnv2", input_size=v, num_fields=f,
                            num_hidden_layers=2, num_cross_layers=2)
    model, variables = _jax_model(cfg)
    sd = _np_sd(tm)
    new_params, loaded, skipped = convert_state_dict(
        sd, "dcnv2", cfg, variables["params"])
    assert any("mfp_criterion" in k for k in skipped)
    assert any("feat_encoder" in k for k in skipped)
    np.testing.assert_array_equal(new_params["embed"]["embedding"],
                                  sd["embed.embedding.weight"])


def test_dnn_forward_matches_torch():
    v, f, e, hidden, n_mlp = 200, 6, 8, 16, 2

    class TorchDNN(nn.Module):
        def __init__(self):
            super().__init__()
            self.embed = TorchEmbeddings(v, e)
            self.dnn = TorchMLP(f * e, hidden, n_mlp)
            self.fc_out = nn.Linear(hidden, 1)

        def forward(self, ids):
            return self.fc_out(self.dnn(self.embed(ids).flatten(1))).squeeze(-1)

    tm = TorchDNN().eval()
    cfg = base_model_config(model_name="dnn", input_size=v, num_fields=f,
                            embed_size=e, hidden_size=hidden,
                            num_hidden_layers=n_mlp)
    model, variables = _jax_model(cfg)
    new_params, loaded, skipped = convert_state_dict(
        _np_sd(tm), "dnn", cfg, variables["params"])
    assert loaded == len(_np_sd(tm)), f"skipped: {skipped}"
    rng = np.random.default_rng(2)
    ids_np = rng.integers(0, v, (32, f))
    ours = model.apply({"params": new_params},
                       jnp.asarray(ids_np, jnp.int32)).reshape(-1)
    with torch.no_grad():
        theirs = tm(torch.from_numpy(ids_np)).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("name", ["deepfm", "xdeepfm", "lr", "fm"])
def test_export_import_round_trip(name):
    cfg = base_model_config(model_name=name, num_hidden_layers=2, use_lr=True)
    model, variables = _jax_model(cfg)
    sd = export_state_dict(variables["params"], name, cfg)
    assert sd, "export produced no tensors"
    # round-trip into a fresh init must restore the exported tensors exactly
    model2, variables2 = _jax_model(cfg)
    new_params, loaded, _ = convert_state_dict(sd, name, cfg,
                                               variables2["params"])
    assert loaded == len(sd)
    flat_a = jax.tree_util.tree_leaves_with_path(variables["params"])
    flat_b = {jax.tree_util.keystr(p): v for p, v in
              jax.tree_util.tree_leaves_with_path(new_params)}
    for p, v in flat_a:
        np.testing.assert_array_equal(np.asarray(v), flat_b[jax.tree_util.keystr(p)])


def test_cli_round_trip(tmp_path):
    from map_tpu.interop.torch_import import main
    from map_tpu.train.checkpoints import load_model_file

    v, f = 300, 8
    tm = TorchDCNv2(v, f, 16, 32, 2, 2).eval()
    tpath = str(tmp_path / "ref_9.model")
    save_torch_checkpoint(_np_sd(tm), tpath)
    # torch -> map_tpu
    out = str(tmp_path / "converted.model")
    rc = main(["--torch_checkpoint", tpath, "--out", out,
               "--input_size", str(v), "--num_fields", str(f),
               "--model_name", "dcnv2", "--embed_size", "16",
               "--hidden_size", "32", "--num_hidden_layers", "2",
               "--num_cross_layers", "2", "--hidden_dropout_rate", "0.0"])
    assert rc == 0
    restored = load_model_file(out)
    np.testing.assert_array_equal(restored["params"]["embed"]["embedding"],
                                  _np_sd(tm)["embed.embedding.weight"])
    # map_tpu -> torch
    back = str(tmp_path / "back.model")
    rc = main(["--torch_checkpoint", out, "--out", back, "--reverse",
               "--input_size", str(v), "--num_fields", str(f),
               "--model_name", "dcnv2", "--embed_size", "16",
               "--hidden_size", "32", "--num_hidden_layers", "2",
               "--num_cross_layers", "2", "--hidden_dropout_rate", "0.0"])
    assert rc == 0
    sd_back = load_torch_checkpoint(back)
    np.testing.assert_allclose(sd_back["cross_net.cross_layers.0.weight"],
                               _np_sd(tm)["cross_net.cross_layers.0.weight"])
