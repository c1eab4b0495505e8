"""Model zoo: shapes, registry, pretrain heads (SURVEY.md §2.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import map_tpu.models as models
from tests.conftest import base_model_config

ALL_MODELS = ["lr", "fm", "dnn", "deepfm", "xdeepfm", "dcnv2", "fgcnn",
              "fignn", "autoint", "trans"]
PRETRAIN_CAPABLE = ["dnn", "deepfm", "xdeepfm", "dcnv2", "fgcnn", "fignn",
                    "autoint", "trans"]


def _ids(b=4, f=8, v=400, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(10, v, (b, f)), jnp.int32)


@pytest.mark.parametrize("name", ALL_MODELS)
def test_supervised_forward(name):
    cfg = base_model_config(model_name=name,
                            hidden_size=16 if name == "trans" else 32)
    m = models.from_config(cfg)
    ids = _ids()
    variables = m.init({"params": jax.random.PRNGKey(0),
                        "dropout": jax.random.PRNGKey(1)}, ids)
    out = m.apply(variables, ids)
    assert out.shape == (4, 1)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("name", PRETRAIN_CAPABLE)
def test_mfp_head(name):
    probs = np.full(400, 1 / 400)
    cfg = base_model_config(model_name=name, pretrain=True, pt_type="MFP",
                            hidden_size=16 if name == "trans" else 32)
    cfg.logprob_noise = np.log(probs).astype(np.float32)
    cfg.norm_term = float(np.log(400))
    m = models.from_config(cfg)
    ids = _ids()
    mi = jnp.asarray(np.random.default_rng(0).integers(0, 8, (4, 2)), jnp.int32)
    cand = jnp.asarray(np.random.default_rng(1).integers(10, 400, (4, 2, 6)), jnp.int32)
    variables = m.init({"params": jax.random.PRNGKey(0),
                        "dropout": jax.random.PRNGKey(1)},
                       ids, masked_index=mi, candidates=cand)
    logits = m.apply(variables, ids, masked_index=mi, candidates=cand)
    assert logits.shape == (4, 2, 6)


@pytest.mark.parametrize("name", ["dcnv2", "dnn"])
def test_rfd_head(name):
    cfg = base_model_config(model_name=name, pretrain=True, pt_type="RFD")
    m = models.from_config(cfg)
    ids = _ids()
    variables = m.init({"params": jax.random.PRNGKey(0),
                        "dropout": jax.random.PRNGKey(1)}, ids)
    logits = m.apply(variables, ids)
    assert logits.shape == (4, 8)  # per-field logits


def test_registry_unknown_model():
    with pytest.raises(NotImplementedError):
        models.from_config(base_model_config(model_name="nope"))


def test_trans_requires_embed_eq_hidden():
    cfg = base_model_config(model_name="trans", embed_size=16, hidden_size=32)
    m = models.from_config(cfg)
    with pytest.raises(AssertionError):
        m.validate_model_config()


def test_pretrain_and_finetune_share_backbone_names():
    """The finetune partial restore relies on identical backbone param paths."""
    from flax import traverse_util

    probs = np.full(400, 1 / 400)
    cfg_pt = base_model_config(model_name="dcnv2", pretrain=True, pt_type="MFP")
    cfg_pt.logprob_noise = np.log(probs).astype(np.float32)
    cfg_pt.norm_term = float(np.log(400))
    cfg_ft = base_model_config(model_name="dcnv2", pretrain=False)
    ids = _ids()
    mi = jnp.zeros((4, 2), jnp.int32)
    cand = jnp.zeros((4, 2, 6), jnp.int32)
    m_pt = models.from_config(cfg_pt)
    m_ft = models.from_config(cfg_ft)
    v_pt = m_pt.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                     ids, masked_index=mi, candidates=cand)
    v_ft = m_ft.init({"params": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)},
                     ids)
    flat_pt = set(traverse_util.flatten_dict(v_pt["params"]).keys())
    flat_ft = set(traverse_util.flatten_dict(v_ft["params"]).keys())
    shared = flat_pt & flat_ft
    # backbone (embed + cross + dnn) overlaps; heads differ
    assert any(k[0] == "embed" for k in shared)
    assert any(k[0] == "cross_net" for k in shared)
    assert any(k[0] == "parallel_dnn" for k in shared)
    assert not any(k[0] == "fc_out" for k in flat_pt)
    assert not any(k[0] == "feat_encoder" for k in flat_ft)
