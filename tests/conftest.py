"""Test configuration: force CPU JAX with an 8-device virtual mesh.

Multi-chip sharding is validated on a virtual CPU mesh
(`--xla_force_host_platform_device_count=8`) because real multi-chip hardware
is not available in CI (SURVEY.md §4 test strategy, tier 3).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

from map_tpu.config import Config  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force CPU via config
# so the 8-device virtual mesh is what tests actually run on.
jax.config.update("jax_platforms", "cpu")

# Numerics tests compare against float32/float64 oracles; JAX's default
# matmul precision is the fast TPU-native one (bf16-class passes), so pin
# full precision for the test session.
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture(autouse=True)
def _reset_table_context():
    """The table-sharding context is process-global and consulted at trace
    time; an e2e test that ends mid-mesh (run.main leaves it set) must not
    leak shard_map routing into the next test's traces."""
    from map_tpu.parallel.context import set_table_exchange, set_table_mesh

    set_table_mesh(None)
    set_table_exchange("psum")
    yield
    set_table_mesh(None)
    set_table_exchange("psum")


@pytest.fixture(scope="session")
def synth_dir(tmp_path_factory):
    from map_tpu.data import synth

    d = tmp_path_factory.mktemp("synthdata")
    synth.generate(str(d), name="synth", num_rows=4000, num_fields=8,
                   vocab_per_field=25, seed=0)
    return str(d)


def base_model_config(**overrides):
    cfg = dict(
        model_name="dcnv2", input_size=400, num_fields=8, embed_size=16,
        hidden_size=32, num_hidden_layers=2, hidden_act="relu",
        hidden_dropout_rate=0.0, num_cross_layers=2, pretrain=False,
        embed_norm=False, layer_norm_eps=1e-12, embed_dropout_rate=0.0,
        use_pallas=False, cin_layer_units="8,8", use_lr=False,
        share_embedding=True, channels="3,4", kernel_heights="3,3",
        pooling_sizes="2,2", recombined_channels="2,2", conv_act="tanh",
        res_conn=False, reuse_graph_layer=False, num_attn_heads=2,
        attn_size=8, num_attn_layers=2, attn_probs_dropout_rate=0.0,
        attn_scale=False, dnn_size=16, num_dnn_layers=0, dnn_act="relu",
        dnn_drop=0.0, intermediate_size=32, norm_first=False,
        output_reduction="fc", proj_size=8, pt_neg_num=5,
        pt_type="MFP", RFD_replace="Unigram", nce_loss_type="nce",
    )
    cfg.update(overrides)
    return Config(**cfg)
