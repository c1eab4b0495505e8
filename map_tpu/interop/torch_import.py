"""Checkpoint interop with the reference PyTorch implementation.

The reference saves `torch.save(model.state_dict())` as `{step}.model`
(`code/trainer.py:517-519`). This module converts those files to map_tpu
flax param pytrees (and back), so a reference user can bring their trained
or pretrained checkpoints along:

    python -m map_tpu.interop.torch_import \
        --torch_checkpoint outputs/avazu/RFD/pretrain/9.model \
        --out converted.model --model_name dcnv2 \
        --input_size 4428293 --num_fields 24 --embed_size 16 ...

Name mapping is rule-based per model (reference module names from
`code/models.py` / `code/layers.py` / `code/nce/index_linear.py`); layout
transforms cover the torch<->flax conventions:
  - torch `nn.Linear.weight` is (out, in); flax Dense kernel is (in, out);
  - torch `nn.Conv1d(k=1).weight` is (out, in, 1); our CIN kernel is (in, out);
  - the NCE bias table is `nn.Embedding(V, 1)` in torch, a (V,) param here.

Import semantics mirror the reference's shape-matched partial restore
(`code/models.py:97-107`): tensors whose mapped name AND shape match are
copied; everything else is reported and skipped (never an error), which is
exactly how reference finetune drops pretraining heads. Buffers
(`mfp_criterion.logprob_noise`, `mfp_criterion.alias.*`) are derived data
rebuilt from feat_count artifacts on our side and are always skipped.

Supported models: dcnv2, dnn, deepfm, xdeepfm, lr, fm (the pretrain-capable
benchmark family + the LR/FM submodules). The attention-family models
(autoint, trans, fignn, fgcnn) keep reference-compatible architecture but use
TPU-native parameter layouts; their mappings can be added per-deployment.
"""

from __future__ import annotations

import argparse
from typing import Any, Callable, Dict, List, Tuple

import numpy as np

Rule = Tuple[str, Tuple[str, ...], str]  # (torch_key, flax_path, transform)

_TRANSFORMS: Dict[str, Callable[[np.ndarray], np.ndarray]] = {
    "id": lambda x: x,
    "t": lambda x: x.T,                      # torch Linear -> flax Dense
    "squeeze": lambda x: x.reshape(-1),      # (V, 1) bias table -> (V,)
    "conv1x1": lambda x: x[..., 0].T,        # (out, in, 1) -> (in, out)
}

_INVERSE: Dict[str, Callable[[np.ndarray], np.ndarray]] = {
    "id": lambda x: x,
    "t": lambda x: x.T,
    "squeeze": lambda x: x.reshape(-1, 1),
    "conv1x1": lambda x: x.T[..., None],
}


def _linear(tk: str, fp: Tuple[str, ...]) -> List[Rule]:
    return [(f"{tk}.weight", fp + ("dense", "kernel"), "t"),
            (f"{tk}.bias", fp + ("dense", "bias"), "id")]


def _emb(tk: str, fp: str, embed_norm: bool) -> List[Rule]:
    rules: List[Rule] = [(f"{tk}.embedding.weight", (fp, "embedding"), "id")]
    if embed_norm:
        rules += [(f"{tk}.layer_norm.weight", (fp, "layer_norm", "scale"), "id"),
                  (f"{tk}.layer_norm.bias", (fp, "layer_norm", "bias"), "id")]
    return rules


def _mlp(tk: str, fp: str, num_layers: int) -> List[Rule]:
    # reference MLPBlock stacks [Linear, act, Dropout] in one nn.Sequential
    # named `dnn` (`code/layers.py:173-188`), so Linear j sits at index 3j
    rules: List[Rule] = []
    for i in range(num_layers):
        rules += _linear(f"{tk}.dnn.{3 * i}", (fp, f"layer_{i}"))
    return rules


def _lr(tk: str, fp: str = "lr_layer") -> List[Rule]:
    # standalone LR names its table embed_w (`code/models.py:133-135`)
    return [(f"{tk}embed_w.weight", (fp, "weight"), "id"),
            (f"{tk}bias", (fp, "bias"), "id")]


def _cross(tk: str, fp: str, num_layers: int) -> List[Rule]:
    rules: List[Rule] = []
    for i in range(num_layers):
        rules += [(f"{tk}.cross_layers.{i}.weight", (fp, f"kernel_{i}"), "t"),
                  (f"{tk}.cross_layers.{i}.bias", (fp, f"bias_{i}"), "id")]
    return rules


def _cin(tk: str, fp: str, units: List[int]) -> List[Rule]:
    # reference CIN names its 1x1 convs layer_1.. (`code/layers.py:700-706`)
    rules: List[Rule] = []
    for i in range(len(units)):
        rules += [(f"{tk}.cin_layer.layer_{i + 1}.weight",
                   (fp, f"kernel_{i}"), "conv1x1"),
                  (f"{tk}.cin_layer.layer_{i + 1}.bias",
                   (fp, f"bias_{i}"), "id")]
    return rules


def _heads(config) -> List[Rule]:
    """Pretraining heads (`code/models.py:114-126`, `code/nce/index_linear.py`)."""
    rules: List[Rule] = []
    rules += _linear("feat_encoder", ("feat_encoder",))
    rules += [("mfp_criterion.emb.weight", ("mfp_decoder", "emb"), "id"),
              ("mfp_criterion.bias.weight", ("mfp_decoder", "bias"), "squeeze")]
    rules += _linear("pred_rfd.0", ("pred_rfd_hidden",))
    rules += _linear("pred_rfd.2", ("pred_rfd_out",))
    return rules


def model_rules(model_name: str, config) -> List[Rule]:
    """The torch-name -> flax-path mapping for one model + all head variants.

    Head rules are always included: import follows the reference's
    shape/name-matched partial-restore semantics, so inapplicable rules are
    simply never matched.
    """
    name = model_name.lower()
    n_mlp = int(getattr(config, "num_hidden_layers", 0))
    embed_norm = bool(getattr(config, "embed_norm", False))
    rules: List[Rule] = []
    if name == "dcnv2":
        rules += _emb("embed", "embed", embed_norm)
        rules += _cross("cross_net", "cross_net",
                        int(config.num_cross_layers))
        rules += _mlp("parallel_dnn", "parallel_dnn", n_mlp)
        rules += _linear("fc_out", ("fc_out",))
    elif name == "dnn":
        rules += _emb("embed", "embed", embed_norm)
        rules += _mlp("dnn", "dnn", n_mlp)
        rules += _linear("fc_out", ("fc_out",))
    elif name == "deepfm":
        rules += _emb("embed", "embed", embed_norm)
        rules += _lr("lr_layer.")
        rules += _mlp("dnn", "dnn", n_mlp)
        rules += _linear("dnn_fc_out", ("dnn_fc_out",))
    elif name == "xdeepfm":
        units = [int(u) for u in str(config.cin_layer_units).split(",")]
        rules += _emb("embed", "embed", embed_norm)
        rules += _cin("cin", "cin", units)
        rules += _mlp("dnn", "dnn", n_mlp)
        rules += _linear("fc", ("fc",))
        rules += _lr("lr_layer.")
    elif name == "lr":
        rules += _lr("")
    elif name == "fm":
        rules += _emb("embed", "embed", embed_norm)
        rules += _lr("lr_layer.")
    else:
        raise NotImplementedError(
            f"no torch mapping for model '{model_name}' — supported: "
            "dcnv2, dnn, deepfm, xdeepfm, lr, fm")
    rules += _heads(config)
    return rules


# ---------------------------------------------------------------------------
# conversion
# ---------------------------------------------------------------------------


def _get_path(tree: Dict, path: Tuple[str, ...]):
    node: Any = tree
    for k in path:
        if not isinstance(node, dict) or k not in node:
            return None
        node = node[k]
    return node


def _set_path(tree: Dict, path: Tuple[str, ...], value) -> None:
    node = tree
    for k in path[:-1]:
        node = node[k]
    node[path[-1]] = value


def convert_state_dict(state_dict: Dict[str, np.ndarray], model_name: str,
                       config, params: Dict) -> Tuple[Dict, int, List[str]]:
    """Copy torch tensors into a (host) flax param pytree.

    Returns (new_params, num_loaded, skipped_keys). Matching follows the
    reference partial-restore contract (`code/models.py:97-107`): a tensor
    loads iff its mapped path exists AND the transformed shape matches;
    everything else is skipped, never an error.
    """
    import jax

    rules = {tk: (fp, tr) for tk, fp, tr in model_rules(model_name, config)}
    new_params = jax.tree.map(np.asarray, params)
    loaded, skipped = 0, []
    for tk, tensor in state_dict.items():
        arr = np.asarray(tensor)
        if tk not in rules:
            skipped.append(tk)
            continue
        fp, tr = rules[tk]
        out = _TRANSFORMS[tr](arr)
        target = _get_path(new_params, fp)
        if target is None or tuple(target.shape) != tuple(out.shape):
            skipped.append(tk)
            continue
        _set_path(new_params, fp, out.astype(target.dtype))
        loaded += 1
    return new_params, loaded, skipped


def export_state_dict(params: Dict, model_name: str, config
                      ) -> Dict[str, np.ndarray]:
    """Inverse conversion: flax params -> reference-named torch state_dict
    (numpy arrays in torch layout; wrap with torch.tensor to torch.save)."""
    import jax

    host = jax.tree.map(np.asarray, params)
    out: Dict[str, np.ndarray] = {}
    for tk, fp, tr in model_rules(model_name, config):
        val = _get_path(host, fp)
        if val is not None:
            out[tk] = _INVERSE[tr](np.asarray(val))
    return out


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a reference `{step}.model` file into numpy arrays (CPU)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


def save_torch_checkpoint(state_dict: Dict[str, np.ndarray], path: str) -> None:
    import torch

    torch.save({k: torch.from_numpy(np.array(v, copy=True))
                for k, v in state_dict.items()}, path)


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------


def main(argv=None) -> int:
    from map_tpu import models
    from map_tpu.config import ModelArguments, _add_dataclass_args
    from map_tpu.train import checkpoints

    parser = argparse.ArgumentParser(
        description="Convert a reference PyTorch checkpoint to map_tpu format "
                    "(or back with --reverse)")
    parser.add_argument("--torch_checkpoint", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--input_size", type=int, required=True)
    parser.add_argument("--num_fields", type=int, required=True)
    parser.add_argument("--pretrain", action="store_true")
    parser.add_argument("--pt_type", default="MFP")
    parser.add_argument("--reverse", action="store_true",
                        help="map_tpu .model -> torch state_dict")
    _add_dataclass_args(parser, ModelArguments)
    ns = parser.parse_args(argv)

    import dataclasses

    import jax
    import jax.numpy as jnp

    from map_tpu.config import Config

    d = {f.name: getattr(ns, f.name)
         for f in dataclasses.fields(ModelArguments)}
    d.update(input_size=ns.input_size, num_fields=ns.num_fields,
             pretrain=ns.pretrain, pt_type=ns.pt_type, use_pallas=False,
             idx_low=None, idx_high=None, feat_num_per_field=None)
    config = Config.from_dict(d)
    if ns.pretrain and ns.pt_type == "MFP":
        config.feat_count = np.ones(ns.input_size, np.float32)
        config.logprob_noise = np.full(ns.input_size,
                                       -np.log(ns.input_size), np.float32)
        config.norm_term = float(np.log(ns.input_size))

    model = models.from_config(config)
    ids = jnp.zeros((2, ns.num_fields), jnp.int32)
    kwargs = {}
    if ns.pretrain and ns.pt_type == "MFP":
        kwargs = {"masked_index": jnp.zeros((2, 1), jnp.int32),
                  "candidates": jnp.zeros((2, 1, 2), jnp.int32)}
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, ids,
                           train=False, **kwargs)

    if ns.reverse:
        restored = checkpoints.load_model_file(ns.torch_checkpoint)
        sd = export_state_dict(restored["params"], ns.model_name, config)
        save_torch_checkpoint(sd, ns.out)
        print(f"exported {len(sd)} tensors -> {ns.out}")
        return 0

    sd = load_torch_checkpoint(ns.torch_checkpoint)
    new_params, loaded, skipped = convert_state_dict(
        sd, ns.model_name, config, variables["params"])
    vs = {"params": new_params}
    if "batch_stats" in variables:
        vs["batch_stats"] = variables["batch_stats"]
    checkpoints.save_model_file(vs, ns.out)
    print(f"loaded {loaded} tensors, skipped {len(skipped)}: {skipped}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
