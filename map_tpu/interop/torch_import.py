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

Supported models: the full registry — dcnv2, dnn, deepfm, xdeepfm, lr, fm,
autoint, trans, fignn, fgcnn — including composite mappings (torch's packed
self-attn in_proj split into q/k/v; GRUCell bias folding; FGCNN recombine
weights column-permuted for the NHWC flatten order) and FGCNN BatchNorm
running stats into the batch_stats collection. One deliberate deviation:
our MultiHeadSelfAttention splits heads on the CHANNEL axis; the reference's
`view(b*heads, ...)` (`code/layers.py:887-889`) slices the field axis — with
num_heads=1 the two coincide, and imported AutoInt weights are exact either
way (the quirk is a reshape, not a parameter layout).
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
    # torch Conv2d (out, in, kh, kw) -> flax NHWC kernel (kh, kw, in, out)
    "conv2d": lambda x: x.transpose(2, 3, 1, 0),
}

_INVERSE: Dict[str, Callable[[np.ndarray], np.ndarray]] = {
    "id": lambda x: x,
    "t": lambda x: x.T,
    "squeeze": lambda x: x.reshape(-1, 1),
    "conv1x1": lambda x: x.T[..., None],
    "conv2d": lambda x: x.transpose(3, 2, 0, 1),
}

# composite rule: several torch tensors -> several flax leaves (and back).
# emit(sd) returns [(flax_path, array)]; inverse(params_get) returns
# {torch_key: array} (lossless where possible; the GRU bias merge folds
# torch's redundant b_hr/b_hz into the flax input-side bias, so export sets
# b_h{r,z}=0 — forward-equivalent by construction)
Composite = Tuple[Tuple[str, ...],
                  Callable[[Dict[str, np.ndarray]], List[Tuple[Tuple[str, ...], np.ndarray]]],
                  Callable[[Callable[[Tuple[str, ...]], Any]], Dict[str, np.ndarray]]]


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


def _mhsa(tk: str, fp: str) -> List[Rule]:
    """AutoInt MultiHeadSelfAttention (`code/layers.py:848-914`): W_q/W_k/W_v
    (+ optional W_res when input_dim != output_dim), all bias-free."""
    rules: List[Rule] = []
    for w in ("W_q", "W_k", "W_v", "W_res"):
        rules.append((f"{tk}.{w}.weight", (fp, w, "dense", "kernel"), "t"))
    return rules


def _encoder_layer_rules(tk: str, fp: str) -> List[Rule]:
    """torch nn.TransformerEncoderLayer minus the packed in_proj (composite)."""
    rules: List[Rule] = []
    rules += _linear(f"{tk}.self_attn.out_proj", (fp, "out_proj"))
    rules += _linear(f"{tk}.linear1", (fp, "linear1"))
    rules += _linear(f"{tk}.linear2", (fp, "linear2"))
    for j in (1, 2):
        rules += [(f"{tk}.norm{j}.weight", (fp, f"norm{j}", "scale"), "id"),
                  (f"{tk}.norm{j}.bias", (fp, f"norm{j}", "bias"), "id")]
    return rules


def _in_proj_composite(tk: str, fp: str) -> Composite:
    """Split torch's packed (3D, D) self-attn in_proj into q/k/v Dense params."""
    wk, bk = f"{tk}.self_attn.in_proj_weight", f"{tk}.self_attn.in_proj_bias"

    def emit(sd):
        w = np.asarray(sd[wk])
        b = np.asarray(sd[bk])
        d = w.shape[0] // 3
        out = []
        for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
            out.append((fp + (name, "dense", "kernel"),
                        w[i * d:(i + 1) * d].T))
            out.append((fp + (name, "dense", "bias"), b[i * d:(i + 1) * d]))
        return out

    def inverse(get):
        ws, bs = [], []
        for name in ("q_proj", "k_proj", "v_proj"):
            ws.append(np.asarray(get(fp + (name, "dense", "kernel"))).T)
            bs.append(np.asarray(get(fp + (name, "dense", "bias"))))
        return {wk: np.concatenate(ws, axis=0), bk: np.concatenate(bs)}

    return (wk, bk), emit, inverse


def _gru_composite(tk: str, fp: str) -> Composite:
    """torch GRUCell (packed 3E weights, two bias sets) <-> flax GRUCell
    (per-gate ir/iz/in + hr/hz/hn). torch gate order is r|z|n; for r and z the
    two torch biases are mathematically redundant and fold into the flax
    input-side bias; the n-gate biases map 1:1 (b_in -> in, b_hn -> hn)."""
    keys = (f"{tk}.weight_ih", f"{tk}.weight_hh", f"{tk}.bias_ih",
            f"{tk}.bias_hh")

    def emit(sd):
        w_ih, w_hh = np.asarray(sd[keys[0]]), np.asarray(sd[keys[1]])
        b_ih, b_hh = np.asarray(sd[keys[2]]), np.asarray(sd[keys[3]])
        e = w_ih.shape[1]
        gates = ("r", "z", "n")
        out = []
        for i, g in enumerate(gates):
            out.append((fp + (f"i{g}", "kernel"), w_ih[i * e:(i + 1) * e].T))
            out.append((fp + (f"h{g}", "kernel"), w_hh[i * e:(i + 1) * e].T))
        # flax biases: ir/iz/in on the input side, hn on the hidden side
        out.append((fp + ("ir", "bias"), b_ih[0:e] + b_hh[0:e]))
        out.append((fp + ("iz", "bias"), b_ih[e:2 * e] + b_hh[e:2 * e]))
        out.append((fp + ("in", "bias"), b_ih[2 * e:3 * e]))
        out.append((fp + ("hn", "bias"), b_hh[2 * e:3 * e]))
        return out

    def inverse(get):
        ws_i, ws_h = [], []
        for g in ("r", "z", "n"):
            ws_i.append(np.asarray(get(fp + (f"i{g}", "kernel"))).T)
            ws_h.append(np.asarray(get(fp + (f"h{g}", "kernel"))).T)
        b_ir = np.asarray(get(fp + ("ir", "bias")))
        b_iz = np.asarray(get(fp + ("iz", "bias")))
        b_in = np.asarray(get(fp + ("in", "bias")))
        b_hn = np.asarray(get(fp + ("hn", "bias")))
        zero = np.zeros_like(b_ir)
        return {keys[0]: np.concatenate(ws_i, axis=0),
                keys[1]: np.concatenate(ws_h, axis=0),
                keys[2]: np.concatenate([b_ir, b_iz, b_in]),
                keys[3]: np.concatenate([zero, zero, b_hn])}

    return keys, emit, inverse


def _fignn_rules(config) -> List[Rule]:
    n = int(config.num_hidden_layers)
    reuse = bool(getattr(config, "reuse_graph_layer", False))
    rules: List[Rule] = [("fignn.W_attn.weight",
                          ("fignn", "W_attn", "dense", "kernel"), "t")]
    gnn_paths = ([("fignn.gnn", ("fignn", "gnn"))] if reuse else
                 [(f"fignn.gnn.{i}", ("fignn", f"gnn_{i}")) for i in range(n)])
    for tk, fp in gnn_paths:
        for w in ("W_in", "W_out", "bias_p"):
            rules.append((f"{tk}.{w}", fp + (w,), "id"))
    rules += [("fc.linear1.weight", ("fc", "linear1", "dense", "kernel"), "t"),
              ("fc.linear2.0.weight",
               ("fc", "linear2", "dense", "kernel"), "t")]
    return rules


def _fgcnn_rules(config) -> Tuple[List[Rule], List[Rule]]:
    """Returns (param rules, batch_stats rules)."""
    channels = str(config.channels).split(",")
    rules: List[Rule] = []
    stats: List[Rule] = []
    for i in range(len(channels)):
        tk = f"fgcnn_layer.conv_layers.{i}"
        rules += [(f"{tk}.0.weight", ("fgcnn_layer", f"conv_{i}", "kernel"),
                   "conv2d"),
                  (f"{tk}.0.bias", ("fgcnn_layer", f"conv_{i}", "bias"), "id"),
                  (f"{tk}.1.weight", ("fgcnn_layer", f"bn_{i}", "scale"), "id"),
                  (f"{tk}.1.bias", ("fgcnn_layer", f"bn_{i}", "bias"), "id")]
        stats += [(f"{tk}.1.running_mean",
                   ("fgcnn_layer", f"bn_{i}", "mean"), "id"),
                  (f"{tk}.1.running_var",
                   ("fgcnn_layer", f"bn_{i}", "var"), "id")]
        # the recombine Linear consumes the conv activation FLATTENED: torch
        # flattens NCHW -> (c, h, e) order, our NHWC block flattens ->
        # (h, e, c), so the weight's input columns must be permuted
        h_pool = -(-_fgcnn_height(config, i) // int(
            str(config.pooling_sizes).split(",")[i]))
        perm = _recombine_perm(int(channels[i]), h_pool,
                               int(config.embed_size))
        rules += [(f"fgcnn_layer.recombine_layers.{i}.0.weight",
                   ("fgcnn_layer", f"recombine_{i}", "dense", "kernel"), perm),
                  (f"fgcnn_layer.recombine_layers.{i}.0.bias",
                   ("fgcnn_layer", f"recombine_{i}", "dense", "bias"), "id")]
    return rules, stats


def _fgcnn_height(config, stage: int) -> int:
    """Field-axis height entering pooling at `stage` (ceil-div chain)."""
    h = int(config.num_fields)
    sizes = [int(p) for p in str(config.pooling_sizes).split(",")]
    for p in sizes[:stage]:
        h = -(-h // p)
    return h


def _recombine_perm(c: int, h: int, e: int):
    """(fwd, inv) transform pair permuting the recombine weight's input
    columns between torch's (c, h, e) and our (h, e, c) flatten order."""

    def fwd(w: np.ndarray) -> np.ndarray:  # (out, c*h*e) -> (h*e*c, out)
        o = w.shape[0]
        return w.reshape(o, c, h, e).transpose(2, 3, 1, 0).reshape(
            h * e * c, o)

    def inv(wf: np.ndarray) -> np.ndarray:  # (h*e*c, out) -> (out, c*h*e)
        o = wf.shape[1]
        return wf.reshape(h, e, c, o).transpose(3, 2, 0, 1).reshape(
            o, c * h * e)

    return fwd, inv


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
    elif name == "autoint":
        rules += _emb("embed", "embed", embed_norm)
        for i in range(int(config.num_attn_layers)):
            rules += _mhsa(f"self_attention.{i}", f"attn_{i}")
        rules += _linear("attn_out", ("attn_out",))
        rules += _lr("lr_layer.")
        rules += _mlp("dnn", "dnn", int(getattr(config, "num_dnn_layers", 0)))
        rules += _linear("dnn_out", ("dnn_out",))
    elif name == "trans":
        rules += _emb("embed", "embed", embed_norm)
        for i in range(n_mlp):
            rules += _encoder_layer_rules(f"encoder.layers.{i}", f"layer_{i}")
        rules += _linear("trans_out", ("trans_out",))
        rules += _linear("field_reduction_attn.0", ("attn_hidden",))
        rules += _linear("field_reduction_attn.2", ("attn_score",))
        rules += _lr("lr_layer.")
        rules += _mlp("mlp", "mlp", int(getattr(config, "num_dnn_layers", 0)))
        rules += _linear("mlp_out", ("mlp_out",))
    elif name == "fignn":
        rules += _emb("embed", "embed", embed_norm)
        rules += _fignn_rules(config)
    elif name == "fgcnn":
        rules += _emb("embed", "embed", embed_norm)
        if not bool(getattr(config, "share_embedding", False)):
            rules += _emb("fg_embed", "fg_embed", embed_norm)
        rules += _fgcnn_rules(config)[0]
        rules += _mlp("dnn", "dnn", n_mlp)
        rules += _linear("fc_out", ("fc_out",))
    else:
        raise NotImplementedError(
            f"no torch mapping for model '{model_name}' — supported: dcnv2, "
            "dnn, deepfm, xdeepfm, lr, fm, autoint, trans, fignn, fgcnn")
    rules += _heads(config)
    return rules


def model_composites(model_name: str, config) -> List[Composite]:
    """Many-to-many mappings (packed in_proj split, GRU bias fold)."""
    name = model_name.lower()
    if name == "trans":
        return [_in_proj_composite(f"encoder.layers.{i}", (f"layer_{i}",))
                for i in range(int(config.num_hidden_layers))]
    if name == "fignn":
        return [_gru_composite("fignn.gru", ("fignn", "gru"))]
    return []


def model_stats_rules(model_name: str, config) -> List[Rule]:
    """Rules targeting the batch_stats collection (BatchNorm running stats)."""
    if model_name.lower() == "fgcnn":
        return _fgcnn_rules(config)[1]
    return []


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
    consumed = set()
    for keys, emit, _ in model_composites(model_name, config):
        if not all(k in state_dict for k in keys):
            continue
        for fp, out in emit({k: np.asarray(state_dict[k]) for k in keys}):
            target = _get_path(new_params, fp)
            if target is None or tuple(target.shape) != tuple(out.shape):
                continue
            _set_path(new_params, fp, out.astype(target.dtype))
            loaded += 1
        consumed.update(keys)
    for tk, tensor in state_dict.items():
        if tk in consumed:
            continue
        arr = np.asarray(tensor)
        if tk not in rules:
            skipped.append(tk)
            continue
        fp, tr = rules[tk]
        out = (_TRANSFORMS[tr] if isinstance(tr, str) else tr[0])(arr)
        target = _get_path(new_params, fp)
        if target is None or tuple(target.shape) != tuple(out.shape):
            skipped.append(tk)
            continue
        _set_path(new_params, fp, out.astype(target.dtype))
        loaded += 1
    return new_params, loaded, skipped


def apply_stats_rules(state_dict: Dict[str, np.ndarray], model_name: str,
                      config, batch_stats: Dict,
                      skipped: List[str]) -> Tuple[Dict, int]:
    """Copy BatchNorm running stats into the batch_stats collection; removes
    consumed keys from `skipped` in place."""
    import jax

    new_bs = jax.tree.map(np.asarray, batch_stats)
    loaded = 0
    for tk, fp, tr in model_stats_rules(model_name, config):
        if tk not in state_dict:
            continue
        out = _TRANSFORMS[tr](np.asarray(state_dict[tk]))
        target = _get_path(new_bs, fp)
        if target is None or tuple(target.shape) != tuple(out.shape):
            continue
        _set_path(new_bs, fp, out.astype(target.dtype))
        loaded += 1
        if tk in skipped:
            skipped.remove(tk)
    return new_bs, loaded


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
            inv = _INVERSE[tr] if isinstance(tr, str) else tr[1]
            out[tk] = inv(np.asarray(val))
    for _, __, inverse in model_composites(model_name, config):
        try:
            out.update(inverse(lambda p: _require_path(host, p)))
        except KeyError:
            pass  # submodule absent in this configuration
    return out


def _require_path(tree: Dict, path: Tuple[str, ...]):
    val = _get_path(tree, path)
    if val is None:
        raise KeyError(path)
    return val


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
        vs["batch_stats"], n_bs = apply_stats_rules(
            sd, ns.model_name, config, variables["batch_stats"], skipped)
        loaded += n_bs
    checkpoints.save_model_file(vs, ns.out)
    print(f"loaded {loaded} tensors, skipped {len(skipped)}: {skipped}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
