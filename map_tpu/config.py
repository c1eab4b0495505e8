"""Configuration system: run-level and model-level flags plus the merged Config bag.

Mirrors the flag surface of the reference (`code/arguments.py:15-161`) and the
free-form Config bag with JSON round-trip (`code/arguments.py:164-203`), without
any torch coupling. Device/distributed setup is JAX-native (see
`map_tpu.parallel.mesh`) instead of the reference's NCCL scaffolding
(`code/arguments.py:58-86`).
"""

from __future__ import annotations

import argparse
import copy
import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Sequence


@dataclass
class TrainingArguments:
    """Run-level flags. Parity: reference `code/arguments.py:15-48`."""

    output_dir: str = ""
    dataset_name: str = "avazu"
    data_dir: str = "data/avazu"
    per_device_train_batch_size: int = 128   # reference: per_gpu_train_batch_size
    per_device_eval_batch_size: int = 10000  # reference: per_gpu_eval_batch_size
    learning_rate: float = 1e-4
    weight_decay: float = 0.1
    adam_epsilon: float = 1e-8
    adam_betas: str = "0.9,0.999"
    max_grad_norm: float = 0.0  # 0 disables clipping (reference trainer.py:137)
    patience: int = 2
    num_train_epochs: int = 20
    lr_sched: str = "cosine"   # cosine | const
    warmup_ratio: float = 0.0
    logging_first_step: bool = False
    logging_steps: int = 1000
    save_steps: int = 1000
    save_total_limit: Optional[int] = 20
    # Background checkpoint writes (train/async_writer.py): the msgpack
    # serialization + disk write run on a worker thread while training
    # continues; the device->host fetch stays on the main thread (measured:
    # +0.16 s/save win on the tunneled chip, bench_async_ckpt.py). Files are
    # byte-identical and every checkpoint read joins the writer first.
    async_checkpoint: bool = True
    # Move the D2H fetch itself onto the worker thread too, over a
    # donation-safe on-device snapshot. MEASURED LOSS through the axon
    # tunnel (-1.26 s/save: the worker's fetch RPCs contend with step
    # dispatch on the serialized link) — opt-in for deployments with
    # locally-attached TPUs where D2H rides an independent DMA path.
    # Single-process only (multi-host gathers must stay with the step
    # collectives on the main thread).
    async_checkpoint_fetch: bool = False
    seed: int = 42

    # Pretraining flags (reference arguments.py:41-48)
    sampling_method: str = "normal"   # normal (per-row permutation) | randint
    mask_ratio: float = 0.1
    pretrain: bool = False
    pt_type: str = "MFP"              # MFP | RFD
    RFD_replace: str = "Unigram"      # Unigram | Uniform | Whole-Uniform | Whole-Unigram
    finetune: bool = False
    pretrained_model_path: Optional[str] = None
    # North-star upgrade: MFP noise drawn from the masked field's own id block
    # (field-conditional unigram) instead of the reference's global unigram
    # (SURVEY.md §2.4 NOTE). Default off = reference parity.
    pt_per_field_noise: bool = False
    # Reference per_word=False variant (index_linear.py:108-143): ONE noise set
    # shared across the batch. The noise side becomes a dense matmul and the
    # decoder backward scatter shrinks ~(1+k)x — the fast setting on TPU.
    pt_shared_noise: bool = False

    # Resume / observability (no working reference counterpart: the reference
    # never checkpoints optimizer state and its save_steps flag is dead,
    # SURVEY.md §5.3-5.4)
    resume: bool = False          # restore {output_dir}/resume.state if present
    profile_steps: int = 0        # >0: capture a jax.profiler trace of N steps

    # TPU-native additions (no reference counterpart)
    num_data_shards: int = -1    # data-parallel mesh size; -1 = all devices
    num_model_shards: int = 1    # embedding-table row-shard count ('model' axis)
    steps_per_call: int = 8      # train steps fused per device dispatch (lax.scan)
    prefetch_batches: int = 2    # async host->device batch prefetch depth
    use_pallas: bool = True      # enable Pallas kernels on the hot paths
    # Production default bf16 (round-4 flip): chip-certified metric-
    # indistinguishable from f32 on all five canonical stages
    # (validation/README.md bf16 table, deltas <= 2.4e-4) and a measured
    # step win. Params and the loss reduction stay float32.
    compute_dtype: str = "bfloat16"  # float32 | bfloat16 for activations
    # Lane-packed table storage (V, E) -> (V/p, p*E), p = 128 // E: removes
    # the (8,128)-tile lane padding XLA pays on narrow tables, cutting the
    # dense AdamW table-update HBM traffic by p (map_tpu.ops.packed_table).
    # Bit-identical math per element; changes checkpointed param shapes.
    packed_tables: bool = True
    # Route vocab-table AdamW through the fused one-pass Pallas kernel
    # (map_tpu.ops.fused_adamw); auto-disabled when max_grad_norm > 0 (the
    # global-norm clip needs one optax chain over every grad).
    fused_table_update: bool = True
    # Sparse-stream fused AdamW for the NCE decoder table
    # (map_tpu.ops.sparse_adamw): the dedup backward's compact gradient
    # stream is folded directly into the table-update pass — the dense
    # decoder gradient (zero-init + per-row-priced scatter + full-table
    # read) never materializes. Engages only when the dedup capacity covers
    # the whole candidate stream, the encoding fits (2C <= R), tables are
    # unsharded, and no global-norm clip is active; falls back to the dense
    # path otherwise. Gradient delivery is bit-exact (3-way bf16 split
    # one-hot matmul scatter, tests/test_sparse_adamw.py).
    sparse_table_update: bool = False
    # Field-blocked hybrid embedding access (map_tpu.ops.hybrid_gather):
    # small-vocab fields gather from their statically-sliced resident block,
    # big ID fields keep the flat gather. Requires every small-field id to
    # stay in its block (the dataset invariant); build_config turns it off
    # for RFD whole-vocab replacement generators.
    field_blocked_lookup: bool = True
    # Hybrid backward-mode override (ops/hybrid_gather.py: fwd | matmul |
    # both | bwd | bwd_pallas); "" = MAP_TPU_HYBRID_MODE env or the measured
    # default. Threaded through Embeddings as a static arg so jit caches key
    # on it (round-2 advisor: module-global knobs are invisible to jit).
    hybrid_mode: str = ""
    table_sharding: str = "auto"  # auto | replicated | rows
    # Exchange strategy for rows-sharded tables: 'psum' (masked full gather
    # + psum on every shard — correctness baseline, per-chip gather work
    # constant in shard count) or 'hotcold' (per-field hot prefixes served
    # from a per-step replicated cache + capacity-bounded sorted-segment
    # exchange for the cold tail — per-chip work ~N/S; exact always via the
    # overflow fallback; parallel.embedding.hotcold_embedding_lookup).
    table_exchange: str = "psum"
    hot_rows_per_field: int = 512  # hotcold: replicated prefix per field
    mock_devices: int = 0        # >0: force CPU with N virtual devices (testing)
    # Streaming eval: the device reduces each eval batch to two score
    # histograms + scalar sums, so AUC/LogLoss need no per-example host
    # transfer (billion-row evals). AUC becomes a bucketed estimator with
    # error O(1/auc_bins); default off = exact sklearn-parity host AUC.
    streaming_auc: bool = False
    auc_bins: int = 32768
    # Device-resident train data: upload the (N, F) id matrix to HBM once
    # and ship only shuffled indices per step; rows gather on device inside
    # the jitted step. auto = on for single-process runs fitting the budget
    # (off multi-host: every process would replicate the matrix); on|off
    # force it. Decisive on low-bandwidth/high-latency host links.
    device_resident_data: str = "auto"
    device_data_budget_gb: float = 8.0
    # Host-side dataset budget: when 2x the h5 matrix bytes exceed it, the
    # dataset auto-switches to per-split memmap files (one-time chunked
    # conversion; every process then maps the SAME bytes through the OS page
    # cache instead of holding its own copy — the >RAM loading mode,
    # data/dataset.py). 0 = auto (60% of physical RAM), -1 = always in-RAM
    # (reference parity, code/dataset.py:27-29), >0 = explicit MB budget.
    host_data_budget_mb: int = 0
    # Multi-host (process_count > 1) evals default to streaming AUC so no
    # host ever materializes the global per-example arrays; this flag forces
    # the exact allgather path back on (small eval splits only).
    exact_eval_allgather: bool = False

    @property
    def train_batch_size(self) -> int:
        # Global batch = per-device batch x data-parallel size, mirroring
        # reference arguments.py:50-52 (per_gpu_batch * n_gpu).
        from map_tpu.parallel.mesh import data_parallel_size

        return self.per_device_train_batch_size * max(1, data_parallel_size(self))

    @property
    def eval_batch_size(self) -> int:
        from map_tpu.parallel.mesh import data_parallel_size

        return self.per_device_eval_batch_size * max(1, data_parallel_size(self))

    def to_json_string(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)


@dataclass
class ModelArguments:
    """Per-architecture hyperparameters. Parity: reference `code/arguments.py:103-161`."""

    model_name: str = "dcnv2"

    embed_size: int = 32
    embed_dropout_rate: float = 0.0
    hidden_size: int = 128
    num_hidden_layers: int = 1
    hidden_act: str = "relu"
    hidden_dropout_rate: float = 0.0

    num_attn_heads: int = 1
    attn_probs_dropout_rate: float = 0.1
    intermediate_size: int = 128
    norm_first: bool = False
    layer_norm_eps: float = 1e-12

    agg_type: str = "mean"
    res_conn: bool = False
    num_channels: int = 1
    embed_norm: bool = False
    prod_layer_norm: bool = False
    prod_dropout_rate: float = 0.1
    inter_layer_norm: bool = False
    output_reduction: str = "sum,max,sum"

    num_cross_layers: int = 1
    share_embedding: bool = False
    channels: str = "14,16,18,20"
    kernel_heights: str = "7,7,7,7"
    pooling_sizes: str = "2,2,2,2"
    recombined_channels: str = "3,3,3,3"
    conv_act: str = "tanh"
    reduction_ratio: int = 3
    bilinear_type: str = "field_interaction"
    reuse_graph_layer: bool = False
    attn_scale: bool = False
    use_lr: bool = False
    attn_size: int = 40
    num_attn_layers: int = 2
    cin_layer_units: str = "50,50"
    field_interaction_type: str = "matrixed"
    product_type: str = "inner"
    outer_product_kernel_type: str = "mat"

    # Pretraining-head hyperparameters (reference arguments.py:150-151)
    pt_neg_num: int = 25
    proj_size: int = 32
    # MFP loss mode: nce (reference default, nce_loss.py:77) | sampled | full
    nce_loss_type: str = "nce"
    # decoder candidate-gather gradient: 'dedup' folds duplicate ids before
    # the table scatter (map_tpu.ops.dedup_scatter — ~3x faster per-position
    # MFP on v5e with realistic Zipf unigrams); 'dedup_bwd' additionally
    # scores small TARGET streams with a plain forward + backward-only fold
    # (two sorts instead of four; -0.2 ms on the pf-shared step, round-5
    # A/B) while candidate sets keep the unique-once dedup forward;
    # 'xla' = plain scatter
    nce_grad: str = "dedup_bwd"

    # Auxiliary DNN tower (reference arguments.py:154-157)
    dnn_size: int = 1000
    num_dnn_layers: int = 0
    dnn_act: str = "relu"
    dnn_drop: float = 0.0

    def to_dict(self) -> Dict[str, Any]:
        return copy.deepcopy(self.__dict__)


class Config:
    """Free-form attribute bag with JSON persistence.

    Parity: reference `code/arguments.py:164-203`. Non-JSON values (numpy
    arrays such as `feat_count`) are dropped on serialization.
    """

    def __init__(self, **kwargs: Any):
        for k, v in kwargs.items():
            setattr(self, k, v)

    @classmethod
    def from_dict(cls, config_dict: Dict[str, Any]) -> "Config":
        return cls(**config_dict)

    @classmethod
    def load(cls, load_directory: str) -> "Config":
        with open(os.path.join(load_directory, "config.json"), "r", encoding="utf-8") as f:
            return cls.from_dict(json.load(f))

    def save(self, save_directory: str) -> None:
        assert os.path.isdir(save_directory), f"not a directory: {save_directory}"
        with open(os.path.join(save_directory, "config.json"), "w", encoding="utf-8") as f:
            f.write(self.to_json_string())

    def to_dict(self) -> Dict[str, Any]:
        return dict(self.__dict__)

    def to_json_string(self) -> str:
        def _default(o: Any) -> Any:
            try:
                return o.tolist()
            except AttributeError:
                return str(o)

        serializable = {
            k: v for k, v in self.to_dict().items()
            if not k.startswith("_") and k not in ("feat_count", "logprob_noise")
        }
        return json.dumps(serializable, indent=2, sort_keys=True, default=_default) + "\n"

    def get(self, key: str, default: Any = None) -> Any:
        return getattr(self, key, default)


def _add_dataclass_args(parser: argparse.ArgumentParser, cls: type) -> None:
    for f in dataclasses.fields(cls):
        name = f"--{f.name}"
        ftype = f.type if isinstance(f.type, type) else None
        default = f.default if f.default is not dataclasses.MISSING else None
        if ftype is None:
            # typing annotations arrive as strings under `from __future__ import annotations`
            tname = str(f.type)
            if "bool" in tname:
                ftype = bool
            elif "int" in tname:
                ftype = int
            elif "float" in tname:
                ftype = float
            else:
                ftype = str
        if ftype is bool:
            parser.add_argument(name, action="store_true", default=default)
        elif f.default is dataclasses.MISSING:
            parser.add_argument(name, type=ftype, required=True)
        else:
            parser.add_argument(name, type=ftype, default=default)


def parse_args(argv: Optional[Sequence[str]] = None):
    """Parse CLI argv into (ModelArguments, TrainingArguments).

    Stands in for the reference's HfArgumentParser dispatch (`code/run.py:14-15`).
    """
    parser = argparse.ArgumentParser(description="map_tpu trainer")
    _add_dataclass_args(parser, ModelArguments)
    _add_dataclass_args(parser, TrainingArguments)
    ns = vars(parser.parse_args(argv))
    model_kwargs = {f.name: ns[f.name] for f in dataclasses.fields(ModelArguments)}
    train_kwargs = {f.name: ns[f.name] for f in dataclasses.fields(TrainingArguments)}
    return ModelArguments(**model_kwargs), TrainingArguments(**train_kwargs)


def build_config(model_args: ModelArguments, training_args: TrainingArguments,
                 dataset) -> Config:
    """Assemble the merged model config from flags + data-derived values.

    Parity: reference `code/run.py:49-61` — injects input_size, num_fields
    (minus the reserved `<rsv>` field), feat_count, per-field id ranges.
    """
    d = model_args.to_dict()
    d["data_dir"] = training_args.data_dir
    d["input_size"] = len(dataset.feat_map)
    d["num_fields"] = len(dataset.field_map) - 1  # reserved <rsv> field (run.py:52)
    d["pretrain"] = training_args.pretrain
    d["pt_type"] = training_args.pt_type
    d["RFD_replace"] = training_args.RFD_replace
    d["feat_count"] = dataset.feat_count
    # plain lists so config.json round-trips them (serving/resume keep the
    # field-blocked hybrid lookup; numpy arrays are dropped on save)
    d["idx_low"] = (None if dataset.idx_low is None
                    else [int(x) for x in dataset.idx_low])
    d["idx_high"] = (None if dataset.idx_high is None
                     else [int(x) for x in dataset.idx_high])
    d["feat_num_per_field"] = dataset.feat_num_per_field
    d["use_pallas"] = training_args.use_pallas
    d["compute_dtype"] = training_args.compute_dtype
    d["packed_tables"] = training_args.packed_tables
    # RFD whole-vocab replacement writes out-of-block ids into every field —
    # the field-blocked hybrid lookup's contract does not hold there
    d["field_blocked_lookup"] = (
        training_args.field_blocked_lookup
        and getattr(dataset, "field_blocked_ok", True)
        and not (training_args.pretrain and training_args.pt_type == "RFD"
                 and training_args.RFD_replace.startswith("Whole")))
    hm = getattr(training_args, "hybrid_mode", "")
    if (not hm and training_args.pretrain and training_args.pt_type == "MFP"
            and d["field_blocked_lookup"]):
        # Round-5 profile finding: in the MFP step the 98k-row corrupted-id
        # flat scatter is pure per-row pricing (1.36 ms; fwd_split proved
        # dup serialization is NOT the cost), and the matmul backward
        # (per-field one-hot MXU for small fields, scatter only the big
        # fields) measured 9.20 -> 8.80 ms/step. The supervised step keeps
        # 'fwd' (matmul measured 0.08 ms SLOWER there, round 3).
        hm = "matmul"
    d["hybrid_mode"] = hm
    return Config.from_dict(d)
