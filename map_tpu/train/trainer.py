"""Trainer: supervised train/eval/test loops and MFP/RFD pretrain loops.

Loop-contract parity with the reference `code/trainer.py`:
- supervised: epoch loop, windowed train AUC every logging_steps
  (trainer.py:146-154), per-epoch eval with best-AUC checkpointing and
  patience-based early stop (trainer.py:206-215), final metric table, test on
  the restored best checkpoint (trainer.py:529-535);
- MFP/RFD pretrain: windowed loss/acc logs, per-epoch masked eval, one
  checkpoint at the end of all epochs (trainer.py:349-350, 473-474);
- checkpoints are `{global_step}.model` files.

The per-batch work (corruption, NCE sampling, forward/backward, AdamW,
schedule) is entirely inside the jitted steps (map_tpu.train.train_step); the
host only streams fixed-shape batches and accumulates metrics. Metric fetches
are deferred to window boundaries so device dispatch stays async.
"""

from __future__ import annotations

import json
import logging
import math
import os
import time
from typing import Dict, Optional

import jax
import numpy as np
import pandas as pd

from map_tpu.data.loader import Batcher
from map_tpu.objectives import corruption
from map_tpu.objectives.alias import load_or_build_alias, noise_distribution
from map_tpu.train import checkpoints, train_step as ts
from map_tpu.train.optimizer import build_optimizer
from map_tpu.utils.metrics import auc_from_histograms, binary_log_loss, roc_auc

logger = logging.getLogger(__name__)


class Trainer:
    def __init__(self, model, model_config, training_args, dataset):
        self.model = model
        self.config = model_config
        self.args = training_args
        self.dataset = dataset

        self.global_step = 0
        self.eval_metrics = []
        self.best_eval_auc = 0.0
        self.best_eval_step = -1
        self._patience = 0
        self._stop_training = False

        self.state: Optional[ts.TrainState] = None
        self._train_step = None
        self._eval_step = None
        self._multi_eval = None
        self._eval_has_rng = False
        self._profiler_active = False
        # Background checkpoint writer (async_writer.py): serialization +
        # disk write run on a worker thread (measured +0.16 s/save,
        # bench_async_ckpt.py). The D2H fetch joins them only under
        # async_checkpoint_fetch (single-process; measured LOSS through the
        # tunnel, a win only with locally-attached devices — config.py).
        from map_tpu.train.async_writer import AsyncCheckpointWriter

        self._ckpt_writer = AsyncCheckpointWriter()
        self._async_ckpt = bool(getattr(training_args, "async_checkpoint", True))
        self._async_fetch = (
            self._async_ckpt
            and bool(getattr(training_args, "async_checkpoint_fetch", False))
            and jax.process_count() == 1)
        streaming = bool(getattr(training_args, "streaming_auc", False))
        if (not streaming and jax.process_count() > 1
                and not getattr(training_args, "exact_eval_allgather", False)):
            # Multi-host default: the non-streaming eval allgathers every
            # per-example logits/probs/labels array to every host — O(global
            # eval split) host memory x hosts, unaffordable at Criteo's 4.6M
            # test rows. Streaming histograms reduce each batch to O(bins) on
            # device and the certified error bound (utils/metrics.py) gates
            # selection safety. --exact_eval_allgather restores the old path.
            streaming = True
            logger.info("multi-host eval: streaming-histogram AUC enabled by "
                        "default (pass --exact_eval_allgather to override)")
        self._streaming_bins = (int(getattr(training_args, "auc_bins", 32768))
                                if streaming else 0)

        if getattr(self.config, "pretrain", False) and self.config.pt_type == "MFP":
            probs = noise_distribution(self.config.feat_count)
            self._per_field = None
            if getattr(self.args, "pt_per_field_noise", False):
                # north-star upgrade: field-conditional noise
                from map_tpu.objectives.alias import build_per_field_alias

                assert self.config.idx_low is not None, \
                    "per-field sampling needs per-field id ranges"
                pf_prob, pf_alias, logq, lnz = build_per_field_alias(
                    self.config.feat_count, self.config.idx_low,
                    self.config.idx_high)
                sizes = (np.asarray(self.config.idx_high) -
                         np.asarray(self.config.idx_low)).astype(np.int32)
                self._per_field = (pf_prob, pf_alias,
                                   np.asarray(self.config.idx_low, np.int32),
                                   sizes, lnz)
                self.config.logprob_noise = logq       # per-field log q
                self.config.norm_term = lnz            # per-id lnZ vector
                self._alias_prob = pf_prob             # unused in this mode
                self._alias_alias = pf_alias
            else:
                self.config.logprob_noise = np.log(probs).astype(np.float32)
                self.config.norm_term = float(np.log(len(probs)))  # lnZ auto (nce_loss.py:69-72)
                self._alias_prob, self._alias_alias = load_or_build_alias(
                    self.args.data_dir, probs)

    # ------------------------------------------------------------------
    # plumbing
    # ------------------------------------------------------------------

    def _noise_rows_per_example(self) -> int:
        if getattr(self.config, "pretrain", False) and self.config.pt_type == "RFD" \
                and self.args.RFD_replace in ("Unigram", "Whole-Unigram"):
            return corruption.mask_num_of(self.config.num_fields, self.args.mask_ratio)
        return 0

    def get_batcher(self, split: str, is_training: bool) -> Batcher:
        bs = self.args.per_device_train_batch_size if is_training \
            else self.args.per_device_eval_batch_size
        from map_tpu.parallel.mesh import data_parallel_size
        bs = bs * max(1, data_parallel_size(self.args))
        b = Batcher(
            self.dataset.X[split], self.dataset.Y[split],
            batch_size=bs, shuffle=is_training, seed=self.args.seed,
            noise_source=self.dataset.X["train"],
            noise_rows_per_example=self._noise_rows_per_example(),
            process_index=jax.process_index(),
            process_count=jax.process_count(),
        )
        b.row_shard = self._row_shard()
        return b

    def _row_shard(self):
        """Mesh-aware loader sharding: (start_block, n_blocks, D) of P('data')
        batch sharding for this process, or None for uniform process blocks.
        Needed once model-axis replicas span processes — each replica must
        hold IDENTICAL rows of its data block (process_data_blocks)."""
        if getattr(self, "mesh", None) is None or jax.process_count() == 1:
            return None
        from map_tpu.parallel.sharding import process_data_blocks

        blocks, d = process_data_blocks(self.mesh)
        return (blocks[0], len(blocks), d)

    def _build_steps(self, num_batches_per_epoch: int):
        t_total = int(num_batches_per_epoch * self.args.num_train_epochs)
        t_warmup = int(t_total * self.args.warmup_ratio)
        tx, self._schedule = build_optimizer(self.args, t_total, t_warmup)
        rng = jax.random.PRNGKey(self.args.seed)
        init_rng, step_rng, self._eval_rng_base = jax.random.split(rng, 3)
        # kept for streaming-AUC bin escalation (eval-step rebuild)
        self._tx, self._step_rng = tx, step_rng

        sample = next(self.get_batcher("train", True).epoch(0))
        self.state = ts.create_train_state(self.model, self.config, self.args,
                                           tx, init_rng, sample)
        if self.args.finetune and self.args.pretrained_model_path:
            self.load_for_finetune(self.args.pretrained_model_path)

        # Multi-device: shard state/batches over the ('data','model') mesh.
        # Tables row-shard over 'model' when num_model_shards > 1 (or
        # table_sharding='rows'); XLA inserts the gradient all-reduce over
        # 'data' (replaces the reference's vestigial DDP, SURVEY.md §2.7).
        self.mesh = None
        from map_tpu.parallel.context import (
            set_table_exchange, set_table_mesh)

        set_table_mesh(None)
        set_table_exchange("psum")
        if jax.device_count() > 1:
            from map_tpu.parallel import sharding as sh
            from map_tpu.parallel.mesh import mesh_from_args

            self.mesh = mesh_from_args(self.args)
            mode = self.args.table_sharding
            if mode == "auto":
                mode = "rows" if self.args.num_model_shards > 1 else "replicated"
            self._table_mode = mode
            self.state = sh.shard_state(self.state, self.mesh, mode)
            if mode == "rows":
                # Route table gathers through the explicit shard_map exchange
                # (consulted when the steps below are first traced).
                set_table_mesh(self.mesh)
                exch = str(getattr(self.args, "table_exchange", "psum"))
                if exch not in ("psum", "hotcold"):
                    raise ValueError(
                        f"table_exchange={exch!r} — valid: 'psum', 'hotcold' "
                        "(a typo here must not silently fall back to psum)")
                if exch == "hotcold":
                    set_table_exchange("hotcold", self._build_hot_rows())
                logger.info(
                    f"table sharding: rows over mesh "
                    f"{dict(zip(self.mesh.axis_names, self.mesh.devices.shape))}; "
                    f"exchange = "
                    + ("hot-prefix cache + capacity-bounded cold segments"
                       if exch == "hotcold" else
                       "shard_map masked-gather+psum"))

        # Sparse-stream decoder AdamW (ops/sparse_adamw): trace-time switch
        # read by the dedup backward and the optimizer; only sound when
        # tables are unsharded, the fused partition is active, and no
        # global-norm clip consumes table grads numerically.
        from map_tpu.ops import sparse_adamw

        sparse_adamw.enable(
            bool(getattr(self.args, "sparse_table_update", False))
            and self.mesh is None
            and getattr(self.args, "fused_table_update", True)
            and not (self.args.max_grad_norm and self.args.max_grad_norm > 0))

        if getattr(self.config, "pretrain", False):
            if self.config.pt_type == "MFP":
                self._train_step, self._eval_step = ts.make_mfp_steps(
                    self.model, self.config, self.args, tx, step_rng,
                    self._alias_prob, self._alias_alias,
                    self.config.logprob_noise, per_field=self._per_field)
            elif self.config.pt_type == "RFD":
                self._train_step, self._eval_step = ts.make_rfd_steps(
                    self.model, self.config, self.args, tx, step_rng)
            else:
                raise NotImplementedError(self.config.pt_type)
        else:
            self._train_step, self._eval_step = ts.make_supervised_steps(
                self.model, self.config, self.args, tx, step_rng,
                streaming_bins=self._streaming_bins)
        self._steps_per_call = max(1, getattr(self.args, "steps_per_call", 1))
        self._multi_step = (ts.make_multi_step(self._train_step, self._steps_per_call)
                            if self._steps_per_call > 1 else None)
        self._setup_resident_data()
        self._eval_has_rng = bool(getattr(self.config, "pretrain", False))
        # Multi-host supervised eval returns per-example arrays that must be
        # process-allgathered per batch; keep those dispatches unstacked.
        # (Pretrain evals and streaming mode reduce to replicated scalars /
        # histograms on device, so stacking stays on.)
        stack_eval = self._steps_per_call > 1 and not (
            jax.process_count() > 1 and not self._eval_has_rng
            and not self._streaming_bins)
        self._multi_eval = (ts.make_multi_eval(self._eval_step, self._eval_has_rng)
                            if stack_eval else None)
        self._t_total, self._t_warmup = t_total, t_warmup
        self._maybe_resume()

    def _build_hot_rows(self) -> dict:
        """Static hot physical-row lists for the 'hotcold' exchange, keyed by
        table physical row count: the first hot_rows_per_field logical ids of
        every field block (the preprocessing orders in-field ids frequency-
        DESCENDING, ref proc_avazu.py:248-251 Counter.most_common) plus the
        reserved block (the <mask> id is the hottest id of an MFP stream).
        One list per distinct table width (input embed, MFP decoder, 1-wide
        bias/LR tables); tables sharing a physical row count share geometry
        and therefore a list."""
        from map_tpu.data.artifacts import NUM_RESERVED
        from map_tpu.ops.packed_table import pack_factor, packed_shape

        cfg = self.config
        if getattr(cfg, "idx_low", None) is None:
            return {}
        lo_a = np.asarray(cfg.idx_low, np.int64)
        hi_a = np.asarray(cfg.idx_high, np.int64)
        r = int(getattr(self.args, "hot_rows_per_field", 512))
        v = int(cfg.input_size)
        packed = bool(getattr(cfg, "packed_tables", False))
        widths = [int(cfg.embed_size), 1]  # input table; bias / LR tables
        if getattr(cfg, "pretrain", False) and cfg.pt_type == "MFP":
            widths.append(int(cfg.proj_size))
        out = {}
        for e in widths:
            p = pack_factor(e) if packed else 1
            nrows = packed_shape(v, e)[0] if packed else v
            hots = [np.arange(0, (NUM_RESERVED - 1) // p + 1)]  # reserved ids
            for lo, hi in zip(lo_a, hi_a):
                stop = min(lo + r, hi)
                if stop > lo:
                    hots.append(np.arange(lo // p, (stop - 1) // p + 1))
            out[int(nrows)] = np.unique(np.concatenate(hots)).astype(np.int32)
        return out

    def _rebuild_streaming_eval(self, new_bins: int) -> None:
        """Rebuild the supervised eval step with a finer streaming histogram
        (bound-breach escalation; the train step is untouched)."""
        self._streaming_bins = int(new_bins)
        _, self._eval_step = ts.make_supervised_steps(
            self.model, self.config, self.args, self._tx, self._step_rng,
            streaming_bins=self._streaming_bins)
        if self._multi_eval is not None:
            self._multi_eval = ts.make_multi_eval(
                self._eval_step, self._eval_has_rng)

    def _setup_resident_data(self) -> None:
        """Device-resident train data: upload the train id matrix to HBM once
        and ship only shuffled indices per step (train_step._resident_batch).
        'auto' turns it on for single-process runs whose train matrix fits
        the budget (v5e HBM is 16 GB; the canonical Avazu matrix is ~3.1 GB,
        Criteo-x4 ~5.7 GB). Multi-host runs keep the host pipeline in auto
        mode (each process would replicate the full matrix onto its
        devices); force with device_resident_data=on."""
        self._data_ref = None
        self._resident_step = None
        self._resident_multi = None
        mode = str(getattr(self.args, "device_resident_data", "auto"))
        if mode == "off" or (mode == "auto" and jax.process_count() > 1):
            return
        x = self.dataset.X["train"]
        budget = float(getattr(self.args, "device_data_budget_gb", 8.0)) * 1e9
        if x.nbytes > budget:
            if mode == "auto":
                logger.info(
                    f"device-resident data: off (train matrix {x.nbytes/1e9:.1f} "
                    f"GB > budget {budget/1e9:.1f} GB)")
                return
            # forced ('on'): proceed, but surface the risk before the upload
            # (on multi-host the full matrix replicates onto every process's
            # devices) instead of leaving only the allocator failure.
            logger.warning(
                f"device-resident data FORCED on: train matrix "
                f"{x.nbytes/1e9:.1f} GB exceeds device_data_budget_gb "
                f"{budget/1e9:.1f} — the upload may OOM the device"
                + (f" (replicated onto every process)"
                   if jax.process_count() > 1 else ""))
        if x.dtype != np.int32:
            x = x.astype(np.int32)
        y = self.dataset.Y["train"]
        if y.dtype != np.float32:
            y = y.astype(np.float32)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            sharding = NamedSharding(self.mesh, P())  # replicated
            xdev = jax.device_put(x, sharding)
            ydev = jax.device_put(y, NamedSharding(self.mesh, P()))
        else:
            xdev = jax.device_put(x)
            ydev = jax.device_put(y)
        self._data_ref = {"x": xdev, "y": ydev}
        # Stream v2 (round 4): single-process, un-meshed, no noise side
        # channel — the epoch's shuffled order ALSO lives in HBM (uploaded
        # once per epoch, _ensure_epoch_perm) and each step ships only a
        # scalar batch number; the step dynamic-slices the resident
        # permutation. Same host-computed permutation, so the stream stays
        # bit-identical to the index/host pipelines.
        from map_tpu.parallel.mesh import data_parallel_size

        bs = (self.args.per_device_train_batch_size
              * max(1, data_parallel_size(self.args)))
        self._stream_v2 = (jax.process_count() == 1 and self.mesh is None
                          and self._noise_rows_per_example() == 0)
        self._perm_epoch = -1
        self._resident_step = ts.make_resident_step(self._train_step,
                                                    batch_size=bs)
        if self._steps_per_call > 1:
            self._resident_multi = ts.make_resident_multi_step(
                self._train_step, self._steps_per_call, batch_size=bs)
        logger.info(f"device-resident data: on "
                    f"({x.nbytes/1e9:.2f} GB train matrix in HBM; "
                    f"per-step transfer = "
                    + ("batch number only (resident epoch permutation)"
                       if self._stream_v2 else "indices only)"))

    # ------------------------------------------------------------------
    # input streaming: async host->device prefetch + multi-step stacking
    # ------------------------------------------------------------------

    def _put(self, batch, stacked: bool) -> dict:
        """Async device_put with mesh batch sharding (batch axis = 'data').

        Multi-host: each process holds only its block of the global batch
        (loader.py process sharding); jax.make_array_from_process_local_data
        assembles the global sharded array without any cross-host transfer
        (process blocks land on that process's devices)."""
        if "index" in batch or "start" in batch:
            # resident mode: labels/weight stay host-side (window logging);
            # the step regathers them from the resident y / real_count
            batch = {k: v for k, v in batch.items()
                     if k not in ("labels", "weight")}
        if self.mesh is None:
            return jax.device_put(batch)
        from jax.sharding import NamedSharding, PartitionSpec as P

        def spec(leaf):
            ndim = leaf.ndim
            batch_axis = 1 if stacked else 0
            axes = [None] * ndim
            if ndim > batch_axis:
                axes[batch_axis] = "data"  # scalars (real_count) replicate
            return NamedSharding(self.mesh, P(*axes))

        if jax.process_count() > 1:
            # explicit global shape: when model-axis replicas span processes,
            # several processes contribute the SAME data block, so the global
            # batch axis is local * D / n_local_blocks — jax's inference
            # (local * process_count / ...) would mis-scale it.
            shard = self._row_shard() or (0, 1, jax.process_count())
            _, n_blocks, d = shard

            def put(leaf):
                leaf = np.asarray(leaf)
                batch_axis = 1 if stacked else 0
                gshape = list(leaf.shape)
                if leaf.ndim > batch_axis:
                    gshape[batch_axis] = leaf.shape[batch_axis] * d // n_blocks
                return jax.make_array_from_process_local_data(
                    spec(leaf), leaf, tuple(gshape))

            return jax.tree.map(put, batch)
        return jax.device_put(batch, jax.tree.map(spec, batch))

    def _grouped_stream(self, batches, grouped: bool):
        """Yields (n, device_batch_or_stack, host_batches). When `grouped`,
        stacks steps_per_call batches into one transfer (consumed by a fused
        lax.scan dispatch); always prefetches transfers on a background thread
        so H2D overlaps compute (the tunnel costs ~10 ms per un-prefetched
        batch)."""
        import queue as queue_mod
        import threading

        spc = self._steps_per_call if grouped else 1
        depth = max(1, getattr(self.args, "prefetch_batches", 2))
        q: "queue_mod.Queue" = queue_mod.Queue(maxsize=depth)

        def producer():
            try:
                group = []
                for b in batches:
                    if isinstance(b, tuple):
                        # pre-stacked group from loader.epoch_stacked:
                        # (n, stacked_or_batch, per_batch_views)
                        n, payload, views = b
                        q.put((n, self._put(payload, n > 1), views))
                        continue
                    group.append(b)
                    if len(group) == spc and spc > 1:
                        stacked = {k: np.stack([g[k] for g in group])
                                   for k in group[0]}
                        q.put((spc, self._put(stacked, True), group))
                        group = []
                for b in group:
                    q.put((1, self._put(b, False), [b]))
                q.put(None)
            except BaseException as e:  # surface errors to the consumer
                q.put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, BaseException):
                raise item
            yield item

    def _train_stream(self, batches):
        return self._grouped_stream(batches, self._multi_step is not None)

    def _eval_dispatch(self, batches, rng_base=None):
        """Yields (metrics_device, host_batches), dispatching steps_per_call
        eval batches per device call (lax.scan) like the train stream; stacked
        groups return metrics with a leading per-batch axis. RNG (pretrain
        evals) folds with the ABSOLUTE batch index, so grouped and ungrouped
        streams are bit-identical."""
        idx = 0
        for n, dev_batch, host_group in self._grouped_stream(
                batches, self._multi_eval is not None):
            if n > 1:
                if self._eval_has_rng:
                    m = self._multi_eval(self.state, dev_batch, rng_base, idx)
                else:
                    m = self._multi_eval(self.state, dev_batch)
            elif self._eval_has_rng:
                m = self._eval_step(self.state, dev_batch,
                                    jax.random.fold_in(rng_base, idx))
            else:
                m = self._eval_step(self.state, dev_batch)
            idx += n
            yield m, host_group

    def _host_local_rows(self, arr) -> np.ndarray:
        """Host copy of the per-example rows this process owns. Single-host:
        the whole array. Multi-host: the addressable shards, in batch order
        (the batch axis is the trailing data axis: 0 unstacked, 1 stacked)."""
        if jax.process_count() == 1:
            return np.asarray(jax.device_get(arr))
        axis = 0 if arr.ndim == 1 else 1
        shards = sorted(arr.addressable_shards,
                        key=lambda s: s.index[axis].start or 0)
        return np.concatenate([np.asarray(s.data) for s in shards], axis=axis)

    def _host_variables(self, tree):
        """device_get that also handles cross-process-sharded leaves
        (multi-host checkpointing: gather every leaf to every host)."""
        if jax.process_count() == 1:
            return jax.device_get(tree)
        from jax.experimental import multihost_utils

        def leaf(x):
            if not isinstance(x, jax.Array) or x.is_fully_addressable \
                    or x.sharding.is_fully_replicated:
                # replicated data is readable from the local replica even
                # when the sharding spans non-addressable devices
                return np.asarray(jax.device_get(x))
            # cross-process sharded (row-sharded tables): gather rows
            return np.asarray(multihost_utils.process_allgather(x, tiled=True))

        return jax.tree_util.tree_map(leaf, tree)

    def _run_train_step(self, n, dev_batch):
        # key off the batch form, not just the flag: a stream driven outside
        # _epochs_with_skip may still emit gathered id rows
        if self._data_ref is not None and (
                "index" in dev_batch or "start" in dev_batch):
            if n > 1:
                self.state, metrics = self._resident_multi(
                    self.state, dev_batch, self._data_ref)
            else:
                self.state, metrics = self._resident_step(
                    self.state, dev_batch, self._data_ref)
        elif n > 1:
            self.state, metrics = self._multi_step(self.state, dev_batch)
        else:
            self.state, metrics = self._train_step(self.state, dev_batch)
        prev = self.global_step
        self.global_step += n
        self._post_step(prev)
        return metrics

    def _crossed(self, prev: int, every: int) -> bool:
        return every > 0 and (self.global_step // every) != (prev // every)

    def _should_log(self, prev: int) -> bool:
        # logging_first_step is a dead flag in the reference
        # (arguments.py:31); functional here.
        if getattr(self.args, "logging_first_step", False) and prev == 0:
            return True
        return self._crossed(prev, self.args.logging_steps)

    # ------------------------------------------------------------------
    # mid-run resume (framework addition; reference never checkpoints
    # optimizer state, SURVEY.md §5.3)
    # ------------------------------------------------------------------

    def _maybe_resume(self) -> None:
        if not getattr(self.args, "resume", False):
            return
        self._join_ckpt_writer()  # a pending async write must land first
        if not checkpoints.has_resume_state(self.args.output_dir):
            return
        self.state, meta = checkpoints.load_train_state(
            self.args.output_dir, jax.device_get(self.state))
        self.global_step = int(meta["global_step"])
        self.best_eval_auc = float(meta["best_eval_auc"])
        self.best_eval_step = int(meta["best_eval_step"])
        self._patience = int(meta["patience"])
        self.eval_metrics = [list(m) for m in meta.get("eval_metrics", [])]
        logger.info(f"resumed from step {self.global_step} "
                    f"(best_eval_auc={self.best_eval_auc:.6f})")

    def _post_step(self, prev_step: int) -> None:
        self._maybe_save_resume(prev_step)
        self._profile_hook()

    def _profile_hook(self) -> None:
        """Capture a jax.profiler trace of steps [2, 2+profile_steps) to
        {output_dir}/profile (reference has no tracing at all, SURVEY.md §5.1)."""
        ps = getattr(self.args, "profile_steps", 0)
        if not ps:
            return
        import os

        if self.global_step >= 2 and not self._profiler_active \
                and self.global_step < 2 + ps:
            jax.profiler.start_trace(os.path.join(self.args.output_dir, "profile"))
            self._profiler_active = True
        elif self._profiler_active and self.global_step >= 2 + ps:
            jax.profiler.stop_trace()
            self._profiler_active = False

    def _maybe_save_resume(self, prev_step: Optional[int] = None) -> None:
        if prev_step is None:
            prev_step = self.global_step - 1
        if self._crossed(prev_step, self.args.save_steps):
            meta = {"global_step": self.global_step,
                    "best_eval_auc": self.best_eval_auc,
                    "best_eval_step": self.best_eval_step,
                    "patience": self._patience,
                    # copy: the live list mutates while the writer runs
                    "eval_metrics": [list(m) for m in self.eval_metrics]}
            if self._async_fetch:
                from map_tpu.train.async_writer import snapshot_device_tree

                snap = snapshot_device_tree(self.state)
                self._ckpt_writer.submit(
                    lambda: checkpoints.save_train_state(
                        self.args.output_dir, snap, meta),
                    label=f"resume-{self.global_step}")
                return
            host_state = self._host_variables(self.state)
            if jax.process_index() != 0:
                return
            if self._async_ckpt:
                self._ckpt_writer.submit(
                    lambda: checkpoints.save_train_state(
                        self.args.output_dir, host_state, meta),
                    label=f"resume-{self.global_step}")
                return
            checkpoints.save_train_state(
                self.args.output_dir, host_state, meta)

    def _ensure_epoch_perm(self, epoch: int, batcher) -> None:
        """Stream v2: upload this epoch's (padded) shuffled order to HBM —
        EXACTLY the loader's order (same seeded rng), so the index stream is
        bit-identical; per-step transfer shrinks to a scalar batch number."""
        if self._perm_epoch == epoch:
            return
        n = batcher.num_examples()
        rng = np.random.default_rng(
            np.random.SeedSequence([batcher.seed, epoch]))
        order = rng.permutation(n) if batcher.shuffle else np.arange(n)
        total = len(batcher) * batcher.batch_size
        if total > n:  # final-batch padding rows (weight 0) use row 0
            order = np.concatenate(
                [order, np.zeros(total - n, order.dtype)])
        self._data_ref["perm"] = jax.device_put(order.astype(np.int32))
        self._perm_epoch = epoch

    def _epochs_with_skip(self, batcher):
        """Yield (epoch, batch_iter); on resume, fast-forwards past consumed
        epochs/batches (the shuffled order is seeded per epoch, so skipping
        reproduces the exact stream)."""
        # train batchers emit index batches when the train matrix is
        # device-resident (_setup_resident_data); eval batchers never route
        # through here and keep the host-gather pipeline
        batcher.emit_indices = self._data_ref is not None
        batcher.emit_start_only = (self._data_ref is not None
                                   and self._stream_v2)
        # the train batcher is created BEFORE the mesh exists (_build_steps
        # needs its length); re-resolve the mesh-aware loader sharding now
        batcher.row_shard = self._row_shard()
        per_epoch = len(batcher)
        start_epoch = self.global_step // per_epoch
        skip = self.global_step % per_epoch
        for epoch in range(start_epoch, self.args.num_train_epochs):
            if batcher.emit_start_only:
                self._ensure_epoch_perm(epoch, batcher)
            # start_batch fast-forwards in O(1) gather work (loader.py)
            sb = skip if epoch == start_epoch else 0
            if self._multi_step is not None:
                # group-vectorized host assembly (loader.epoch_stacked):
                # one numpy/native pass builds the already-stacked group the
                # fused dispatch consumes — the per-batch Python host loop
                # was the measured e2e residual (PERFORMANCE.md round 4)
                yield epoch, batcher.epoch_stacked(
                    self._steps_per_call, epoch, start_batch=sb)
            else:
                yield epoch, batcher.epoch(epoch, start_batch=sb)

    def _variables(self) -> Dict:
        v = {"params": self.state.params}
        if self.state.batch_stats:
            v["batch_stats"] = self.state.batch_stats
        return v

    def load_for_finetune(self, model_path: str) -> None:
        """Shape-matched partial restore (models.py:109-112)."""
        self._join_ckpt_writer()
        target = checkpoints.load_model_file(model_path)
        host_vars = jax.device_get(self._variables())
        merged, loaded, skipped = checkpoints.partial_restore(host_vars, target)
        logger.info(f"finetune restore: {loaded} tensors loaded, {skipped} skipped")
        self.state = self.state.replace(
            params=merged["params"],
            batch_stats=merged.get("batch_stats", self.state.batch_stats))

    def _log_run_header(self, title: str, num_batches: int) -> None:
        logger.info(f"\n***** running {title} *****")
        logger.info(f"  dataset_name = {self.args.dataset_name}")
        logger.info(f"  input_size = {self.config.input_size}")
        logger.info(f"  num_fields = {self.config.num_fields}")
        logger.info(f"  num_examples = {self.dataset.split_sizes()['train']}")
        logger.info(f"  num_epochs = {self.args.num_train_epochs}")
        logger.info(f"  batch_size = {self.args.train_batch_size}")
        logger.info(f"  total_steps = {self._t_total}")
        logger.info(f"  warmup_steps = {self._t_warmup}")
        logger.info(f"  learning_rate = {self.args.learning_rate}")
        logger.info(f"  weight_decay = {self.args.weight_decay}")
        logger.info(f"  lr_sched = {self.args.lr_sched}")
        self.model.validate_model_config()

    def _join_ckpt_writer(self) -> None:
        """Join the local background checkpoint writer, then barrier across
        processes: under the write-offload default only process 0 holds the
        in-flight write, so a non-zero process reaching a checkpoint READ
        (load_model / finetune restore / resume) must not race past it."""
        self._ckpt_writer.wait()
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("map_tpu_ckpt_writer_join")

    def _emit_metrics(self, kind: str, payload: Dict) -> None:
        """Append one JSON line to {output_dir}/metrics.jsonl (process 0): a
        machine-readable mirror of every window/eval/test log line. The
        reference's only machine-readable output is the end-of-run pandas
        table (code/trainer.py:160-161); this streams the same metrics live
        for dashboards/automation. Non-finite floats become null (strict
        JSON); multi-host records carry process_count so shard-local window
        metrics are identifiable downstream."""
        if jax.process_index() != 0:
            return
        rec = {"kind": kind, "step": self.global_step,
               "time": round(time.time(), 3)}
        if jax.process_count() > 1:
            rec["process_count"] = jax.process_count()
        for k, v in payload.items():
            if isinstance(v, (np.floating, np.integer)):
                v = v.item()
            if isinstance(v, float) and not math.isfinite(v):
                v = None
            rec[k] = v
        os.makedirs(self.args.output_dir, exist_ok=True)
        with open(os.path.join(self.args.output_dir, "metrics.jsonl"),
                  "a") as f:
            f.write(json.dumps(rec) + "\n")

    def _current_lr(self) -> float:
        return float(self._schedule(max(self.global_step - 1, 0)))

    # ------------------------------------------------------------------
    # supervised CTR (trainer.py:87-161)
    # ------------------------------------------------------------------

    def train(self) -> None:
        batcher = self.get_batcher("train", True)
        self._build_steps(len(batcher))
        self._log_run_header("training", len(batcher))

        self._stop_training = False
        tr_loss_window = []
        tr_labels, tr_probs, tr_weights = [], [], []
        window_t0 = time.time()

        for epoch, batches in self._epochs_with_skip(batcher):
            logger.info(f"-------------------- epoch-{epoch} --------------------")
            for n, dev_batch, host_group in self._train_stream(batches):
                prev = self.global_step
                metrics = self._run_train_step(n, dev_batch)
                tr_loss_window.append(metrics["loss"])   # () or (n,)
                tr_probs.append(metrics["probs"])        # (B,) or (n, B)
                tr_labels.extend(g["labels"] for g in host_group)
                tr_weights.extend(g["weight"] for g in host_group)

                if self._should_log(prev):
                    got = jax.device_get(tr_loss_window)
                    losses = np.concatenate(
                        [np.atleast_1d(x) for x in got]).astype(np.float64)
                    # multi-host: the window AUC is computed over THIS
                    # process's shard (labels/weights are host-local); it is
                    # a progress signal, not a model-selection metric — eval()
                    # gathers globally for the real AUC.
                    probs = np.concatenate(
                        [self._host_local_rows(p).reshape(-1)
                         for p in tr_probs]).astype(np.float64)
                    labels = np.concatenate(tr_labels)
                    w = np.concatenate(tr_weights) > 0
                    window_auc = self._window_auc(labels[w], probs[w])
                    dt = time.time() - window_t0
                    _log = {"window_auc": window_auc,
                            "window_loss": float(losses.mean()),
                            "examples_per_sec": round(w.sum() / max(dt, 1e-9)),
                            "time_cost": round(dt, 3)}
                    # Multi-host: window metrics cover THIS process's data
                    # shard only — say so in the line, or an operator reads a
                    # process_count x "slowdown" into a 1-vs-N comparison.
                    shard = (f" [shard-local metrics, 1 of "
                             f"{jax.process_count()} processes]"
                             if jax.process_count() > 1 else "")
                    logger.info(f"step = {self.global_step}, {_log}{shard}")
                    self._emit_metrics("train_window", _log)
                    tr_loss_window, tr_labels, tr_probs, tr_weights = [], [], [], []
                    window_t0 = time.time()

            self.eval()
            if self._stop_training:
                break
        self._join_ckpt_writer()  # run completion implies durable checkpoints

        with pd.option_context("display.max_rows", None, "display.max_columns", None):
            logger.info(str(pd.DataFrame(self.eval_metrics, columns=["auc", "log_loss"])))

    @staticmethod
    def _window_auc(labels: np.ndarray, probs: np.ndarray) -> float:
        """Windowed train AUC; a single-class logging window (skewed stream at
        small logging_steps) is a progress signal, not worth a mid-epoch crash
        — returns nan and training continues. (The reference crashes in
        sklearn here; eval() keeps the strict both-classes contract since it
        drives model selection.)"""
        try:
            return roc_auc(labels, probs)
        except ValueError:
            return float("nan")

    def eval(self, split: str = "valid", test_eval: bool = False) -> Dict[str, float]:
        batcher = self.get_batcher(split, False)
        logger.info("\n***** running TEST *****" if test_eval else "\n***** running eval *****")
        logger.info(f"  num examples = {batcher.num_examples()}")
        logger.info(f"  batch size = {batcher.batch_size}")

        streaming = self._streaming_bins > 0
        multihost = jax.process_count() > 1

        def run_pass():
            dev_metrics, all_labels, all_w = [], [], []
            for m, host_group in self._eval_dispatch(batcher.epoch(0)):
                if multihost and not streaming:
                    # per-example outputs are sharded across processes; gather
                    # the global batch on every host (exact AUC needs a global
                    # sort). Labels/weight come from the GLOBAL device batch —
                    # host-side per-process labels would duplicate model-
                    # replica blocks when replicas span processes.
                    from jax.experimental import multihost_utils

                    def allg(x):
                        return multihost_utils.process_allgather(x, tiled=True)

                    m = {"loss": jax.device_get(m["loss"]),
                         "logits": allg(m["logits"]),
                         "probs": allg(m["probs"]),
                         "labels": allg(m["labels"]),
                         "weight": allg(m["weight"])}
                    all_labels.append(np.asarray(m["labels"]).reshape(-1))
                    all_w.append(np.asarray(m["weight"]).reshape(-1))
                    dev_metrics.append(m)
                    continue
                dev_metrics.append(m)
                if not streaming:
                    all_labels.extend(g["labels"] for g in host_group)
                    all_w.extend(g["weight"] for g in host_group)
            if multihost and not streaming:
                return dev_metrics, all_labels, all_w
            return jax.device_get(dev_metrics), all_labels, all_w

        if streaming:
            # device-reduced histograms + exact sums (O(bins) D2H per batch).
            # The certified bound (utils/metrics.py) gates model-selection
            # safety: on a breach the bin count auto-doubles (eval step is
            # rebuilt) and the pass re-runs, instead of silently selecting on
            # an under-resolved estimate (all pass bins are re-histogrammed,
            # so escalation is exact, just a re-dispatch + re-jit).
            AUC_BOUND, BINS_CAP = 5e-5, 1 << 20
            while True:
                got, _, _ = run_pass()
                nb = self._streaming_bins
                hist_pos = np.zeros(nb, np.float64)
                hist_neg = np.zeros(nb, np.float64)
                ll_sum = logit_sum = prob_sum = count = 0.0
                for g in got:
                    hist_pos += np.asarray(g["hist_pos"], np.float64).reshape(-1, nb).sum(0)
                    hist_neg += np.asarray(g["hist_neg"], np.float64).reshape(-1, nb).sum(0)
                    ll_sum += float(np.sum(g["ll_sum"]))
                    logit_sum += float(np.sum(g["logit_sum"]))
                    prob_sum += float(np.sum(g["prob_sum"]))
                    count += float(np.sum(g["count"]))
                auc = auc_from_histograms(hist_pos, hist_neg)
                from map_tpu.utils.metrics import auc_histogram_error_bound
                bound = auc_histogram_error_bound(hist_pos, hist_neg)
                if bound > AUC_BOUND and nb < BINS_CAP:
                    logger.warning(
                        f"streaming AUC certified error bound {bound:.2e} "
                        f"exceeds {AUC_BOUND:.0e}; escalating auc_bins "
                        f"{nb} -> {nb * 2} and re-running the eval pass")
                    self._rebuild_streaming_eval(nb * 2)
                    continue
                if bound > AUC_BOUND:
                    logger.warning(
                        f"streaming AUC certified error bound {bound:.2e} "
                        f"still exceeds {AUC_BOUND:.0e} at the {nb}-bin cap — "
                        f"disable --streaming_auc for model selection")
                else:
                    logger.info(f"streaming AUC certified error bound {bound:.2e}")
                break
            ll = ll_sum / count
            avg_logits, avg_probs = logit_sum / count, prob_sum / count
        else:
            got, all_labels, all_w = run_pass()
            logits = np.concatenate(
                [np.asarray(g["logits"]).reshape(-1) for g in got]).astype(np.float64)
            probs = np.concatenate(
                [np.asarray(g["probs"]).reshape(-1) for g in got]).astype(np.float64)
            labels = np.concatenate(all_labels)
            w = np.concatenate(all_w) > 0
            logits, probs, labels = logits[w], probs[w], labels[w]
            auc = roc_auc(labels, probs)
            ll = binary_log_loss(labels, probs)
            avg_logits, avg_probs = float(logits.mean()), float(probs.mean())
        self.eval_metrics.append([auc, ll])
        _log = {
            "learning_rate": self._current_lr(),
            "eval_auc": auc,
            "eval_loss": ll,
            "avg_logits": avg_logits,
            "avg_probs": avg_probs,
        }
        logger.info(str(_log))
        self._emit_metrics("test" if test_eval else "eval", _log)
        if not test_eval:
            if auc > self.best_eval_auc:
                self.best_eval_auc = auc
                self.best_eval_step = self.global_step
                self._patience = 0
                self.save_model(self.args.output_dir)
            else:
                self._patience += 1
            if self._patience > self.args.patience:
                self._stop_training = True
        return _log

    # ------------------------------------------------------------------
    # MFP pretrain (trainer.py:268-391)
    # ------------------------------------------------------------------

    def MFP_pretrain(self) -> None:
        batcher = self.get_batcher("train", True)
        self._build_steps(len(batcher))
        self._log_run_header("pretraining", len(batcher))
        logger.info(f"  mask_ratio = {self.args.mask_ratio}")
        logger.info(f"  pt_neg_num = {self.config.pt_neg_num}")
        logger.info(f"  pt_type = {self.config.pt_type}")

        window = {"loss": [], "count": [], "acc_count": []}
        start_time = time.time()

        for epoch, batches in self._epochs_with_skip(batcher):
            logger.info(f"-------------------- epoch-{epoch} --------------------")
            for n, dev_batch, host_group in self._train_stream(batches):
                prev = self.global_step
                m = self._run_train_step(n, dev_batch)
                for key in window:
                    window[key].append(m[key])
                if self._should_log(prev):
                    vals = jax.device_get(window)
                    flat = {k: np.concatenate([np.atleast_1d(x) for x in v])
                            for k, v in vals.items()}
                    loss = float(np.mean(flat["loss"]))
                    acc = float(np.sum(flat["acc_count"]) / np.sum(flat["count"]))
                    _log = {"window_loss": loss, "window_acc": acc,
                            "time_cost": time.time() - start_time}
                    logger.info(f"step = {self.global_step}, {_log}")
                    self._emit_metrics("mfp_window", _log)
                    window = {"loss": [], "count": [], "acc_count": []}
                    start_time = time.time()
            self.MFP_pretrain_eval()
        self.save_model(self.args.output_dir)
        self._join_ckpt_writer()  # run completion implies durable checkpoints

        with pd.option_context("display.max_rows", None, "display.max_columns", None):
            logger.info(str(pd.DataFrame(self.eval_metrics, columns=["mfp_loss", "mfp_acc"])))

    def MFP_pretrain_eval(self) -> Dict[str, float]:
        batcher = self.get_batcher("valid", False)
        logger.info("***** running eval *****")
        logger.info(f"  num examples = {batcher.num_examples()}")
        total_loss, total_acc, count = 0.0, 0.0, 0.0
        start_time = time.time()
        for m, _ in self._eval_dispatch(batcher.epoch(0), self._eval_rng_base):
            g = jax.device_get(m)
            c = np.atleast_1d(g["count"]).astype(np.float64)
            total_loss += float((np.atleast_1d(g["loss"]) * c).sum())
            total_acc += float(np.sum(g["acc_count"]))
            count += float(c.sum())
        _log = {
            "learning_rate": self._current_lr(),
            "eval_mfp_loss": total_loss / count,
            "eval_mfp_acc": total_acc / count,
            "eval_time_cost": time.time() - start_time,
        }
        self.eval_metrics.append([_log["eval_mfp_loss"], _log["eval_mfp_acc"]])
        logger.info(str(_log))
        self._emit_metrics("mfp_eval", _log)
        return _log

    # ------------------------------------------------------------------
    # RFD pretrain (trainer.py:393-515)
    # ------------------------------------------------------------------

    def RFD_pretrain(self) -> None:
        batcher = self.get_batcher("train", True)
        self._build_steps(len(batcher))
        self._log_run_header("pretraining", len(batcher))
        logger.info(f"  pt_type = {self.config.pt_type}")
        logger.info(f"  mask_ratio = {self.args.mask_ratio}")
        logger.info(f"  RFD_replace = {self.args.RFD_replace}")

        window = {"loss": [], "acc": [], "pos_ratio": []}
        start_time = time.time()

        for epoch, batches in self._epochs_with_skip(batcher):
            logger.info(f"-------------------- epoch-{epoch} --------------------")
            for n, dev_batch, host_group in self._train_stream(batches):
                prev = self.global_step
                m = self._run_train_step(n, dev_batch)
                for key in window:
                    window[key].append(m[key])
                if self._should_log(prev):
                    vals = jax.device_get(window)
                    flat = {k: np.concatenate([np.atleast_1d(x) for x in v])
                            for k, v in vals.items()}
                    _log = {"window_rfd_loss": float(np.mean(flat["loss"])),
                            "window_rfd_acc": float(np.mean(flat["acc"])),
                            "window_pos_ratio": float(np.mean(flat["pos_ratio"])),
                            "time_cost": time.time() - start_time}
                    logger.info(f"step = {self.global_step}, {_log}")
                    self._emit_metrics("rfd_window", _log)
                    window = {"loss": [], "acc": [], "pos_ratio": []}
                    start_time = time.time()
            self.RFD_pretrain_eval()
        self.save_model(self.args.output_dir)
        self._join_ckpt_writer()  # run completion implies durable checkpoints

        with pd.option_context("display.max_rows", None, "display.max_columns", None):
            logger.info(str(pd.DataFrame(self.eval_metrics, columns=["rfd_loss", "rfd_acc"])))

    def RFD_pretrain_eval(self) -> Dict[str, float]:
        batcher = self.get_batcher("valid", False)
        logger.info("\n***** running eval *****")
        logger.info(f"  num examples = {batcher.num_examples()}")
        total_loss, total_acc, count = 0.0, 0.0, 0.0
        start_time = time.time()
        for m, _ in self._eval_dispatch(batcher.epoch(0), self._eval_rng_base):
            g = jax.device_get(m)
            c = np.atleast_1d(g["count"]).astype(np.float64)
            total_loss += float((np.atleast_1d(g["loss"]) * c).sum())
            total_acc += float((np.atleast_1d(g["acc"]) * c).sum())
            count += float(c.sum())
        _log = {
            "learning_rate": self._current_lr(),
            "eval_rfd_loss": total_loss / count,
            "eval_rfd_acc": total_acc / count,
            "eval_time_cost": time.time() - start_time,
        }
        self.eval_metrics.append([_log["eval_rfd_loss"], _log["eval_rfd_acc"]])
        logger.info(str(_log))
        self._emit_metrics("rfd_eval", _log)
        return _log

    # ------------------------------------------------------------------
    # checkpoint I/O + test (trainer.py:517-535)
    # ------------------------------------------------------------------

    def save_model(self, model_dir: str) -> str:
        step = self.global_step
        limit = getattr(self.args, "save_total_limit", None)
        path = checkpoints.model_checkpoint_path(model_dir, step)
        if self._async_fetch:
            # Donation-safe on-device snapshot (HBM copy, ~ms); the worker
            # thread then owns the D2H fetch + serialize + write. Identical
            # bytes to the sync path — JAX arrays are immutable.
            from map_tpu.train.async_writer import snapshot_device_tree

            snap = snapshot_device_tree(self._variables())

            def job():
                checkpoints.save_model(snap, model_dir, step)
                if limit:
                    checkpoints.prune_checkpoints(model_dir, limit)

            self._ckpt_writer.submit(job, label=f"model-{step}")
            return path
        host_vars = self._host_variables(self._variables())
        if jax.process_index() != 0:  # every host gathers, process 0 writes
            return path
        if self._async_ckpt:
            # fetch done above (main thread — no link contention); offload
            # the serialization + disk write
            def job():
                checkpoints.save_model(host_vars, model_dir, step)
                if limit:
                    checkpoints.prune_checkpoints(model_dir, limit)

            self._ckpt_writer.submit(job, label=f"model-{step}")
            return path
        checkpoints.save_model(host_vars, model_dir, step)
        if limit:
            checkpoints.prune_checkpoints(model_dir, limit)
        return path

    def load_model(self, load_step: int, model_dir: str) -> None:
        self._join_ckpt_writer()  # the step being read may still be in flight
        restored = checkpoints.load_model(model_dir, load_step)
        self.state = self.state.replace(
            params=restored["params"],
            batch_stats=restored.get("batch_stats", self.state.batch_stats))
        if getattr(self, "mesh", None) is not None:
            # Re-apply the mesh layout: the restored leaves are host numpy
            # arrays, and the eval/test steps were traced for the sharded
            # layout (row-sharded tables under table_sharding='rows').
            # Without this, single-process jit silently re-shards every call
            # and multi-process fails on non-addressable arrays.
            from map_tpu.parallel import sharding as sh

            self.state = sh.shard_state(self.state, self.mesh, self._table_mode)

    def test(self, load_step: int = -1, model_dir: Optional[str] = None
             ) -> Dict[str, float]:
        if load_step == -1:
            load_step = self.best_eval_step
        if model_dir is None:
            model_dir = self.args.output_dir
        self.load_model(load_step, model_dir)
        return self.eval("test", test_eval=True)
