"""Host-side input pipeline: fixed-shape shuffled batches for the jitted step.

TPU-native replacement of the reference's torch DataLoader factory
(`code/trainer.py:51-58`, shuffle=is_training, default collate, 0 workers).
Differences forced by XLA's static-shape compilation model:

- Every batch has the SAME shape. The final partial batch is padded up to
  batch_size and accompanied by a {0,1} `weight` vector so losses/metrics can
  mask padding exactly (the reference simply emits a smaller last batch).
- For the RFD Unigram / Whole-Unigram generators, the corruption engine needs
  random rows of the train matrix (reference gathers them on host per batch at
  `code/trainer.py:235-236, 254-255`). The pipeline supplies them as a
  prefetched `noise_rows` side-channel input of static shape so the jitted
  step never touches host memory.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import numpy as np


class Batcher:
    def __init__(
        self,
        X: np.ndarray,
        Y: np.ndarray,
        batch_size: int,
        shuffle: bool,
        seed: int = 42,
        noise_source: Optional[np.ndarray] = None,
        noise_rows_per_example: int = 0,
        drop_remainder: bool = False,
        process_index: int = 0,
        process_count: int = 1,
    ):
        self.X = X
        self.Y = Y
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.seed = seed
        self.noise_source = noise_source
        self.noise_rows_per_example = int(noise_rows_per_example)
        self.drop_remainder = drop_remainder
        # Multi-host sharding (the working replacement for the reference's
        # never-built DistributedSampler, `code/arguments.py:58-86`): every
        # process computes the same global shuffled order (seeded rng) but
        # materializes only its contiguous block of each batch; the trainer
        # reassembles the global array with
        # jax.make_array_from_process_local_data.
        assert self.batch_size % max(1, process_count) == 0, \
            "global batch must divide evenly across processes"
        self.process_index = int(process_index)
        self.process_count = int(process_count)
        # Mesh-aware override (trainer sets this once the mesh exists):
        # (start_block, n_blocks, total_blocks) of P('data') batch sharding.
        # Model-axis replicas that span processes cover the SAME data block
        # and must materialize identical rows, so the loader shards by data
        # block, not by process (parallel.sharding.process_data_blocks).
        self.row_shard = None
        self._epoch = 0
        # Device-resident-data mode (trainer sets this after deciding
        # residency): emit row INDICES instead of gathered id rows — the
        # jitted step gathers rows from the HBM-resident train matrix, so
        # the per-step host->device transfer shrinks from the (B, F) id
        # block (+ (B*M, F) RFD noise rows) to a few KB of indices. The rng
        # stream (shuffle order, noise draws) is consumed identically, so
        # resume fast-forward and 1-vs-N-process equality are unaffected.
        self.emit_indices = False
        # Stream v2 (trainer sets with emit_indices): the epoch's shuffled
        # order is device-resident, so emit only the batch NUMBER — the step
        # dynamic-slices the resident permutation (train_step._resident_batch)
        self.emit_start_only = False

    @property
    def local_batch_size(self) -> int:
        return self.batch_size // self.process_count

    def __len__(self) -> int:
        n = len(self.Y)
        if self.drop_remainder:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def num_examples(self) -> int:
        return len(self.Y)

    def epoch(self, epoch: Optional[int] = None,
              start_batch: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        """Yield fixed-shape batches for one epoch.

        Batch dict keys: `input_ids` (B, F) int32; `labels` (B,) float32;
        `weight` (B,) float32 in {0,1}; optionally `noise_rows`
        (B * noise_rows_per_example, F) int32.

        `start_batch` skips the first batches WITHOUT materializing them
        (resume fast-forward): the per-epoch seeded rng makes the shuffled
        order deterministic, and the noise-row draw stream is advanced with
        one vectorized call — numpy's bounded-integer generation consumes the
        bit stream per value, so a single size-(skip*k) draw reproduces the
        exact per-batch draw sequence (pinned by tests/test_resume.py).
        """
        if epoch is None:
            epoch = self._epoch
            self._epoch += 1
        n = len(self.Y)
        bs = self.batch_size
        rng = np.random.default_rng(np.random.SeedSequence([self.seed, epoch]))
        order = rng.permutation(n) if self.shuffle else np.arange(n)

        from map_tpu import native

        x = self.X if self.X.dtype == np.int32 else self.X.astype(np.int32)
        y = self.Y if self.Y.dtype == np.float32 else self.Y.astype(np.float32)

        num_batches = len(self)
        if start_batch and self.noise_rows_per_example > 0:
            k = bs * self.noise_rows_per_example
            rng.integers(0, len(self.noise_source),
                         size=min(start_batch, num_batches) * k)
        if self.row_shard is not None:
            start_block, n_blocks, total_blocks = self.row_shard
            assert bs % total_blocks == 0, \
                "global batch must divide evenly across data blocks"
            rows_per_block = bs // total_blocks
            lbs = n_blocks * rows_per_block
            lo = start_block * rows_per_block
        else:
            lbs = self.local_batch_size
            lo = self.process_index * lbs
        for b in range(start_batch, num_batches):
            idx = order[b * bs:(b + 1) * bs]
            real = len(idx)
            if real < bs:
                pad = np.zeros(bs - real, dtype=idx.dtype)  # pad with row 0, weight 0
                idx = np.concatenate([idx, pad])
            # this process's contiguous block of the global batch
            lidx = idx[lo:lo + lbs]
            batch = {
                "labels": native.gather_f32(y, lidx),
                "weight": ((np.arange(bs) < real)[lo:lo + lbs]
                           ).astype(np.float32),
            }
            if self.emit_indices:
                # labels/weight stay in the dict for HOST consumers (window
                # AUC) but are NOT transferred — the step regathers labels
                # from the resident y and rebuilds weight from real_count
                # (trainer._put device-key filter / _resident_batch)
                batch["real_count"] = np.int32(real)
                if self.emit_start_only:
                    batch["start"] = np.int32(b)
                else:
                    batch["index"] = lidx.astype(np.int32)
            else:
                batch["input_ids"] = native.gather_rows_i32(x, lidx)
            if self.noise_rows_per_example > 0:
                assert self.noise_source is not None
                k = bs * self.noise_rows_per_example
                # the GLOBAL draw keeps the stream identical to 1-process
                # runs; each process gathers only its rows
                sample_index = rng.integers(0, len(self.noise_source), size=k)
                nl = lbs * self.noise_rows_per_example
                nslice = sample_index[lo * self.noise_rows_per_example:
                                      lo * self.noise_rows_per_example + nl]
                if self.emit_indices:
                    batch["noise_index"] = nslice.astype(np.int32)
                else:
                    batch["noise_rows"] = native.gather_rows_i32(
                        np.ascontiguousarray(self.noise_source, dtype=np.int32)
                        if self.noise_source.dtype != np.int32 or
                        not self.noise_source.flags.c_contiguous
                        else self.noise_source,
                        nslice)
            yield batch

    def epoch_stacked(self, spc: int, epoch: Optional[int] = None,
                      start_batch: int = 0):
        """Group-vectorized epoch stream (VERDICT round-4 item 5: the e2e
        residual vs the device step is the HOST loop — per-batch Python
        dict/gather/stack work — not dispatch depth).

        Yields (n, stacked, views): for full groups of `spc` batches, ONE
        vectorized assembly builds the already-stacked arrays the fused
        lax.scan dispatch consumes (leading axis = step), replacing ~spc
        per-batch gathers + the trainer-side np.stack re-copy; `views` are
        per-batch slices for host consumers (window metrics). The epoch tail
        (a short group and/or the padded last batch) delegates to epoch()
        so padding/weight semantics stay in one place.

        BIT-IDENTICAL stream: the shuffled order is the same per-epoch
        seeded permutation, and the noise draw uses one size-(g*k) call —
        numpy's bounded-integer generation consumes the bit stream per
        value, so it reproduces the per-batch draw sequence exactly (same
        property the resume fast-forward relies on; pinned by
        tests/test_loader.py::test_epoch_stacked_matches_per_batch)."""
        if epoch is None:
            epoch = self._epoch
            self._epoch += 1
        spc = max(1, int(spc))
        n = len(self.Y)
        bs = self.batch_size
        rng = np.random.default_rng(np.random.SeedSequence([self.seed, epoch]))
        order = rng.permutation(n) if self.shuffle else np.arange(n)
        num_batches = len(self)
        full_batches = n // bs  # batches with no padding rows
        n_groups = max(0, (full_batches - start_batch)) // spc
        npe = self.noise_rows_per_example
        k = bs * npe
        if start_batch and npe > 0:
            rng.integers(0, len(self.noise_source),
                         size=min(start_batch, num_batches) * k)
        if self.row_shard is not None:
            start_block, n_blocks, total_blocks = self.row_shard
            rows_per_block = bs // total_blocks
            lbs = n_blocks * rows_per_block
            lo = start_block * rows_per_block
        else:
            lbs = self.local_batch_size
            lo = self.process_index * lbs

        from map_tpu import native

        x = self.X if self.X.dtype == np.int32 else self.X.astype(np.int32)
        y = self.Y if self.Y.dtype == np.float32 else self.Y.astype(np.float32)
        ns = self.noise_source
        if ns is not None and (ns.dtype != np.int32
                               or not ns.flags.c_contiguous):
            ns = np.ascontiguousarray(ns, dtype=np.int32)

        for gi in range(n_groups):
            b0 = start_batch + gi * spc
            rows = order[b0 * bs:(b0 + spc) * bs].reshape(spc, bs)
            lidx = np.ascontiguousarray(rows[:, lo:lo + lbs])
            stacked = {
                "labels": np.asarray(y)[lidx],
                "weight": np.ones((spc, lbs), np.float32),
            }
            if self.emit_indices:
                stacked["real_count"] = np.full(spc, bs, np.int32)
                if self.emit_start_only:
                    stacked["start"] = np.arange(b0, b0 + spc, dtype=np.int32)
                else:
                    stacked["index"] = lidx.astype(np.int32)
            else:
                stacked["input_ids"] = native.gather_rows_i32(
                    x, lidx.reshape(-1)).reshape(spc, lbs, -1)
            if npe > 0:
                sample = rng.integers(0, len(ns), size=spc * k).reshape(
                    spc, k)
                nl = lbs * npe
                nslice = sample[:, lo * npe: lo * npe + nl]
                if self.emit_indices:
                    stacked["noise_index"] = nslice.astype(np.int32)
                else:
                    stacked["noise_rows"] = native.gather_rows_i32(
                        ns, np.ascontiguousarray(nslice).reshape(-1)
                    ).reshape(spc, nl, -1)
            views = [{kk: v[i] for kk, v in stacked.items()}
                     for i in range(spc)]
            yield spc, stacked, views

        tail_start = start_batch + n_groups * spc
        if tail_start < num_batches:
            # delegate: epoch() re-skips the draw stream up to tail_start
            for b in self.epoch(epoch, start_batch=tail_start):
                yield 1, b, [b]
