"""Sharding rules: row-sharded embedding tables over 'model', DP over 'data'.

TPU-native replacement for the reference's (vestigial) DDP scaffolding
(SURVEY.md §2.7). The layout follows the north star:
- the input embedding table, the NCE output table + bias, and the LR weight
  table are sharded on their vocabulary (row) axis over the MODEL mesh axis —
  these are the only parameters that grow with input_size;
- all dense-tower parameters are replicated; gradients sync over 'data' via
  the all-reduce XLA inserts for the batch-sharded loss;
- batches are sharded on the leading (batch) axis over 'data' and replicated
  over 'model'.

The rules are applied to the whole TrainState pytree by trailing-path
matching, so optimizer moments (mu/nu mirror the param tree) get the same
layout as their parameters.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from map_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

def _path_keys(path) -> tuple:
    keys = []
    for p in path:
        name = getattr(p, "key", None)
        if name is None:
            name = getattr(p, "name", None)
        if name is None:
            name = str(p)
        keys.append(str(name))
    return tuple(keys)


def is_vocab_table(path, leaf) -> bool:
    """Vocabulary-table test: the known table params by name+structure
    (input Embeddings 'embedding', NCE decoder 'emb' + 2-D packed 'bias',
    the LR 'weight' table — flat or lane-packed storage), plus a size-based
    CATCH-ALL (2-D, >=4096 rows, row-dominant) so any future vocab-sized
    param shards even if its name is new. Dense-tower kernels never match
    either clause (1-D biases; kernel rows are feature dims). Shared with
    the fused-AdamW optimizer partition (map_tpu.train.optimizer) so 'what
    row-shards' and 'what gets the fused dense update' are the same set.
    Coverage pinned by tests/test_sharding.py::test_every_vocab_table_is_sharded."""
    shape = getattr(leaf, "shape", ())
    if len(shape) != 2:
        return False
    keys = _path_keys(path)
    # check the last two keys: optimizer moments for a table sit one level
    # below the param name (PartitionedTx stores (mu, nu) tuples at the
    # param's position, so paths end with a tuple index)
    tail = [k for k in keys[-2:]]
    if any(k in ("embedding", "emb") for k in tail):
        return True
    if "bias" in tail and shape[1] == 128:  # lane-packed decoder bias
        return True
    if "weight" in tail and "lr_layer" in keys:
        return True
    return shape[0] >= 4096 and shape[0] >= 8 * shape[1]


def leaf_pspec(path, leaf, table_sharding: str = "rows",
               num_model_shards: int = 1) -> P:
    if table_sharding == "replicated":
        return P()
    # 1-D vocab vectors (unpacked bias) stay replicated: tiny and gather-heavy
    if is_vocab_table(path, leaf):
        rows = leaf.shape[0]
        if num_model_shards > 1 and rows % num_model_shards != 0:
            # Packed tables are 512-row aligned (ops/packed_table.ROW_ALIGN),
            # so this only triggers for unpacked odd vocabularies; those fall
            # back to replication (the lookup routing applies the same guard).
            import logging

            logging.getLogger(__name__).warning(
                f"table {'/'.join(_path_keys(path))} rows={rows} not "
                f"divisible by num_model_shards={num_model_shards}; keeping "
                f"it replicated")
            return P()
        return P(MODEL_AXIS, None)
    return P()


def state_shardings(state: Any, mesh: Mesh, table_sharding: str = "rows") -> Any:
    """NamedSharding pytree for a TrainState (params + opt moments + stats)."""
    num_model = int(mesh.shape.get(MODEL_AXIS, 1))
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(
            mesh, leaf_pspec(path, leaf, table_sharding, num_model)),
        state)


def shard_state(state: Any, mesh: Mesh, table_sharding: str = "rows") -> Any:
    return jax.device_put(state, state_shardings(state, mesh, table_sharding))


def process_data_blocks(mesh: Mesh) -> tuple:
    """(blocks, D): the data-axis block indices covered by THIS process's
    devices, and the data-axis size D.

    Under P('data') batch sharding the global batch splits into D contiguous
    row blocks, each replicated across the 'model' axis. When model-axis
    replicas span processes (e.g. a 2x2 mesh over 4 single-device processes),
    two processes share a block and must materialize IDENTICAL rows — naive
    uniform process slicing hands each replica different data and the batch
    assembles silently corrupted (caught by
    tests/test_multiprocess.py::test_multi_process_rowsharded_mfp, nprocs=4).
    The covered blocks are contiguous for the row-major device order
    build_mesh uses; asserted here because the loader slices one range.
    """
    d = int(mesh.shape.get(DATA_AXIS, 1))
    ax = mesh.axis_names.index(DATA_AXIS)
    dev = np.moveaxis(np.asarray(mesh.devices), ax, 0).reshape(d, -1)
    pid = jax.process_index()
    blocks = sorted({i for i in range(d)
                     if any(x.process_index == pid for x in dev[i])})
    assert blocks, "process owns no mesh devices"
    assert blocks == list(range(blocks[0], blocks[-1] + 1)), \
        f"process data blocks not contiguous: {blocks}"
    return blocks, d


def batch_shardings(batch: Any, mesh: Mesh) -> Any:
    def spec(leaf):
        ndim = getattr(leaf, "ndim", 0)
        return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))

    return jax.tree_util.tree_map(spec, batch)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    return jax.device_put(batch, batch_shardings(batch, mesh))
