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

# Trailing path fragments identifying vocabulary-axis (row-shardable) tables.
_TABLE_LEAVES = ("embedding", "emb")  # Embeddings table, NCE decoder table
_TABLE_VECTOR_LEAVES = ()  # bias (V,) kept replicated: tiny and gather-heavy


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


def leaf_pspec(path, leaf, table_sharding: str = "rows",
               num_model_shards: int = 1) -> P:
    if table_sharding == "replicated":
        return P()
    keys = _path_keys(path)
    leaf_name = keys[-1] if keys else ""
    is_table = (
        (leaf_name in _TABLE_LEAVES and getattr(leaf, "ndim", 0) == 2)
        or (leaf_name == "weight" and "lr_layer" in keys
            and getattr(leaf, "ndim", 0) == 2))
    if is_table:
        rows = leaf.shape[0]
        if num_model_shards > 1 and rows % num_model_shards != 0:
            # A vocabulary not divisible by the shard count cannot row-shard
            # evenly; keep this table replicated (the lookup routing applies
            # the same guard and falls back to a plain gather).
            import logging

            logging.getLogger(__name__).warning(
                f"table {'/'.join(keys)} rows={rows} not divisible by "
                f"num_model_shards={num_model_shards}; keeping it replicated")
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


def batch_shardings(batch: Any, mesh: Mesh) -> Any:
    def spec(leaf):
        ndim = getattr(leaf, "ndim", 0)
        return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))

    return jax.tree_util.tree_map(spec, batch)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    return jax.device_put(batch, batch_shardings(batch, mesh))
