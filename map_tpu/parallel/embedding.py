"""Row-sharded embedding lookup over the 'model' mesh axis (shard_map).

The reference holds one monolithic nn.Embedding on a single device
(`code/layers.py:86`); the TPU-native design shards the table's vocabulary
axis across the 'model' mesh axis so tables larger than one chip's HBM scale
horizontally (SURVEY.md §2.7 consequence (1)).

Exchange strategy ("masked partial gather + psum"): ids are replicated over
'model' (they are sharded only over 'data'); each model shard gathers the rows
it owns (ids clamped into its local block, others zeroed) and the partial
(B, F, E) results are summed with psum over ICI. Compared to a bucketed
all-to-all this does S redundant local gathers but needs no capacity planning
or sorting, is fully static-shape, and the psum payload (B*F*E floats) is tiny
relative to table bandwidth. The backward pass is the transpose: psum's
gradient is identity-per-shard and the masked gather transposes to a local
scatter-add into the owned block — exactly the sharded scatter-add the north
star asks for.

`sharded_embedding_lookup` is differentiable and jit-compatible; use it inside
a train step when tables are sharded with
`map_tpu.parallel.sharding.state_shardings` (table_sharding='rows').
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from map_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def _local_lookup(table_shard: jnp.ndarray, ids: jnp.ndarray,
                  num_shards: int) -> jnp.ndarray:
    """Gather rows owned by this shard; zeros elsewhere. Runs inside shard_map."""
    shard_idx = jax.lax.axis_index(MODEL_AXIS)
    rows_per_shard = table_shard.shape[0]
    lo = shard_idx * rows_per_shard
    local = ids - lo
    owned = (local >= 0) & (local < rows_per_shard)
    safe = jnp.where(owned, local, 0)
    gathered = jnp.take(table_shard, safe, axis=0)
    gathered = jnp.where(owned[..., None], gathered, 0.0)
    return jax.lax.psum(gathered, MODEL_AXIS)


def sharded_embedding_lookup(table: jnp.ndarray, ids: jnp.ndarray,
                             mesh: Mesh) -> jnp.ndarray:
    """table (V, E) row-sharded over MODEL; ids (..., ) sharded over DATA on
    axis 0, replicated over MODEL. Returns (..., E) sharded like ids."""
    num_shards = mesh.shape[MODEL_AXIS]
    if num_shards == 1:
        return jnp.take(table, ids, axis=0)
    ids_spec = P(DATA_AXIS, *([None] * (ids.ndim - 1)))
    out_spec = P(DATA_AXIS, *([None] * ids.ndim))
    fn = jax.shard_map(
        partial(_local_lookup, num_shards=num_shards),
        mesh=mesh,
        in_specs=(P(MODEL_AXIS, None), ids_spec),
        out_specs=out_spec,
    )
    return fn(table, ids)
