"""Embedding gather (forward) and scatter-add (backward) ops.

The reference delegates this to torch nn.Embedding/ATen (`code/layers.py:86,98`,
`code/nce/index_linear.py:99-100`). Here:

- `embedding_lookup(table, ids)`: default XLA path (`jnp.take`), which lowers
  to a dynamic-gather the TPU handles well for moderate vocabularies; the
  backward pass is XLA scatter-add.
- A Pallas double-buffered DMA gather path for large HBM-resident tables is in
  `map_tpu.ops.pallas_embedding` (opt-in via `use_pallas`, falls back on CPU).
- The model-axis-sharded path (row-sharded tables + psum) is in
  `map_tpu.parallel.embedding` and wraps this op inside shard_map.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def gather_rows(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """jnp.take forward with the Pallas tiled scatter-add backward.

    XLA's scatter (take's transpose) serializes row updates (~6.7 ms for the
    canonical 98k-row batch on v5e); the Pallas kernel
    (map_tpu.ops.pallas_scatter) reformulates it as per-tile one-hot matmuls
    (~1.8x faster, exact f32). Off-TPU the backward falls back to
    segment_sum, which is what XLA's transpose computes anyway.
    """
    return jnp.take(table, ids, axis=0)


def _gather_fwd(table, ids):
    return jnp.take(table, ids, axis=0), (ids, table.shape[0])


def _gather_bwd(res, g):
    from map_tpu.ops.pallas_scatter import scatter_add

    ids, vocab_size = res
    return scatter_add(ids, g, vocab_size), None


gather_rows.defvjp(_gather_fwd, _gather_bwd)


# Global default for the custom-VJP (Pallas scatter) backward; overridable per
# call. Benchmarked OFF: standalone the Pallas kernel beats XLA's scatter
# (4.7 vs 6.7 ms), but inside the fused train step XLA folds the scatter into
# the optimizer's table update and the fused program wins (9.6 vs 17.2 ms per
# step, benchmarks/bench_step_ab.py on v5e). The kernel remains available for
# contexts where the scatter cannot fuse (standalone grads, sharded shards).
FAST_GRAD_ENABLED = False


def embedding_lookup(table: jnp.ndarray, ids: jnp.ndarray,
                     use_pallas: bool = False,
                     fast_grad: bool = None) -> jnp.ndarray:
    """Gather rows: table (V, E), ids (...,) int -> (..., E).

    When a table mesh is active (map_tpu.parallel.context) and the gather is
    batch-leading, the lookup routes through the shard_map masked-gather+psum
    exchange so row-sharded tables are read (and their gradients scattered)
    strictly shard-locally over the 'model' axis.
    """
    if use_pallas:
        from map_tpu.ops.pallas_embedding import pallas_embedding_lookup

        return pallas_embedding_lookup(table, ids)
    from map_tpu.parallel.context import table_mesh
    from map_tpu.parallel.mesh import MODEL_AXIS

    mesh = table_mesh()
    if (mesh is not None and ids.ndim >= 2
            and table.shape[0] % mesh.shape[MODEL_AXIS] == 0):
        from map_tpu.parallel.context import table_exchange, table_hot_rows
        from map_tpu.parallel.embedding import (
            hotcold_embedding_lookup, sharded_embedding_lookup)

        hot = (table_hot_rows(table.shape[0])
               if table_exchange() == "hotcold" else None)
        if hot is not None and len(hot) > 0:
            return hotcold_embedding_lookup(table, ids, mesh, hot)
        return sharded_embedding_lookup(table, ids, mesh)
    if fast_grad is None:
        fast_grad = FAST_GRAD_ENABLED
    if fast_grad:
        return gather_rows(table, ids)
    return jnp.take(table, ids, axis=0)


def embedding_scatter_add(grad_out: jnp.ndarray, ids: jnp.ndarray,
                          vocab_size: int) -> jnp.ndarray:
    """Reference scatter-add for gradients (used in tests as the oracle)."""
    flat_ids = ids.reshape(-1)
    flat_grad = grad_out.reshape(-1, grad_out.shape[-1])
    return jax.ops.segment_sum(flat_grad, flat_ids, num_segments=vocab_size)
