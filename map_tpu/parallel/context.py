"""Process-global table-sharding context.

When a ('data','model') mesh with num_model_shards > 1 is active, embedding
gathers inside the models route through the explicit shard_map exchange
(`map_tpu.parallel.embedding.sharded_embedding_lookup`: masked partial gather
+ psum over ICI) instead of relying on the GSPMD partitioner's choice for a
gather over a row-sharded operand. This pins the collective layout — partial
gathers stay local to each table shard and only the (B, F, E) activations
cross the 'model' axis — and the backward pass is guaranteed to be a LOCAL
scatter-add into the owned row block (SURVEY.md §2.7 consequence (1)).

The context is consulted at TRACE time: set it before the first call of a
jitted step, and build fresh step functions after changing it (jit caches do
not key on this global). The Trainer does both in `_build_steps`.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Optional

from jax.sharding import Mesh

from map_tpu.parallel.mesh import MODEL_AXIS

_TABLE_MESH: Optional[Mesh] = None
# Exchange strategy for row-sharded lookups (consulted at trace time, like
# the mesh): 'psum' = masked full gather + psum on every shard (correctness
# baseline; per-chip gather work constant in shard count); 'hotcold' =
# per-field hot prefixes served from a per-step replicated cache + cold ids
# through a capacity-bounded sorted-segment exchange (per-chip gather work
# ~N/S; see parallel.embedding.hotcold_embedding_lookup).
_TABLE_EXCHANGE: str = "psum"
# static hot physical-row lists keyed by table physical row count (tables
# sharing a row count share geometry and pack factor, hence the same list)
_TABLE_HOT_ROWS: dict = {}


def set_table_mesh(mesh: Optional[Mesh]) -> None:
    """Activate (or clear, with None) shard_map routing for table lookups.

    Only meshes with a >1 'model' axis have an effect; anything else is
    equivalent to None at lookup time.
    """
    global _TABLE_MESH
    _TABLE_MESH = mesh


def set_table_exchange(kind: str, hot_rows: Optional[dict] = None) -> None:
    """Select the row-sharded exchange strategy ('psum' | 'hotcold') and, for
    'hotcold', the static hot physical-row lists {num_phys_rows: (H,) array}."""
    global _TABLE_EXCHANGE, _TABLE_HOT_ROWS
    assert kind in ("psum", "hotcold"), kind
    _TABLE_EXCHANGE = kind
    _TABLE_HOT_ROWS = dict(hot_rows or {})


def table_exchange() -> str:
    return _TABLE_EXCHANGE


def table_hot_rows(num_phys_rows: int):
    """The static hot physical-row list for a table, or None."""
    return _TABLE_HOT_ROWS.get(int(num_phys_rows))


def table_mesh() -> Optional[Mesh]:
    """The active mesh if it row-shards tables (model axis > 1), else None."""
    m = _TABLE_MESH
    if m is not None and m.shape.get(MODEL_AXIS, 1) > 1:
        return m
    return None


@contextmanager
def table_sharded(mesh: Optional[Mesh]):
    prev = _TABLE_MESH
    set_table_mesh(mesh)
    try:
        yield
    finally:
        set_table_mesh(prev)
