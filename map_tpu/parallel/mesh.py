"""Device mesh construction: the 2-D ('data', 'model') mesh.

TPU-native replacement for the reference's vestigial NCCL process-group setup
(`code/arguments.py:58-86`, which never issues a collective). Here the mesh is
real: the 'data' axis carries data parallelism (batch sharding + gradient
all-reduce inserted by XLA), the 'model' axis carries row-sharded embedding
tables (see `map_tpu.parallel.embedding`). Multi-host runs initialize
`jax.distributed` before building the mesh.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

import jax
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def maybe_init_distributed() -> None:
    """Initialize jax.distributed when launched under a multi-host coordinator.

    Controlled by standard env vars (COORDINATOR_ADDRESS et al.); a no-op for
    single-host runs.
    """
    if os.environ.get("MAP_TPU_COORDINATOR"):
        jax.distributed.initialize(
            coordinator_address=os.environ["MAP_TPU_COORDINATOR"],
            num_processes=int(os.environ.get("MAP_TPU_NUM_PROCESSES", "1")),
            process_id=int(os.environ.get("MAP_TPU_PROCESS_ID", "0")),
        )


def build_mesh(num_data_shards: int = -1, num_model_shards: int = 1,
               devices: Optional[list] = None) -> Mesh:
    """Build a ('data', 'model') mesh over the given devices.

    num_data_shards == -1 means "all devices divided by num_model_shards".
    Device order follows jax.devices(), which keeps ICI neighbors adjacent so
    the 'model' axis (all-to-all / psum traffic for embedding shards) rides
    ICI, not DCN.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if num_model_shards <= 0:
        num_model_shards = 1
    if num_data_shards <= 0:
        num_data_shards = n // num_model_shards
    assert num_data_shards * num_model_shards == n, (
        f"mesh {num_data_shards}x{num_model_shards} != {n} devices")
    arr = np.asarray(devices).reshape(num_data_shards, num_model_shards)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def mesh_from_args(args) -> Mesh:
    return build_mesh(args.num_data_shards, args.num_model_shards)


def data_parallel_size(args=None) -> int:
    n = jax.device_count()
    if args is None:
        return n
    m = max(1, args.num_model_shards)
    d = args.num_data_shards
    return d if d > 0 else n // m
