"""Worker for the multi-process jax.distributed localhost test.

Usage: python mp_worker.py <port> <process_id> <num_processes>
Each process brings 2 virtual CPU devices; together they form a 4-device
'data' mesh. Runs a cross-host global reduction and a sharded train-step-like
computation, printing 'MP_OK <value>' on success.
"""

import os
import sys


def main() -> int:
    port, pid, nprocs = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               " --xla_force_host_platform_device_count=2")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nprocs, process_id=pid)
    assert jax.process_count() == nprocs
    assert jax.device_count() == 2 * nprocs
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("data",))
    sharding = NamedSharding(mesh, P("data"))
    # host-local shard: each process contributes its process_id+1 per element
    local = np.full((2 * 4,), float(pid + 1), np.float32)  # 2 local devs x 4
    arr = jax.make_array_from_process_local_data(sharding, local)
    total = jax.jit(lambda a: a.sum())(arr)  # cross-host all-reduce
    want = 4.0 * 2 * sum(range(1, nprocs + 1))
    got = float(total)
    assert abs(got - want) < 1e-6, (got, want)
    print(f"MP_OK {got}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
